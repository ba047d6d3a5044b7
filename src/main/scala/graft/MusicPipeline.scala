package graft

import graft.analytics.Kpis
import graft.ingest.Validate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference pipeline, end to end, on the reference's own schema —
  * the API a King-04/Music-Streaming-Data-Pipeline-V2 user calls after
  * switching engines. One batch run = the reference's
  * validate → transform → dynamodb-ingest Glue chain
  * (`glue_jobs/music-streaming-transform.py`,
  * `glue_jobs/dynamodb-ingestion.py`) as a single Spark job; the
  * incremental/streaming form is [[graft.stream.Pipeline]].
  */
object MusicPipeline {

  case class Outputs(genreKpis: DataFrame, topSongs: DataFrame,
                     topGenres: DataFrame, servingItems: DataFrame)

  /** @param processDate optional 'yyyy-MM-dd' — the reference's
    *                     PROCESS_DATE single-day scope (P9).
    */
  def run(streams: DataFrame, songs: DataFrame, users: DataFrame,
          processDate: Option[String] = None,
          topSongsK: Int = 3, topGenresK: Int = 5): Outputs = {
    val vStreams = Validate.validateStreams(streams)
    val vSongs = Validate.validateSongs(songs)
    val vUsers = Validate.validateUsers(users)

    // J1/J2 enrichment with projected broadcast dims, F3 daily window.
    val enriched0 = vStreams
      .join(broadcast(vSongs.select(col("track_id"), col("track_name"),
        col("track_genre"), col("artists"), col("duration_ms"))), Seq("track_id"))
      .join(broadcast(vUsers.select(col("user_id"), col("user_age"),
        col("user_country"))), Seq("user_id"))
      .withColumn("date", to_date(col("listen_time")))
    val enriched = analytics.Enrich.forDay(enriched0, processDate)

    // A1/A2: genre KPIs (music-schema measures).
    val genreKpis = enriched
      .groupBy(col("track_genre"), col("date"))
      .agg(
        count(lit(1)).as("listen_count"),
        countDistinct(col("user_id")).as("unique_listeners"),
        sum(col("duration_ms").cast("long")).as("total_listening_time_ms"),
        avg(col("duration_ms")).as("avg_listening_time_ms"))
      .withColumn("avg_listening_time_per_user",
        col("total_listening_time_ms") / col("unique_listeners"))

    // A3+W1: top-K songs per (genre, day), deterministic ties.
    val topSongs = Kpis.topKPerGroup(
      enriched.groupBy(col("track_genre"), col("date"), col("track_id"),
          col("track_name"), col("artists"))
        .agg(count(lit(1)).as("play_count")),
      Seq(col("track_genre"), col("date")), col("play_count"),
      Seq(col("track_id")), topSongsK)

    // A4+W2: top-K genres per day.
    val topGenres = Kpis.topKPerGroup(
      enriched.groupBy(col("date"), col("track_genre"))
        .agg(count(lit(1)).as("total_plays")),
      Seq(col("date")), col("total_plays"), Seq(col("track_genre")), topGenresK)

    // R1–R3 serving projection (music-schema key design,
    // README.md:121-129 of the reference).
    val kpiItems = genreKpis.select(
      concat_ws("#", lit("GENRE"), col("track_genre"), lit("DATE"),
        col("date").cast("string")).as("pk"),
      expr("""stack(4,
        'listen_count', CAST(listen_count AS STRING),
        'unique_listeners', CAST(unique_listeners AS STRING),
        'total_listening_time_ms', CAST(total_listening_time_ms AS STRING),
        'avg_listening_time_ms', CAST(CAST(avg_listening_time_ms AS DECIMAL(28,6)) AS STRING)
        ) AS (metric_type, value)"""))
      .select(col("pk"), concat(lit("METRIC#"), col("metric_type")).as("sk"),
        col("value"), lit("genre_metric").as("record_type"))
    val songItems = topSongs.select(
      concat_ws("#", lit("GENRE"), col("track_genre"), lit("DATE"),
        col("date").cast("string")).as("pk"),
      format_string("SONG#%d#%s", col("rank"), col("track_id")).as("sk"),
      col("play_count").cast("string").as("value"),
      lit("top_song").as("record_type"))
    val genreItems = topGenres.select(
      concat_ws("#", lit("DATE"), col("date").cast("string")).as("pk"),
      format_string("GENRE_RANK#%d", col("rank")).as("sk"),
      col("track_genre").as("value"),
      lit("top_genre").as("record_type"))

    Outputs(genreKpis, topSongs, topGenres,
      kpiItems.unionByName(songItems).unionByName(genreItems))
  }

  /** Write the outputs the way the reference does, minus `coalesce(1)`
    * (partitioned parquet; the serving table sorted by (pk, sk)).
    */
  def write(out: Outputs, outDir: String): Unit = {
    out.genreKpis.write.mode("overwrite").parquet(s"$outDir/genre_kpis")
    out.topSongs.write.mode("overwrite").parquet(s"$outDir/top_songs")
    out.topGenres.write.mode("overwrite").parquet(s"$outDir/top_genres")
    out.servingItems
      .repartitionByRange(col("pk"), col("sk"))
      .sortWithinPartitions(col("pk"), col("sk"))
      .write.mode("overwrite").parquet(s"$outDir/serving")
  }
}
