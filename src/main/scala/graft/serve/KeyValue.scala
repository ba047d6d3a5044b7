package graft.serve

import graft.analytics.{Enrich, Kpis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's DynamoDB single-table projection re-expressed as a
  * sorted `(pk, sk)` relational table (`glue_jobs/dynamodb-ingestion.py`
  * R1–R3; key schema `README.md:121-129`; query surface
  * `queries/dynamo_query.txt`).
  *
  * The reference reshapes with pandas `iterrows()` (scalar, single
  * process); here each reshape is a projection/unpivot the optimizer can
  * pipeline, and the "table" is just a DataFrame that would be written
  * sorted by (pk, sk) so serving predicates prune parquet row groups.
  *
  * Numeric values are stringified through DECIMAL(28,6) so Spark and the
  * DuckDB oracle render identical text (raw double→string formatting is
  * not portable across engines).
  */
object KeyValue {

  private def dateStr(c: String) = col(c).cast("string")

  /** R1: wide genre-KPI row → 4 (pk, sk, value) metric items
    * (`dynamodb-ingestion.py:46-79`). Spark-native unpivot via `stack`.
    */
  def kpiItems(genreKpis: DataFrame): DataFrame =
    genreKpis
      .select(
        concat_ws("#", lit("GENRE"), col("event_type"), lit("DATE"), dateStr("date")).as("pk"),
        expr(
          """stack(4,
            |  'listen_count',       CAST(listen_count AS STRING),
            |  'unique_listeners',   CAST(unique_listeners AS STRING),
            |  'total_value',        CAST(CAST(total_value AS DECIMAL(28,6)) AS STRING),
            |  'avg_value',          CAST(CAST(avg_value AS DECIMAL(28,6)) AS STRING)
            |) AS (metric_type, value)""".stripMargin))
      .select(col("pk"), concat(lit("METRIC#"), col("metric_type")).as("sk"),
        col("value"), lit("genre_metric").as("record_type"))

  /** R2: top-song rows → items keyed `SONG#<rank>#<id>`
    * (`dynamodb-ingestion.py:81-106`).
    */
  def topSongItems(topSongs: DataFrame): DataFrame =
    topSongs.select(
      concat_ws("#", lit("GENRE"), col("l_returnflag"), lit("DATE"), dateStr("date")).as("pk"),
      format_string("SONG#%d#%d", col("rank"), col("l_partkey")).as("sk"),
      col("play_count").cast("string").as("value"),
      lit("top_song").as("record_type"))

  /** R3: top-genre rows → items keyed `GENRE_RANK#<rank>` under a
    * date-only pk (`dynamodb-ingestion.py:108-131`).
    */
  def topGenreItems(topGenres: DataFrame): DataFrame =
    topGenres.select(
      concat_ws("#", lit("DATE"), dateStr("date")).as("pk"),
      format_string("GENRE_RANK#%d", col("rank")).as("sk"),
      col("event_type").as("value"),
      lit("top_genre").as("record_type"))

  /** The full serving table: union of all three item families, sorted by
    * (pk, sk) — the layout that makes §2.10 lookups row-group-prunable.
    */
  def servingTable(spark: SparkSession, dir: String): DataFrame = {
    val kpis = Kpis.genreKpis(Enrich.enriched(spark, dir))
    kpiItems(kpis)
      .unionByName(topSongItems(Kpis.topPartsPerFlagDay(spark, dir)))
      .unionByName(topGenreItems(Kpis.topTypesPerDay(spark, dir)))
  }

  /** The serving store at rest: the table written range-partitioned and
    * sorted by (pk, sk) as parquet, fingerprint-guarded like the ANN
    * indexes and the near-dup pair table ([[graft.ext.Artifact]]) — the
    * literal analog of the reference's *loaded* DynamoDB table
    * (`dynamodb-ingestion.py` runs once per batch; reads hit the store).
    * Sorted files mean the §2.10 lookup predicates prune parquet row
    * groups on pk/sk min/max. Freshness is a file-level fingerprint of
    * the three source tables the projections read (events, customer,
    * lineitem) — no data scanned, rebuild on any file change.
    */
  def ensureStore(spark: SparkSession, dir: String): String = {
    import graft.ext.Artifact
    val fp = Artifact.fileFingerprint(spark,
      s"$dir/events.parquet", s"$dir/customer.parquet", s"$dir/lineitem.parquet")
    val root = s"${Artifact.root(dir)}/serving"
    Artifact.ensure(spark, root, s"serving v1 fp=$fp") {
      servingTable(spark, dir)
        .repartitionByRange(4, col("pk"), col("sk"))
        .sortWithinPartitions(col("pk"), col("sk"))
        .write.mode("overwrite").parquet(s"$root/store")
    }
    s"$root/store"
  }

  // Weak keys: entries die with their SparkSession (no identity-hash
  // collisions, no pinning of plans for stopped sessions).
  private val cache =
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  /** In-session view of the persisted store ([[ensureStore]]): read from
    * the sorted parquet and memory-persisted, so the lookup families
    * scan a loaded store instead of re-running enrich+aggregate per
    * query — and a fresh session pays only the fingerprint check + load,
    * not the build.
    */
  def servingTableCached(spark: SparkSession, dir: String): DataFrame = {
    val perSession = cache.synchronized {
      cache.computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    }
    perSession.computeIfAbsent(dir, { _ =>
      val df = spark.read.parquet(ensureStore(spark, dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count() // materialize eagerly — this is the "load" step
      df
    })
  }
}
