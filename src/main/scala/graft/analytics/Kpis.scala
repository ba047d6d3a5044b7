package graft.analytics

import graft.Tables
import graft.Tables.{davg, dsum}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The three daily KPI shapes of the reference's analytics job
  * (`glue_jobs/music-streaming-transform.py:100-153`): a multi-measure
  * hash aggregation (A1+A2), and two group-count → ranking-window → rank
  * filter top-K pipelines (A3+W1, A4+W2).
  *
  * Scale notes (100 TB):
  *  - A1's `countDistinct` plans Expand + two-phase HashAggregate —
  *    exact but shuffle-heavy; [[genreKpisApprox]] is the HLL variant
  *    for the bench path (documented deviation, SURVEY.md §7.4).
  *  - Top-K uses `row_number` + `rank <= k`: Spark ≥3.5 rewrites this
  *    with WindowGroupLimit, pushing a per-partition top-k below the
  *    shuffle so only k rows per group per mapper move.
  *  - Tie-breaks are explicit secondary sort keys (the reference's ties
  *    are arbitrary, `music-streaming-transform.py:126-128`; we need
  *    deterministic output for the oracle gate — SURVEY.md §7.5).
  */
object Kpis {

  /** A1+A2: per-(group, day) multi-measure aggregate — the `genre_kpis`
    * table (`music-streaming-transform.py:100-106`). count /
    * countDistinct / sum / avg plus the derived per-user ratio.
    */
  def genreKpis(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(col("event_type"), col("date"))
      .agg(
        count(lit(1)).as("listen_count"),
        countDistinct(col("user_id")).as("unique_listeners"),
        dsum(col("value")).as("total_value"),
        davg(col("value")).as("avg_value"))
      .withColumn("avg_value_per_user", col("total_value") / col("unique_listeners"))

  /** A1 at 100 TB: exact distinct swapped for HLL (±2% default) — one
    * shuffle instead of Expand's two, no blow-up on wide group counts.
    */
  def genreKpisApprox(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(col("event_type"), col("date"))
      .agg(
        count(lit(1)).as("listen_count"),
        approx_count_distinct(col("user_id")).as("unique_listeners"),
        dsum(col("value")).as("total_value"),
        davg(col("value")).as("avg_value"))
      .withColumn("avg_value_per_user", col("total_value") / col("unique_listeners"))

  /** W1/W2 shape: rank rows inside each group and keep the top k.
    * `orderBy` is descending on the measure with ascending tie-break
    * keys appended for determinism.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], measure: Column,
                   tieBreak: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols: _*)
      .orderBy(measure.desc +: tieBreak.map(_.asc): _*)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** A3+W1: top-3 parts by play count per (returnflag, ship-day) — the
    * `top_songs` analog (`music-streaming-transform.py:121-130`).
    * `days` scopes the computation to the given days (the aggregation
    * and window are per-day, so a day-sliced run equals the same days of
    * a full run — the property the incremental serving store relies on);
    * the filter sits directly on the scan, so a date-partitioned
    * lineitem prunes at the source.
    */
  def topPartsPerFlagDay(spark: SparkSession, dir: String, k: Int = 3,
                         days: Option[Seq[String]] = None): DataFrame = {
    val base = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), to_date(col("l_shipdate")).as("date"), col("l_partkey"))
    val counted = days.fold(base)(ds => base.filter(col("date").cast("string").isin(ds: _*)))
      .groupBy(col("l_returnflag"), col("date"), col("l_partkey"))
      .agg(count(lit(1)).as("play_count"))
    topKPerGroup(counted,
      Seq(col("l_returnflag"), col("date")), col("play_count"),
      Seq(col("l_partkey")), k)
  }

  /** A4+W2: top-5 event types per day — the `top_genres` analog
    * (`music-streaming-transform.py:145-153`). `days` as in
    * [[topPartsPerFlagDay]].
    */
  def topTypesPerDay(spark: SparkSession, dir: String, k: Int = 5,
                     days: Option[Seq[String]] = None): DataFrame = {
    val base = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("date"), col("event_type"))
    val counted = days.fold(base)(ds => base.filter(col("date").cast("string").isin(ds: _*)))
      .groupBy(col("date"), col("event_type"))
      .agg(count(lit(1)).as("total_plays"))
    topKPerGroup(counted,
      Seq(col("date")), col("total_plays"), Seq(col("event_type")), k)
  }
}
