package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's validation layer re-expressed as declarative DataFrame
  * transforms (`dags/tasks/validate.py` — pandas row-at-a-time there, one
  * codegen'd scan stage here).
  *
  * Operator mapping (SURVEY.md §2.2/§2.7):
  *  - P4 required-column assertion   (`validate.py:36-44`)
  *  - P5 null-drop on critical cols  (`validate.py:51,70,109,121`)
  *  - P6 range predicate             (`validate.py:55` — age between 13,120)
  *  - P7 cast-or-null numeric parse  (`validate.py:74-75`)
  *  - P8 timestamp parse-or-drop     (`validate.py:114-121`)
  *  - F5-F8 casts / fill / lower+trim (`validate.py:46-102`)
  *
  * All rules compose into a single narrow (shuffle-free) stage — at
  * 100 TB validation is a pure map over the scan with predicate pushdown
  * intact; nothing here breaks whole-stage codegen.
  */
object Validate {

  /** P4: fail fast when a required column is missing (schema contract). */
  def requireColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val missing = required.filterNot(df.columns.map(_.toLowerCase).contains)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(", ")}")
    df
  }

  /** F13: the reference's before/after count logging
    * (`validate.py:62,101,127`) done without extra passes — an
    * `Observation` rides the existing action and reports row and
    * null-drop counts as accumulator-style metrics. Call
    * `observation.get` after the first action on the returned frame.
    */
  def observed(df: DataFrame, name: String,
               criticalCols: Seq[String]): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val nullCounters = criticalCols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    (df.observe(obs, count(lit(1)).as("n_rows"), nullCounters: _*), obs)
  }

  /** P11: empty-result guard (`validate.py:124-125`). */
  def requireNonEmpty(df: DataFrame, what: String): DataFrame = {
    require(!df.isEmpty, s"validation produced 0 rows for $what")
    df
  }

  /** Reference `users` cleaning (`validate.py:46-63`): required columns,
    * string casts, numeric age with 13..120 range, timestamp
    * parse-or-drop, null-drop on criticals. Schema contract pinned by
    * the committed golden parquet (FIXTURES.md §A).
    */
  def validateUsers(raw: DataFrame): DataFrame = {
    requireColumns(raw, Seq("user_id", "user_name", "user_age", "user_country", "created_at"))
    raw.select(
        col("user_id").cast(StringType).as("user_id"),
        col("user_name").cast(StringType).as("user_name"),
        col("user_age").cast(IntegerType).as("user_age"),
        col("user_country").cast(StringType).as("user_country"),
        to_timestamp(col("created_at")).as("created_at"))
      .na.drop(Seq("user_id", "user_name", "user_age"))
      .filter(col("user_age").between(13, 120))
  }

  /** Reference `songs` cleaning (`validate.py:65-102`): cast-or-null on
    * numerics (P7), genre lower+trim (F7), zero-fill duration (F8).
    */
  def validateSongs(raw: DataFrame): DataFrame = {
    requireColumns(raw, Seq("track_id", "track_name", "artists", "popularity",
      "duration_ms", "track_genre"))
    raw.select(
        col("track_id").cast(StringType).as("track_id"),
        col("track_name").cast(StringType).as("track_name"),
        col("artists").cast(StringType).as("artists"),
        col("popularity").cast(IntegerType).as("popularity"),
        coalesce(col("duration_ms").cast(IntegerType), lit(0)).as("duration_ms"),
        lower(trim(col("track_genre"))).as("track_genre"))
      .filter(col("popularity").isNotNull && col("duration_ms").isNotNull)
      .na.drop(Seq("track_id", "track_name", "artists"))
  }

  /** Reference `streams` cleaning (`validate.py:104-128`): string casts,
    * timestamp parse-or-drop (µs precision is Spark-native — the
    * reference forces it by hand at `validate.py:117`).
    */
  def validateStreams(raw: DataFrame): DataFrame = {
    requireColumns(raw, Seq("user_id", "track_id", "listen_time"))
    raw.select(
        col("user_id").cast(StringType).as("user_id"),
        col("track_id").cast(StringType).as("track_id"),
        to_timestamp(col("listen_time")).as("listen_time"))
      .na.drop(Seq("user_id", "track_id", "listen_time"))
  }
}
