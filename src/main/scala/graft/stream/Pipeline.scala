package graft.stream

import graft.ingest.Validate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The reference's whole event-driven pipeline (SURVEY.md §2.9, E1) as a
  * single Structured Streaming job — S3-event→Lambda→Airflow→Glue
  * collapses into: file source → validate → enrich/aggregate in
  * `foreachBatch` → sinks.
  *
  * What the reference builds by hand, the file source gives natively:
  *  - S5 directory listing            → source file discovery
  *  - S6 file-name predicate          → `pathGlobFilter`
  *  - S7 exactly-once manifest        → checkpoint offset log
  *  - K4 archive of processed files   → `cleanSource=archive`
  *  - branching on "no new files"     → empty micro-batch short-circuit
  *
  * Scale notes: `maxFilesPerTrigger` bounds micro-batch size; the
  * per-batch work is the same broadcast-join + partial-agg plan as the
  * batch path, so throughput scales with executors, and
  * `Trigger.AvailableNow` gives the reference's scheduled-catch-up
  * semantics with checkpointed exactly-once progress.
  */
object Pipeline {

  /** Reference streams CSV schema (validate.py:212). */
  val streamsCsvSchema: StructType = StructType(Seq(
    StructField("user_id", StringType),
    StructField("track_id", StringType),
    StructField("listen_time", StringType)))

  /** S1+S5+S6+S7+K4 as a [[SourceConfig]]: incremental CSV file source
    * with name-glob, micro-batch cap, and archive-on-read. The Kafka
    * deployment swaps this value for a [[KafkaSourceConfig]] — the
    * pipeline body never changes.
    */
  def streamsFileConfig(inputDir: String, archiveDir: Option[String] = None): FileSourceConfig =
    FileSourceConfig(inputDir, "csv", streamsCsvSchema,
      Map(
        "header" -> "true",
        "pathGlobFilter" -> "*stream*.csv",   // S6 file-name predicate
        "maxFilesPerTrigger" -> "16"),        // bound micro-batch size
      archiveDir)

  /** S1+S5+S6+S7+K4: incremental CSV stream source with archive-on-read. */
  def streamsSource(spark: SparkSession, inputDir: String, archiveDir: Option[String] = None): DataFrame =
    StreamSources.open(spark, streamsFileConfig(inputDir, archiveDir))

  /** The full micro-batch: validate (slice 1) → enrich ⋈ dims → daily
    * KPIs → overwrite per-date outputs. Empty batches short-circuit
    * (the reference's `decide_workflow` branch).
    *
    * @param failOnValidationError the reference's strict mode
    *   (`validate.py:34` FAIL_ON_VALIDATION_ERROR): when true, a batch
    *   containing rows the cleaning rules would drop aborts the query
    *   (checkpoint not advanced — the batch replays after the fix);
    *   when false (resilient, default) bad rows are dropped and counted.
    */
  def start(spark: SparkSession, inputDir: String, checkpointDir: String,
            songs: DataFrame, users: DataFrame,
            writeBatch: DataFrame => Unit,
            failOnValidationError: Boolean = false,
            archiveDir: Option[String] = None): StreamingQuery =
    startFrom(spark, streamsFileConfig(inputDir, archiveDir), checkpointDir,
      songs, users, writeBatch, failOnValidationError)

  /** [[start]] against any [[SourceConfig]] — file today, Kafka on a
    * cluster with the connector, MemoryStream in specs.
    */
  def startFrom(spark: SparkSession, source: SourceConfig, checkpointDir: String,
                songs: DataFrame, users: DataFrame,
                writeBatch: DataFrame => Unit,
                failOnValidationError: Boolean = false): StreamingQuery =
    StreamSources.open(spark, source)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val validated = Validate.validateStreams(batch)
          if (failOnValidationError) {
            val bad = batch.count() - validated.count()
            if (bad > 0) throw new IllegalStateException(
              s"strict validation: $bad malformed rows in batch")
          }
          val enriched = validated
            .join(broadcast(songs), Seq("track_id"))
            .join(broadcast(users), Seq("user_id"))
            .withColumn("date", to_date(col("listen_time")))
          val kpis = enriched
            .groupBy(col("track_genre"), col("date"))
            .agg(count(lit(1)).as("listen_count"),
              countDistinct(col("user_id")).as("unique_listeners"),
              sum(col("duration_ms")).as("total_listening_time_ms"),
              avg(col("duration_ms")).as("avg_listening_time_ms"))
            .withColumn("avg_listening_time_per_user",
              col("total_listening_time_ms") / col("unique_listeners"))
          writeBatch(kpis)
        }
      }
      .start()
}
