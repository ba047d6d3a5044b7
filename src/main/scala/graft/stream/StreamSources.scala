package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Where streaming rows come from — the one seam between the engine's
  * dataflow (validate → enrich → aggregate → sink) and the physical
  * transport. The published approach for this pipeline family is
  * Structured Streaming + a Kafka source; the reference deployment
  * itself is file-arrival-driven (S3 event → pipeline,
  * /root/reference/dags/etl_pipeline_dag.py:48-63), and this offline
  * sandbox has no broker — so the engine takes a [[SourceConfig]] and
  * swapping file ↔ Kafka ↔ test harness is a config change, not a
  * pipeline-code change.
  */
sealed trait SourceConfig

/** Incremental file listing (the reference's S3-arrival shape): format +
  * schema + reader options (name glob, micro-batch cap, header, …) +
  * optional archive-on-read.
  */
final case class FileSourceConfig(
    dir: String,
    format: String,
    schema: StructType,
    options: Map[String, String] = Map.empty,
    archiveDir: Option[String] = None) extends SourceConfig

/** Kafka topic with a JSON payload projected through `valueSchema` — the
  * standard reader shape (`kafka` format → `value` bytes → `from_json`).
  * Requires the spark-sql-kafka connector on the cluster classpath; it
  * is not present in this offline sandbox, so this config is the
  * deployment seam rather than a locally-testable path — everything
  * downstream of [[StreamSources.open]] is transport-agnostic either
  * way (proved by the [[DirectSource]] specs).
  */
final case class KafkaSourceConfig(
    bootstrapServers: String,
    topic: String,
    valueSchema: StructType,
    startingOffsets: String = "earliest",
    maxOffsetsPerTrigger: Option[Long] = None) extends SourceConfig

/** An already-constructed streaming DataFrame (MemoryStream in tests, or
  * any custom reader) — the escape hatch that also proves the seam is
  * source-independent.
  */
final case class DirectSource(stream: DataFrame) extends SourceConfig

/** An already-constructed stream carrying Kafka's WIRE schema — the
  * columns `spark.readStream.format("kafka").load()` emits (`key`/
  * `value` binary, `topic`, `partition`, `offset`, `timestamp`,
  * `timestampType`) — projected through the SAME JSON value path the
  * [[KafkaSourceConfig]] branch runs. This is the broker-less contract
  * harness: a MemoryStream shaped like the connector's output drives
  * the identical payload projection, so everything downstream of the
  * connector (envelope columns dropped, JSON value → typed rows,
  * partition/offset opacity to the pipeline) is exercised end to end;
  * only the network fetch itself is substituted.
  */
final case class KafkaWireSource(stream: DataFrame,
                                 valueSchema: StructType) extends SourceConfig

object StreamSources {

  /** Kafka's wire row, for harness-built [[KafkaWireSource]] streams:
    * the exact column set and types `spark.readStream.format("kafka")`
    * emits. Top-level so Spark derives its encoder without an outer
    * scope (MemoryStream harnesses in specs and lifecycle queries).
    */
  final case class WireRecord(key: Array[Byte], value: Array[Byte],
                              topic: String, partition: Int, offset: Long,
                              timestamp: java.sql.Timestamp, timestampType: Int)

  /** The reader options a [[KafkaSourceConfig]] resolves to — factored
    * out of [[open]] so the wiring is assertable offline (the connector
    * jar is absent here, so `open` on a Kafka config can only be
    * exercised up to source resolution; a typo in THIS map would
    * otherwise sleep until deployment).
    */
  def kafkaReaderOptions(k: KafkaSourceConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> k.bootstrapServers,
      "subscribe" -> k.topic,
      "startingOffsets" -> k.startingOffsets) ++
      k.maxOffsetsPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString)

  /** The Kafka value projection: JSON payload bytes → typed columns.
    * Shared with [[open]] and testable on any batch/stream frame with a
    * `value` column.
    */
  private[stream] def projectJsonValue(df: DataFrame,
                                       valueSchema: StructType): DataFrame =
    df.select(from_json(col("value").cast("string"), valueSchema).as("r"))
      .select(col("r.*"))

  /** Resolve a [[SourceConfig]] to its streaming DataFrame. */
  def open(spark: SparkSession, cfg: SourceConfig): DataFrame = cfg match {
    case f: FileSourceConfig =>
      val base = spark.readStream.format(f.format).schema(f.schema).options(f.options)
      val withArchive = f.archiveDir.fold(base)(dir =>
        base.option("cleanSource", "archive").option("sourceArchiveDir", dir))
      withArchive.load(f.dir)

    case k: KafkaSourceConfig =>
      projectJsonValue(
        spark.readStream.format("kafka").options(kafkaReaderOptions(k)).load(),
        k.valueSchema)

    case DirectSource(stream) => stream

    case KafkaWireSource(stream, valueSchema) =>
      projectJsonValue(stream, valueSchema)
  }
}
