package graft.stream

import graft.SparkSuite
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The source seam: the same pipeline body runs unchanged from a file
  * config and from a MemoryStream-backed [[DirectSource]] — proving the
  * transforms are transport-agnostic (the property that makes the
  * [[KafkaSourceConfig]] deployment a config swap).
  */
class StreamSourcesSpec extends SparkSuite {
  import spark.implicits._

  private def dims = {
    val songs = Seq(
      ("t1", "Song1", "rock", 1000),
      ("t2", "Song2", "pop", 2000)
    ).toDF("track_id", "track_name", "track_genre", "duration_ms")
    val users = Seq(("u1", "US"), ("u2", "DE")).toDF("user_id", "user_country")
    (songs, users)
  }

  private val rows = Seq(
    ("u1", "t1", "2024-01-01 10:00:00"),
    ("u1", "t1", "2024-01-01 11:00:00"),
    ("u2", "t2", "2024-01-01 12:00:00"))

  test("pipeline through DirectSource(MemoryStream) equals the file-driven KPIs") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, String)]
    input.addData(rows: _*)
    val stream = input.toDF().toDF("user_id", "track_id", "listen_time")

    val (songs, users) = dims
    var batches = Vector.empty[DataFrame]
    val ckpt = Files.createTempDirectory("graft-seam").toString
    val q = Pipeline.startFrom(spark, DirectSource(stream), ckpt,
      songs, users, kpis => batches = batches :+ kpis)
    q.awaitTermination()

    assert(batches.size == 1)
    val kpis = batches.head.orderBy("track_genre").collect()
    assert(kpis.length == 2)
    val rock = kpis.find(_.getString(0) == "rock").get
    assert(rock.getLong(2) == 2)      // listen_count
    assert(rock.getLong(3) == 1)      // unique_listeners (u1 twice)
    assert(rock.getLong(4) == 2000)   // total ms
    val pop = kpis.find(_.getString(0) == "pop").get
    assert(pop.getLong(2) == 1 && pop.getLong(4) == 2000)
  }

  test("FileSourceConfig through the seam behaves like the original reader") {
    val root = Files.createTempDirectory("graft-seam-file").toString
    val in = s"$root/in"; Files.createDirectories(java.nio.file.Paths.get(in))
    val header = "user_id,track_id,listen_time"
    Files.write(java.nio.file.Paths.get(in, "stream1.csv"),
      (header +: rows.map { case (u, t, l) => s"$u,$t,$l" }).mkString("\n").getBytes)
    Files.write(java.nio.file.Paths.get(in, "ignored.txt"), "a,b,c".getBytes)

    val (songs, users) = dims
    var batches = Vector.empty[DataFrame]
    val q = Pipeline.startFrom(spark, Pipeline.streamsFileConfig(in),
      s"$root/ckpt", songs, users, kpis => batches = batches :+ kpis)
    q.awaitTermination()
    assert(batches.size == 1, "glob-filtered file source must yield one batch")
    assert(batches.head.collect().map(_.getLong(2)).sum == 3)
  }

  test("KafkaSourceConfig is constructible deployment config (connector not in sandbox)") {
    // The seam's Kafka branch: assembling the config must not require a
    // broker or the connector — resolution happens inside open(), which
    // a real cluster (with spark-sql-kafka on the classpath) performs.
    val cfg = KafkaSourceConfig("broker:9092", "music-streams",
      Pipeline.streamsCsvSchema, maxOffsetsPerTrigger = Some(10000L))
    assert(cfg.valueSchema.fieldNames.toSeq ==
      Seq("user_id", "track_id", "listen_time"))
  }

  test("Kafka reader wiring: exact option map and value projection, no broker needed") {
    val cfg = KafkaSourceConfig("broker:9092", "music-streams",
      Pipeline.streamsCsvSchema, startingOffsets = "latest",
      maxOffsetsPerTrigger = Some(10000L))
    // the exact options the connector would receive — a typo here would
    // otherwise sleep until deployment
    assert(StreamSources.kafkaReaderOptions(cfg) == Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "subscribe" -> "music-streams",
      "startingOffsets" -> "latest",
      "maxOffsetsPerTrigger" -> "10000"))
    assert(StreamSources.kafkaReaderOptions(cfg.copy(maxOffsetsPerTrigger = None))
      .get("maxOffsetsPerTrigger").isEmpty,
      "unbounded configs must not emit a maxOffsetsPerTrigger option")

    // the value projection: kafka's (value: binary) rows → typed columns
    val payload = Seq(
      """{"user_id":"u1","track_id":"t1","listen_time":"2024-01-01 10:00:00"}""")
      .toDF("json")
      .select($"json".cast("binary").as("value"))
    val projected = StreamSources.projectJsonValue(payload, cfg.valueSchema)
    assert(projected.columns.toSeq == Seq("user_id", "track_id", "listen_time"))
    val r = projected.head()
    assert(r.getString(0) == "u1" && r.getString(1) == "t1")

    // and open() reaches source resolution with the kafka format — the
    // only step the sandbox cannot perform
    val e = intercept[Exception] { StreamSources.open(spark, cfg) }
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }
}
