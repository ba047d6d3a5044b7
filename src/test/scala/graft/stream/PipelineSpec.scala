package graft.stream

import graft.SparkSuite
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame

/** End-to-end micro-batch semantics (SURVEY.md §5.5): CSV files arriving
  * in a directory are processed exactly once; a re-run with no new files
  * produces no batches; a new file triggers exactly one more batch.
  */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  private def writeCsv(dir: String, name: String, rows: Seq[String]): Unit = {
    val header = "user_id,track_id,listen_time"
    Files.write(Paths.get(dir, name), (header +: rows).mkString("\n").getBytes)
  }

  private def dims = {
    val songs = Seq(
      ("t1", "Song1", "rock", 1000),
      ("t2", "Song2", "pop", 2000)
    ).toDF("track_id", "track_name", "track_genre", "duration_ms")
    val users = Seq(("u1", "US"), ("u2", "DE")).toDF("user_id", "user_country")
    (songs, users)
  }

  test("exactly-once file processing + empty-batch short-circuit") {
    val root = Files.createTempDirectory("graft-pipe").toString
    val in = s"$root/in"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    writeCsv(in, "stream1.csv", Seq(
      "u1,t1,2024-01-01 10:00:00",
      "u1,t1,2024-01-01 11:00:00",
      "u2,t2,2024-01-01 12:00:00"))
    writeCsv(in, "notes.txt", Seq("ignored,by,glob"))   // S6 filter

    val (songs, users) = dims
    var batches = Vector.empty[DataFrame]
    def run(): Unit = {
      val q = Pipeline.start(spark, in, ckpt, songs, users,
        kpis => batches = batches :+ kpis)
      q.awaitTermination()
    }

    run()
    assert(batches.size == 1, "first run should process exactly one batch")
    val kpis = batches.head.orderBy("track_genre").collect()
    assert(kpis.length == 2)
    val rock = kpis.find(_.getString(0) == "rock").get
    assert(rock.getLong(2) == 2)      // listen_count
    assert(rock.getLong(3) == 1)      // unique_listeners (u1 twice)
    assert(rock.getLong(4) == 2000)   // total ms

    // Re-run with no new files: checkpoint offsets mean zero batches.
    batches = Vector.empty
    run()
    assert(batches.isEmpty, "no new files must produce no batches")

    // One new file: exactly one incremental batch with only its rows.
    writeCsv(in, "stream2.csv", Seq("u2,t2,2024-01-02 09:00:00"))
    batches = Vector.empty
    run()
    assert(batches.size == 1)
    val inc = batches.head.collect()
    assert(inc.length == 1 && inc(0).getString(0) == "pop" && inc(0).getLong(2) == 1)
  }

  test("strict mode: malformed rows abort the batch; checkpoint not advanced") {
    val root = Files.createTempDirectory("graft-strict").toString
    val in = s"$root/in"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    writeCsv(in, "stream_bad.csv", Seq(
      "u1,t1,2024-01-01 10:00:00",
      "u1,t1,not-a-timestamp"))
    val (songs, users) = dims
    var batches = Vector.empty[DataFrame]
    val q = Pipeline.start(spark, in, ckpt, songs, users,
      kpis => batches = batches :+ kpis, failOnValidationError = true)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(e.getMessage.contains("strict validation") ||
      e.getCause.getMessage.contains("strict validation"))
    assert(batches.isEmpty, "strict failure must not emit output")

    // fix the file, rerun from the same checkpoint: the batch replays
    writeCsv(in, "stream_bad.csv", Seq("u1,t1,2024-01-01 10:00:00"))
    val q2 = Pipeline.start(spark, in, ckpt, songs, users,
      kpis => batches = batches :+ kpis, failOnValidationError = true)
    q2.awaitTermination()
    assert(batches.size == 1 && batches.head.count() == 1)
  }

  test("streaming KPIs load the serving store through the chunked sink") {
    import org.apache.spark.sql.functions.col
    import graft.serve.{FakeKvService, KeyValue, KeyValueSink}
    val root = Files.createTempDirectory("graft-kvload").toString
    val in = s"$root/in"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    writeCsv(in, "stream1.csv", Seq(
      "u1,t1,2024-01-01 10:00:00",
      "u1,t1,2024-01-01 11:00:00",
      "u2,t2,2024-01-01 12:00:00"))
    val (songs, users) = dims
    FakeKvService.reset()
    // the reference's full loop: micro-batch KPIs → R1 unpivot →
    // batched store load (music-streaming-transform.py → dynamodb-
    // ingestion.py), all inside foreachBatch
    val q = Pipeline.start(spark, in, ckpt, songs, users, kpis => {
      val items = KeyValue.kpiItems(kpis.select(
        col("track_genre").as("event_type"), col("date"),
        col("listen_count"), col("unique_listeners"),
        col("total_listening_time_ms").cast("double").as("total_value"),
        col("avg_listening_time_ms").cast("double").as("avg_value")))
      KeyValueSink.write(items, () => new FakeKvService.Writer, backoffMs = 0L)
    })
    q.awaitTermination()
    // 2 genres × 1 day × 4 metrics
    assert(FakeKvService.store.size() == 8, FakeKvService.store.toString)
    assert(FakeKvService.store.get(
      ("GENRE#rock#DATE#2024-01-01", "METRIC#listen_count")) == "2")
    assert(FakeKvService.store.get(
      ("GENRE#pop#DATE#2024-01-01", "METRIC#unique_listeners")) == "1")
  }

  test("K4: processed source files are archived (cleanSource=archive)") {
    val root = Files.createTempDirectory("graft-arch").toString
    val in = s"$root/in"; val ckpt = s"$root/ckpt"; val arch = s"$root/archive"
    Files.createDirectories(Paths.get(in))
    writeCsv(in, "stream1.csv", Seq("u1,t1,2024-01-01 10:00:00"))
    val (songs, users) = dims
    def run(): Unit = {
      val q = Pipeline.start(spark, in, ckpt, songs, users, _ => (),
        archiveDir = Some(arch))
      q.awaitTermination()
    }
    run()
    // archival is asynchronous and happens on subsequent batch commits —
    // drive more batches and poll.
    var archived = Seq.empty[java.io.File]
    var attempts = 0
    while (archived.isEmpty && attempts < 10) {
      writeCsv(in, s"stream_more_$attempts.csv", Seq("u2,t2,2024-01-01 11:00:00"))
      run()
      val dir = new java.io.File(arch)
      archived =
        if (dir.exists()) {
          def walk(f: java.io.File): Seq[java.io.File] =
            if (f.isFile) Seq(f) else Option(f.listFiles()).toSeq.flatten.flatMap(walk)
          walk(dir).filter(_.getName.endsWith(".csv"))
        } else Seq.empty
      attempts += 1
    }
    assert(archived.nonEmpty, s"no files archived after $attempts extra batches")
    assert(archived.exists(_.getName.contains("stream")))
  }

  test("malformed rows are dropped by validation, not fatal (resilient mode)") {
    val root = Files.createTempDirectory("graft-pipe2").toString
    val in = s"$root/in"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    writeCsv(in, "stream_bad.csv", Seq(
      "u1,t1,2024-01-01 10:00:00",
      "u1,t1,not-a-timestamp",
      ",t1,2024-01-01 10:00:00"))
    val (songs, users) = dims
    var batches = Vector.empty[DataFrame]
    val q = Pipeline.start(spark, in, ckpt, songs, users,
      kpis => batches = batches :+ kpis)
    q.awaitTermination()
    assert(batches.size == 1)
    val rows = batches.head.collect()
    assert(rows.length == 1 && rows(0).getLong(2) == 1)
  }
}
