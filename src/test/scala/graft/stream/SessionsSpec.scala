package graft.stream

import graft.SparkSuite
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class SessionsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize: gap splits sessions, state carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessions.Event]
    val q = Sessions.sessionize(input.toDS(), java.time.Duration.ofMinutes(30))
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    // batch 1: user 1 has two bursts 2h apart → first session closes
    input.addData(
      Sessions.Event(1L, ts("2024-01-01 10:00:00"), "click"),
      Sessions.Event(1L, ts("2024-01-01 10:10:00"), "view"),
      Sessions.Event(1L, ts("2024-01-01 12:30:00"), "click"),
      Sessions.Event(2L, ts("2024-01-01 09:00:00"), "click"))
    q.processAllAvailable()
    val afterB1 = spark.table("sessions_out")
      .as[Sessions.Session].collect().sortBy(_.user_id)
    assert(afterB1.length == 1)
    assert(afterB1(0).user_id == 1L && afterB1(0).n_events == 2
      && afterB1(0).duration_sec == 600)

    // batch 2: far-future events close the open sessions of both users
    input.addData(
      Sessions.Event(1L, ts("2024-01-02 08:00:00"), "click"),
      Sessions.Event(2L, ts("2024-01-02 08:00:00"), "click"))
    q.processAllAvailable()
    val afterB2 = spark.table("sessions_out")
      .as[Sessions.Session].collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(afterB2.length == 3)
    assert(afterB2.count(_.user_id == 2L) == 1)
    q.stop()
  }

  test("sessionize: late event within gap extends session start backward") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessions.Event]
    val q = Sessions.sessionize(input.toDS(), java.time.Duration.ofMinutes(30))
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    input.addData(Sessions.Event(1L, ts("2024-01-01 10:00:00"), "click"))
    q.processAllAvailable()
    // late event 10 min BEFORE the stored start, still within the gap
    input.addData(Sessions.Event(1L, ts("2024-01-01 09:50:00"), "view"))
    q.processAllAvailable()
    // far-future event closes the (extended) session
    input.addData(Sessions.Event(1L, ts("2024-01-02 00:00:00"), "click"))
    q.processAllAvailable()
    val out = spark.table("sessions_late").as[Sessions.Session].collect()
    assert(out.length == 1)
    assert(out(0).session_start == ts("2024-01-01 09:50:00"),
      s"session must extend backward, got start=${out(0).session_start}")
    assert(out(0).n_events == 2 && out(0).duration_sec == 600)
    q.stop()
  }

  test("watermarked daily window: append emits only finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessions.Event]
    val q = Sessions.dailyCounts(
        input.toDS().toDF().withColumnRenamed("ts", "ts"), "0 hours")
      .writeStream.format("memory").queryName("daily_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    input.addData(
      Sessions.Event(1L, ts("2024-01-01 10:00:00"), "click"),
      Sessions.Event(2L, ts("2024-01-01 11:00:00"), "click"),
      Sessions.Event(1L, ts("2024-01-01 12:00:00"), "view"))
    q.processAllAvailable()
    // day-1 window not final yet (watermark at 12:00 < day boundary)
    assert(spark.table("daily_out").isEmpty)

    input.addData(Sessions.Event(3L, ts("2024-01-02 06:00:00"), "click"))
    q.processAllAvailable()
    input.addData(Sessions.Event(3L, ts("2024-01-03 06:00:00"), "click"))
    q.processAllAvailable()
    val rows = spark.table("daily_out").orderBy("day", "event_type").collect()
    assert(rows.exists(r => r.getLong(2) == 2 && r.getString(1) == "click"))
    assert(rows.exists(r => r.getLong(2) == 1 && r.getString(1) == "view"))
    q.stop()
  }

  test("exactly-once dedup: replayed events collapse, watermark evicts state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessions.Event]
    val q = Sessions.dedupExactlyOnce(
        input.toDS().toDF(), Seq("user_id", "ts", "event_type"), "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    // at-least-once delivery: the same two events arrive three times
    val e1 = Sessions.Event(1L, ts("2024-01-01 10:00:00"), "click")
    val e2 = Sessions.Event(2L, ts("2024-01-01 10:05:00"), "view")
    input.addData(e1, e2, e1)
    q.processAllAvailable()
    input.addData(e2)
    q.processAllAvailable()
    assert(spark.table("dedup_out").count() == 2)
    q.stop()
  }

  /** Same stateful operator, RocksDB-backed state store — the 100 TB
    * config where state exceeds executor heap. Verifies the provider
    * loads (rocksdbjni is bundled with Spark) and state carries across
    * batches identically to the default HDFS-backed store.
    */
  test("sessionize on RocksDB state store: same cross-batch results") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Sessions.Event]
      val q = Sessions.sessionize(input.toDS(), java.time.Duration.ofMinutes(30))
        .writeStream.format("memory").queryName("sessions_rocksdb")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      input.addData(
        Sessions.Event(1L, ts("2024-01-01 10:00:00"), "click"),
        Sessions.Event(1L, ts("2024-01-01 10:10:00"), "view"))
      q.processAllAvailable()
      input.addData(Sessions.Event(1L, ts("2024-01-01 12:30:00"), "click"))
      q.processAllAvailable()
      val out = spark.table("sessions_rocksdb").as[Sessions.Session].collect()
      assert(out.length == 1 && out(0).n_events == 2 && out(0).duration_sec == 600)
      q.stop()
    } finally {
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("kafka payload parsing: JSON frames → validated stream rows") {
    val frames = Seq(
      """{"user_id":"u1","track_id":"t1","listen_time":"2024-01-01 10:00:00"}""",
      """{"user_id":"u2","track_id":null,"listen_time":"2024-01-01 10:00:00"}""",
      "not json at all")
      .toDF("payload")
      .selectExpr("CAST(NULL AS BINARY) AS key", "CAST(payload AS BINARY) AS value")
    val parsed = Sessions.parseKafkaPayload(frames).collect()
    assert(parsed.length == 1)
    assert(parsed(0).getString(0) == "u1" && parsed(0).getString(1) == "t1")
  }
}
