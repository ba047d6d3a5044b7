package graft.stream

import graft.SparkSuite
import graft.ext.Artifact
import graft.serve.KeyValue
import java.io.File
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

object ServingIngestSpec {
  /** Raw event row in the fixture table's on-disk shape (µs ts). */
  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
                            user_id: Long, event_type: String,
                            value: Double, props: String)
}

/** The streamed transform→serve chain: event batches append to an owned
  * copy of the fact table, the day-partitioned serving store refreshes
  * exactly its changed days per micro-batch, lookups see the refreshed
  * store, and a checkpoint replay moves nothing.
  */
class ServingIngestSpec extends SparkSuite {
  import ServingIngestSpec.EventRow
  import spark.implicits._

  private val base = "target/servingingestspec"
  private val fix = s"$base/servefix"

  private def setUp(): Unit = {
    deleteRecursively(base)
    deleteRecursively(Artifact.root(fix))
    Files.createDirectories(Paths.get(fix))
    new File(sfDir).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => Files.copy(f.toPath, Paths.get(fix, f.getName)))
  }

  private def ev(id: Long, day: String, user: Long, typ: String, v: Double) =
    EventRow(id, java.sql.Timestamp.valueOf(s"$day 12:00:00"), user, typ, v, "{}")

  private def dayDirs(store: String): Map[String, Long] =
    new File(store).listFiles().filter(_.getName.startsWith("d="))
      .map(d => d.getName -> d.listFiles().map(_.lastModified()).max).toMap

  private def storeRows(df: DataFrame): Set[(String, String, String, String)] =
    df.select("pk", "sk", "value", "record_type")
      .as[(String, String, String, String)].collect().toSet

  private def runStream(ckpt: String, rows: Seq[EventRow]): Vector[Long] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    if (rows.nonEmpty) input.addData(rows: _*)
    var batches = Vector.empty[Long]
    val q = ServingIngest.start(spark, DirectSource(input.toDF()), ckpt, fix,
      onBatch = (id, _) => batches = batches :+ id)
    q.awaitTermination()
    batches
  }

  test("streamed increment refreshes exactly the touched days; lookups serve the refreshed store") {
    setUp()
    val store = KeyValue.ensureStoreDaily(spark, fix)
    val before = dayDirs(store)
    assert(before.nonEmpty)
    // prime the load-once cache so the test proves invalidation too
    val primedL1 = KeyValue.dailyStoreCached(spark, fix)
      .filter(col("pk").contains("DATE#2024-02-01")).count()
    assert(primedL1 == 0L, "the new day must not exist before the increment")

    val batches = runStream(s"$base/ckpt1", Seq(
      ev(2001L, "2024-01-03", 0L, "click", 5.5),
      ev(2002L, "2024-01-03", 1L, "purchase", 7.25),
      ev(2003L, "2024-02-01", 2L, "click", 1.75)))
    assert(batches == Vector(0L), s"one drained micro-batch: $batches")

    val after = dayDirs(store)
    assert(after.keySet == before.keySet + "d=2024-02-01",
      "the new day must appear as a new partition")
    val touched = before.keys.filter(d => before(d) != after(d)).toSet
    assert(touched == Set("d=2024-01-03"),
      s"only the modified existing day may be rewritten: $touched")

    // the incrementally refreshed store must equal a from-scratch
    // recompute of the serving projection over the mutated fact table
    assert(storeRows(KeyValue.loadDailyStore(spark, fix)) ==
      storeRows(KeyValue.servingTable(spark, fix)),
      "O(changed days) refresh must be content-identical to a full rebuild")

    // and the CACHED lookup path serves the refreshed data (invalidate
    // dropped the pre-mutation materialization)
    assert(KeyValue.dailyStoreCached(spark, fix)
      .filter(col("pk").contains("DATE#2024-02-01")).count() > 0L,
      "lookups after the streamed increment must see the new day")
  }

  test("checkpoint replay is a physical no-op end to end") {
    setUp()
    val rows = Seq(ev(2001L, "2024-01-05", 0L, "view", 2.5))
    runStream(s"$base/ckpt2", rows)
    val store = s"${Artifact.root(fix)}/serving_daily/store"
    val storeState = dayDirs(store)
    val factFiles = new File(s"$fix/events.parquet").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap

    val replay = runStream(s"$base/ckpt2", rows)
    assert(replay.isEmpty, "a drained checkpoint delivers no batches")
    assert(dayDirs(store) == storeState, "the store must not be touched")
    assert(new File(s"$fix/events.parquet").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap == factFiles,
      "the fact table must not be touched")
  }

  test("re-running an identical batch id re-lands byte-identical files and the store ignores it") {
    setUp()
    KeyValue.ensureStoreDaily(spark, fix)
    val rows = Seq(ev(3001L, "2024-01-07", 1L, "click", 3.5)).toDF()
    ServingIngest.appendEvents(spark, fix, rows, batchId = 0L)
    KeyValue.invalidate(spark, fix)
    val store = KeyValue.ensureStoreDaily(spark, fix)
    val state = dayDirs(store)
    val rowsAfterFirst = storeRows(KeyValue.loadDailyStore(spark, fix))

    // the foreachBatch replay contract: same batch id, same data —
    // the append clears its own previous file set and re-lands, the
    // day fingerprints don't move, the store is not rewritten
    ServingIngest.appendEvents(spark, fix, rows, batchId = 0L)
    KeyValue.invalidate(spark, fix)
    KeyValue.ensureStoreDaily(spark, fix)
    assert(dayDirs(store) == state, "identical replayed content must not refresh any day")
    assert(storeRows(KeyValue.loadDailyStore(spark, fix)) == rowsAfterFirst,
      "no double-counting under batch replay")
  }
}
