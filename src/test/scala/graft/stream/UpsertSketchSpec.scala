package graft.stream

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Multi-batch semantics of the update-mode upsert log — the one thing
  * the registered `stream_*_update` queries cannot exercise themselves:
  * under `Trigger.AvailableNow` on a static fixture the whole stream is
  * one micro-batch, so last-write-wins never has a second write. Here a
  * MemoryStream drives the SAME helpers across several micro-batches
  * and the snapshot must equal the plain batch aggregate after each.
  */
class UpsertSketchSpec extends SparkSuite {
  import spark.implicits._

  test("last write per key wins across micro-batches; snapshot == batch agg") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val agg = input.toDF().toDF("k", "v")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"))
    val store = java.nio.file.Files.createTempDirectory("upsert-spec-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("upsert-spec-ckpt").toString
    try {
      val q = StreamQueries.upsertStart(agg, store, ckpt, availableNow = false)
      def snapshot() = StreamQueries
        .upsertSnapshot(spark, store, Seq("k"))
        .orderBy(col("k"))
        .as[(String, Long, Long)].collect().toSeq

      input.addData(("a", 1L), ("a", 2L), ("b", 10L))
      q.processAllAvailable()
      assert(snapshot() == Seq(("a", 2L, 3L), ("b", 1L, 10L)))

      // batch 2 touches only "a" and a new key — "b" must keep its
      // batch-1 row, "a" must serve the SECOND write
      input.addData(("a", 4L), ("c", 7L))
      q.processAllAvailable()
      assert(snapshot() == Seq(("a", 3L, 7L), ("b", 1L, 10L), ("c", 1L, 7L)))

      // the log really holds both generations for "a" (this is what
      // distinguishes the upsert log from a complete-mode rewrite)
      val aRows = spark.read.parquet(store).filter(col("k") === "a")
      assert(aRows.count() == 2L, "expected one 'a' row per touching batch")
      assert(aRows.select(countDistinct(col("batch_id"))).head().getLong(0) == 2L)

      // batch 3: yet another update to "a" — three generations, newest wins
      input.addData(("a", 100L))
      q.processAllAvailable()
      assert(snapshot() == Seq(("a", 4L, 107L), ("b", 1L, 10L), ("c", 1L, 7L)))
      q.stop()
    } finally {
      deleteRecursively(store)
      deleteRecursively(ckpt)
    }
  }

  test("snapshot payload projection is schema-driven (keys + batch_id excluded)") {
    val log = Seq(
      ("d1", 0L, 5L, 1L),
      ("d1", 1L, 9L, 2L),
      ("d2", 0L, 3L, 3L)
    ).toDF("k", "batch_id", "cnt", "extra")
    val tmp = java.nio.file.Files.createTempDirectory("upsert-spec-proj").toString
    try {
      log.write.mode("overwrite").parquet(tmp)
      val snap = StreamQueries.upsertSnapshot(spark, tmp, Seq("k"))
      assert(snap.columns.toSeq.sorted == Seq("cnt", "extra", "k"))
      val rows = snap.orderBy(col("k")).as[(String, Long, Long)].collect().toSeq
      assert(rows == Seq(("d1", 9L, 2L), ("d2", 3L, 3L)))
    } finally deleteRecursively(tmp)
  }

  test("cms cells through the upsert log: additive merge across batches == batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select(col("date"), posexplode(
        graft.functions.native.cms_buckets(col("user"), 4))
        .as(Seq("row_i", "bucket")))
      .groupBy(col("date"), col("row_i"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val store = java.nio.file.Files.createTempDirectory("cms-spec-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cms-spec-ckpt").toString
    try {
      val q = StreamQueries.upsertStart(
        cells(input.toDF().toDF("date", "user")), store, ckpt, availableNow = false)
      val batch1 = Seq(("d1", "u1"), ("d1", "u1"), ("d1", "u2"), ("d2", "u3"))
      val batch2 = Seq(("d1", "u1"), ("d2", "u3"), ("d2", "u4"))
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      q.stop()
      val snap = StreamQueries
        .upsertSnapshot(spark, store, Seq("date", "row_i", "bucket"))
      val expected = cells((batch1 ++ batch2).toDF("date", "user"))
      assert(snap.join(expected, Seq("date", "row_i", "bucket"))
        .filter(snap("c") =!= expected("c")).count() == 0L)
      assert(snap.count() == expected.count(),
        "incrementally merged cells must equal the one-shot batch sketch")
      // state bound: d=4 rows × 256 buckets per day, no matter the users
      val perDay = snap.groupBy(col("date")).count().as[(String, Long)]
        .collect().toMap
      assert(perDay.values.forall(_ <= 1024L))
      // CMS point queries never underestimate: probe u1 on d1 (3 occ.)
      val probe = spark.createDataset(Seq("u1")).toDF("user")
        .select(posexplode(graft.functions.native.cms_buckets(col("user"), 4))
          .as(Seq("row_i", "bucket")))
      val est = snap.filter(col("date") === "d1")
        .join(probe, Seq("row_i", "bucket"))
        .agg(min(col("c"))).head().getLong(0)
      assert(est >= 3L)
    } finally {
      deleteRecursively(store)
      deleteRecursively(ckpt)
    }
  }
}
