package graft.sources

import graft.{SparkSuite, Tables}
import graft.ingest.Validate
import java.nio.file.Files

class LayoutObserveSpec extends SparkSuite {
  import spark.implicits._

  test("compact: many small files → target count, data intact") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val src = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    src.repartition(24).write.parquet(dir)   // simulate micro-batch litter
    val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 20)
    val rows = spark.read.parquet(dir).count()
    val after = Layout.compact(spark, dir, 2)
    assert(after <= 4, s"expected ~2 files after compaction, got $after")
    assert(spark.read.parquet(dir).count() == rows)
  }

  test("observed: row and null counts ride the action, no extra pass") {
    val df = Seq(
      (Some("u1"), Some("t1")), (None, Some("t2")), (Some("u3"), None)
    ).toDF("user_id", "track_id")
    val (observed, obs) = Validate.observed(df, "val_metrics", Seq("user_id", "track_id"))
    observed.collect() // one action
    val m = obs.get
    assert(m("n_rows") == 3L)
    assert(m("null_user_id") == 1L)
    assert(m("null_track_id") == 1L)
  }
}
