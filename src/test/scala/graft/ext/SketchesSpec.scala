package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** CMS invariants beyond the oracle's cell-level replay: the sketch
  * never underestimates, its size is bounded by d·w independent of
  * vocabulary, and a collision-free probe returns the exact count.
  */
class SketchesSpec extends SparkSuite {
  import spark.implicits._

  private def docs = graft.Tables.documents(spark, sfDir)

  test("cms point estimates never underestimate (overest >= 0 on fixture)") {
    val est = Sketches.cmsEstimateTopK(docs, k = 30).collect()
    assert(est.length == 30)
    assert(est.forall(_.getAs[Long]("overest") >= 0L))
  }

  test("sketch table is bounded by d*w cells and conserves total mass per row") {
    val toks = Sketches.tokenStream(docs).cache()
    val total = toks.count()
    val sketch = Sketches.cmsBuild(toks, d = 4).collect()
    assert(sketch.length <= 4 * 256)
    // every hash row partitions the full stream: its cells sum to N
    val perRow = sketch.groupBy(_.getAs[Int]("row_i"))
      .view.mapValues(_.map(_.getAs[Long]("c")).sum).toMap
    assert(perRow.values.toSet == Set(total))
    toks.unpersist()
  }

  test("single-term stream estimates exactly (no collisions possible)") {
    val docs1 = Seq((0L, "alpha alpha alpha", "en", "t", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val est = Sketches.cmsEstimateTopK(docs1, k = 5).collect()
    assert(est.length == 1)
    assert(est.head.getAs[Long]("n_exact") == 3L)
    assert(est.head.getAs[Long]("n_est") == 3L)
  }
}
