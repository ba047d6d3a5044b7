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

  test("native cms_buckets kernel == md5-hex compositional twin, every token") {
    // the hot path computes buckets as raw digest bytes; the oracle
    // replays hex-substring parses — pin that they never diverge
    val terms = Sketches.tokenStream(docs).distinct()
    val mismatches = terms
      .select(col("term"),
        graft.functions.native.cms_buckets(col("term"), 4).as("kb"),
        Sketches.bucketsHex(col("term"), 4).as("hb"))
      .filter(col("kb") =!= col("hb"))
      .count()
    assert(mismatches == 0L, s"kernel/hex bucket divergence on $mismatches terms")
    // and on non-ASCII terms (digest runs over UTF-8 bytes)
    val uni = Seq("héllo", "日本語", "emoji🙂", "ß").toDF("term")
    assert(uni.select(
        (graft.functions.native.cms_buckets(col("term"), 16) ===
          Sketches.bucketsHex(col("term"), 16)).as("ok"))
      .collect().forall(_.getBoolean(0)))
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
