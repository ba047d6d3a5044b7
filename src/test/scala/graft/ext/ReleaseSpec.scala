package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The one-query corpus release ([[Release.release]]): stage
  * composition on a planted tiny corpus (each doomed doc dies at the
  * stage built to catch it), plus determinism / PII-audit / holdout
  * invariants on the fixture corpus. The per-value correctness of the
  * whole chain is the `corpus_release` oracle's job; these tests pin
  * BEHAVIOR (who survives and why).
  */
class ReleaseSpec extends SparkSuite {
  import spark.implicits._

  // 40 distinct tokens ending with ". " sentence breaks so the markup
  // shell's paragraph wrapping has something to split
  private def longText(prefix: String): String =
    (1 to 40).map(i => s"$prefix$i").mkString(" ") + "."

  test("each doomed doc dies at the stage built to catch it") {
    val good = longText("alpha")
    val evalText = longText("bench")
    val tiny = Seq(
      // survives everything
      (1L, good, "en", "srcA"),
      // byte-identical to doc 1 (same source — the title/h1 words land
      // in the extracted text, and the differing PII emails redact to
      // the same <EMAIL> token) → every 16-token segment duplicates
      // doc 1's → paragraph dedup drops it
      (2L, good, "en", "srcA"),
      // near-copy of the eval doc (same text + small suffix) → shares
      // ≥5 5-grams with the benchmark → decon drops it
      (3L, evalText + " extra tail words here.", "en", "srcC"),
      // 3 tokens → length floor drops it
      (4L, "too short doc.", "en", "srcD"),
      // the eval slice itself (held out of the release)
      (10L, evalText, "en", "srcE"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val released = Release.release(tiny, pplMarginNll = 100.0)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(released == Set(1L),
      s"expected only doc 1 to be released, got $released")
  }

  test("multimodal release: media stages compose, reconciled in-data") {
    val docs = graft.Tables.documents(spark, sfDir)
    val storeDir = {
      val d = "target/releasespec/store"
      deleteRecursively(d)
      MediaFeatures.ensure(spark, docs, d)
    }
    val base = Release.releaseCached(spark, docs)
      .select(col("doc_id")).as[Long].collect().toSet
    val mm = Release.releaseMultimodal(spark, docs, storeDir)
    val mmIds = mm.select(col("doc_id")).as[Long].collect().toSet
    // strictly a refinement of the text release
    assert(mmIds.subsetOf(base) && mmIds.nonEmpty)
    // reconcile against the stages it composes, recomputed standalone:
    // 1. every released doc passes the funnel's media gates
    val okIds = MediaQuality.mediaOkFlags(spark, storeDir)
      .filter(col("audio_ok") && col("video_ok") && col("image_ok"))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(mmIds.subsetOf(okIds), "a gate-failing doc was released")
    // 2. no decon hit is released
    val decon = MediaDedup.deconMedia(spark, docs, storeDir,
        benchIdBound = Release.MediaBenchBound)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(mmIds.intersect(decon).isEmpty, "a contaminated doc was released")
    // 3. exactly one released doc per touched image dup group, and it
    // is the group's minimum SURVIVING member (group-rep collapse)
    val groups = MediaDedup.imageDupGroupsOver(
        MediaFeatures.features(spark, storeDir)
          .filter(pmod(col("doc_id"), lit(10)) =!= 0)
          .select(col("doc_id"), col("dhash").as("sig")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val surv = base.filter(okIds).filterNot(decon)
    val expected = surv.groupBy(groups).values.map(_.min).toSet
    assert(mmIds == expected,
      s"group collapse mismatch: extra=${mmIds -- expected} missing=${expected -- mmIds}")
  }

  test("fixture release: deterministic, PII-audited, eval held out") {
    val docs = graft.Tables.documents(spark, sfDir)
    val a = Release.release(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(4))).sortBy(_._1).toSeq
    val b = Release.release(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(4))).sortBy(_._1).toSeq
    assert(a == b, "release must be deterministic")
    assert(a.nonEmpty)
    // the PII plant guarantees at least the email per corpus doc, and
    // the audit count must see it (redaction ran on PII-bearing text)
    assert(a.forall(_._2 >= 1L), "every released doc carries a PII audit count")
    // eval docs are the benchmark, never released
    assert(a.forall(_._1 % 10 != 0), "eval slice must be held out")
    // survival stays in a sane band (gates drop some docs, not most)
    val corpusN = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0).count()
    assert(a.size <= corpusN && a.size >= (corpusN * 6) / 10,
      s"release ${a.size} of $corpusN outside the expected band")
  }
}
