package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SegmentDedupSpec extends SparkSuite {
  import spark.implicits._

  // segTokens = 2 keeps the fixtures readable: doc 1 = [a b][c d][e f],
  // doc 2 repeats doc 1's middle segment and owns one; doc 3 is made
  // ENTIRELY of segments claimed by docs 1 and 2.
  private def docs = Seq(
    (1L, "a b c d e f"),
    (2L, "c d x y"),
    (3L, "c d a b x y")
  ).toDF("doc_id", "text")

  test("each distinct segment survives once, at its least (doc_id, seg_idx)") {
    val out = Dedup.dedupSegments(docs, segTokens = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 3L, "a b c d e f"),   // first doc keeps everything
      (2L, 2L, 1L, "x y"),           // "c d" already claimed by doc 1
      (3L, 3L, 0L, "")))             // every segment claimed earlier
  }

  test("within one doc a repeated segment keeps only its first occurrence") {
    val rep = Seq((7L, "p q p q r s")).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(rep, segTokens = 2)
      .as[(Long, Long, Long, String)].head()
    assert(out == ((7L, 3L, 2L, "p q r s")))
  }

  test("tail segment shorter than segTokens is its own unit") {
    val t = Seq((1L, "a b c"), (2L, "z z a b")).toDF("doc_id", "text")
    // doc 1 = [a b][c]; doc 2 = [z z][a b] — doc 2 loses only "a b"
    val out = Dedup.dedupSegments(t, segTokens = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 2L, 2L, "a b c"), (2L, 2L, 1L, "z z")))
  }

  test("duplicate-free corpus round-trips verbatim") {
    val clean = Seq((1L, "one two three four five"), (2L, "six seven eight"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupSegments(clean, segTokens = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out.map(r => r._4) == Seq("one two three four five", "six seven eight"))
    assert(out.forall(r => r._2 == r._3), "n_kept == n_segs when nothing collides")
  }

  test("boilerplate strip: over-threshold segments vanish from EVERY doc") {
    // "c d" appears in docs 1, 2, 3 (df=3) → stripped everywhere with
    // maxDocs=2, including its FIRST occurrence (unlike dedupSegments);
    // "a b" (df=2) and "x y" (df=2) stay everywhere.
    val out = Dedup.boilerplateStrip(docs, segTokens = 2, maxDocs = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 2L, "a b e f"),
      (2L, 2L, 1L, "x y"),
      (3L, 3L, 2L, "a b x y")))
    // tightening the bound to 1 also strips the df=2 segments
    val strict = Dedup.boilerplateStrip(docs, segTokens = 2, maxDocs = 1)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(strict.map(_._4) == Seq("e f", "", ""))
    // a duplicate-free corpus round-trips verbatim
    val clean = Seq((1L, "one two three four")).toDF("doc_id", "text")
    assert(Dedup.boilerplateStrip(clean, segTokens = 2, maxDocs = 1)
      .as[(Long, Long, Long, String)].head()._4 == "one two three four")
  }

  test("segmentsByTokens: aligned windows, last partial, empty-safe") {
    val segs = Dedup.segmentsByTokens(
        Seq((1L, "a b c d e")).toDF("doc_id", "text"), segTokens = 2)
      .orderBy("seg_idx").as[(Long, Int, String)].collect().toSeq
    assert(segs == Seq((1L, 0, "a b"), (1L, 1, "c d"), (1L, 2, "e")))
  }
}
