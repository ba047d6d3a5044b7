package graft.ext

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class CorpusAuditSpec extends SparkSuite {
  import spark.implicits._

  test("sourceOverlap: planted shared shingles counted once per pair") {
    // w=3 shingles. "a b c d" has shingles {a b c, b c d}; "b c d e"
    // has {b c d, c d e}: s1 and s2 share exactly one. s3 repeats s1's
    // text exactly (2 shared shingles with s1, 1 with s2), and its
    // second doc re-states "a b c d" — duplicate shingles within a
    // source must not inflate counts.
    val docs = Seq(
      (1L, "a b c d", "s1"),
      (2L, "b c d e", "s2"),
      (3L, "a b c d", "s3"),
      (4L, "a b c d x", "s3"),
      (5L, "q r s t", "s4") // overlaps nobody
    ).toDF("doc_id", "text", "source")
    val got = CorpusAudit.sourceOverlap(docs, w = 3)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("s1", "s2", 1L), ("s1", "s3", 2L), ("s2", "s3", 1L)))
  }

  test("sourceOverlap: short-doc edge shingle matches the whole doc") {
    // Docs shorter than w collapse to a single whole-doc shingle
    // (greatest(..., 1) floor) — two sources with the same short doc
    // must register one shared shingle.
    val docs = Seq(
      (1L, "a b", "s1"),
      (2L, "a b", "s2")
    ).toDF("doc_id", "text", "source")
    val got = CorpusAudit.sourceOverlap(docs, w = 8)
      .as[(String, String, Long)].collect().toList
    assert(got == List(("s1", "s2", 1L)))
  }

  test("sourceScorecard: hand-computed volumes, dup rate, mean length") {
    val docs = Seq(
      (1L, "a b c", "s1"),
      (2L, "a b c", "s1"),
      (3L, "d e", "s1"),
      (4L, "f", "s2")
    ).toDF("doc_id", "text", "source")
    val rows = CorpusAudit.sourceScorecard(docs).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("s1", "s2"))
    val s1 = rows(0)
    assert(s1.getLong(1) == 3 && s1.getLong(2) == 2 && s1.getLong(3) == 8)
    assert(math.abs(s1.getDouble(4) - 8.0 / 3) < 1e-12)
    assert(math.abs(s1.getDouble(5) - 1.0 / 3) < 1e-12)
    val s2 = rows(1)
    assert(s2.getLong(1) == 1 && s2.getLong(2) == 1 && s2.getLong(3) == 1)
    assert(s2.getDouble(5) == 0.0)
  }

  test("embedDriftMeans: planted mean shift is recovered per dimension") {
    // Old half (even ids) at 0.25 in dim 0; new half (odd ids) at
    // 0.75: delta must be 0.5 in dim 0 and 0 in dim 1 (both 0.5).
    val emb = Seq(
      (0L, Array(0.25f, 0.5f)),
      (2L, Array(0.25f, 0.5f)),
      (1L, Array(0.75f, 0.5f)),
      (3L, Array(0.75f, 0.5f))
    ).toDF("vec_id", "embedding")
    val rows = CorpusAudit.embedDriftMeans(emb, dims = 2).collect()
    assert(rows.length == 2)
    val d0 = rows(0)
    assert(d0.getLong(1) == 2 && d0.getLong(2) == 2)
    assert(math.abs(d0.getDouble(3) - 0.25) < 1e-9)
    assert(math.abs(d0.getDouble(4) - 0.75) < 1e-9)
    assert(math.abs(d0.getDouble(5) - 0.5) < 1e-9)
    assert(math.abs(rows(1).getDouble(5)) < 1e-9)
  }

  test("sourceOverlap plan: codegen candidate agg, broadcast semi-join") {
    // The 100x scale win lives in two physical choices (SCALING.md §2e):
    // the corpus-sized candidate groupBy must plan codegen'd
    // HashAggregate (primitive min/max buffers — an ObjectHashAggregate
    // here means a sort-based fallback over the gram stream), and the
    // candidate semi-join must stay broadcast (a sort-merge semi-join
    // shuffles token arrays riding every gram row). Pin both — each on
    // its FINALIZED adaptive plan: executing the inspected DataFrame
    // itself (collect) makes its own AdaptiveSparkPlanExec carry the
    // runtime-final plan, whereas a side count() runs a separate
    // QueryExecution and would leave this one pre-finalization.
    val docs = Tables.documents(spark, sfDir)
    val cand = CorpusAudit.overlapCandidates(docs)
    cand.collect()
    val cs = cand.queryExecution.executedPlan.toString
    assert(cs.contains("isFinalPlan=true"), s"expected finalized AQE plan:\n$cs")
    assert(!cs.contains("ObjectHashAggregate"),
      s"corpus-sized candidate agg fell out of HashAggregate:\n$cs")
    assert(cs.contains("HashAggregate"), s"expected codegen agg in:\n$cs")
    val df = CorpusAudit.sourceOverlap(docs)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("isFinalPlan=true"), s"expected finalized AQE plan:\n$s")
    assert(s.contains("BroadcastHashJoin") && s.contains("LeftSemi"),
      s"candidate semi-join must be broadcast:\n$s")
  }

  test("fixture runs: overlap non-empty, scorecard covers every source") {
    val docs = Tables.documents(spark, sfDir)
    assert(CorpusAudit.sourceOverlap(docs).count() > 0)
    val card = CorpusAudit.sourceScorecard(docs)
    assert(card.count() == docs.select(col("source")).distinct().count())
    val drift = CorpusAudit.embedDriftMeans(Tables.embeddings(spark, sfDir))
    assert(drift.count() == 64)
  }
}
