package graft.stream

import graft.SparkSuite
import graft.ext.{Artifact, LanguageModel}
import org.apache.spark.sql.functions._

/** The quality-gated admission composition: the perplexity gate filters
  * at the door, the ingest layer's own gates still apply to survivors,
  * and replays are no-ops end to end.
  */
class CuratedIngestSpec extends SparkSuite {
  import spark.implicits._

  private val base = "target/curatedspec"
  private val root = s"$base/root"
  private val lmDir = s"$base/lm"

  // fluent seed corpus: a narrow shared vocabulary
  private val seedDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the lazy dog sleeps near the river bank while the fox jumps over"),
    (3L, "a brown fox and a lazy dog rest near the quiet river bank"))

  private def setUp(): Double = {
    deleteRecursively(base)
    val seed = seedDocs.toDF("doc_id", "text")
    IncrementalIngest.init(spark, seed, root)
    LanguageModel.ensureLm(spark, seed, lmDir)
    // threshold between the fluent head and rare-token soup: the seed's
    // own max mean NLL plus slack — corpus-vocab text passes, soup fails
    val maxSeed = LanguageModel.score(spark, seed, lmDir)
      .agg(max(col("mean_nll"))).head().getDouble(0)
    maxSeed + 0.5
  }

  test("perplexity gate rejects soup at the door; fluent docs flow through the full admission") {
    val thr = setUp()
    val batch = Seq(
      (11L, "the quick fox jumps near the river bank and the dog sleeps"), // fluent
      (12L, "zxqv wjkp qqzz vbnm xkcd plmo qwer asdf zxcv tyui ghjk bnmv"), // soup
      (13L, "the quick brown fox jumps over the lazy dog near the river bank today")) // near-dup of seed 1
    val s = CuratedIngest.ingestBatch(spark, batch.toDF("doc_id", "text"),
      root, lmDir, thr)
    assert(s.batchRows == 3)
    assert(s.rejectedQuality == 1, s"the soup doc must fail the gate: $s")
    assert(s.ingest.batchRows == 2, "only gate survivors reach admission")
    assert(s.ingest.rejectedVsCorpus == 1, s"the near-dup must still be rejected: $s")
    assert(s.ingest.accepted == 1, s"the fluent unique doc must land: $s")
    val ids = IncrementalIngest.corpus(spark, root)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 11L))
    assert(!ids.contains(12L), "soup must never reach the corpus store")
  }

  test("replaying the same batch is a no-op end to end") {
    val thr = setUp()
    val batch = Seq(
      (11L, "the quick fox jumps near the river bank and the dog sleeps"),
      (12L, "zxqv wjkp qqzz vbnm xkcd plmo qwer asdf zxcv tyui ghjk bnmv"))
    CuratedIngest.ingestBatch(spark, batch.toDF("doc_id", "text"), root, lmDir, thr)
    val meta = Artifact.readMeta(spark, root)
    val s = CuratedIngest.ingestBatch(spark, batch.toDF("doc_id", "text"), root, lmDir, thr)
    assert(s.rejectedQuality == 1, "the gate re-rejects deterministically")
    assert(s.ingest.replayed == 1 && s.ingest.accepted == 0,
      s"the survivor is a replay for the ingest layer: $s")
    assert(Artifact.readMeta(spark, root) == meta,
      "a replayed batch must not touch the root's fingerprint")
  }

  test("stats account for every batch row") {
    val thr = setUp()
    val batch = Seq(
      (11L, "the quick fox jumps near the river bank and the dog sleeps"),
      (12L, "zxqv wjkp qqzz vbnm xkcd plmo qwer asdf zxcv tyui ghjk bnmv"),
      (13L, "qqq www eee rrr ttt yyy uuu iii ooo ppp aaa sss ddd fff"))
    val s = CuratedIngest.ingestBatch(spark, batch.toDF("doc_id", "text"),
      root, lmDir, thr)
    assert(s.batchRows == s.rejectedQuality + s.ingest.batchRows)
    assert(s.ingest.batchRows == s.ingest.replayed + s.ingest.conflicting +
      s.ingest.rejectedVsCorpus + s.ingest.rejectedWithinBatch + s.ingest.accepted)
  }
}
