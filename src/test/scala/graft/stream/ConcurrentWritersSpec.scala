package graft.stream

import graft.SparkSuite
import graft.ext.{Artifact, LanguageModel, MediaFeatures, Multimodal}
import org.apache.spark.sql.functions._

/** Concurrent-writer artifact safety (the r16 verdict's interleaving
  * gap): the two streaming ingests ([[CuratedIngest]] → the curated
  * text store, [[MediaIngest]] → the media feature store) and the
  * nightly [[graft.Maintenance.compactAll]] sweep share the same
  * artifact root in production. Each lifecycle is spec'd alone
  * elsewhere; this spec interleaves append / remove / compact ACROSS
  * both writers — compaction landing between one writer's batches
  * while the other keeps ingesting — and asserts the two store-level
  * invariants the lifecycle promises:
  *
  *  - NO LOST ADMISSION: every document accepted by any batch before
  *    or after a sweep is served afterwards (compaction rewrites
  *    files, never membership), and a replay of an already-absorbed
  *    batch across a sweep is a counted no-op;
  *  - NO DOUBLE-SERVE: no doc_id is served twice — not by a replayed
  *    batch, not by a re-admission after removal, and not by the
  *    generation reset (compact re-stamps survivors gen 0 and resets
  *    the counter, so a LATER tombstone at tgen=1 must still mask
  *    them — the zombie-manifest rule — while a post-removal
  *    re-admission at gen 1 must serve again).
  *
  * Interleaving here is sequential (operation-level): the stores'
  * single-writer-at-a-time contract per artifact is enforced by the
  * pending-mutation marker ([[Artifact.beginMutation]] — a sweep skips
  * mid-mutation roots, a serve fails loud on them), so the adversarial
  * schedule is operations landing between each other's batches, which
  * is exactly what this spec drives.
  */
class ConcurrentWritersSpec extends SparkSuite {
  import spark.implicits._

  // a pseudo sf-dir so Maintenance.compactAll sweeps exactly the two
  // roots this spec creates (Artifact.root keys on the dir NAME)
  private val fixtureName = "concurspec_fixture"
  private val aroot = Artifact.root(fixtureName)
  private val curRoot = s"$aroot/stream_curated"
  private val medRoot = s"$aroot/stream_media"
  private val lmDir = s"$aroot/gate_lm"

  private val seedDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the lazy dog sleeps near the river bank while the fox jumps over"),
    (3L, "a brown fox and a lazy dog rest near the quiet river bank"))

  private def mediaBatch(ids: Long*) =
    Multimodal.withFakeAllMedia(ids.toDF("doc_id"))
      .select(col("doc_id"), col("img"), col("wav"), col("y4m"))

  private def curatedIds: Set[Long] =
    IncrementalIngest.corpus(spark, curRoot).select("doc_id")
      .as[Long].collect().toSet

  private def mediaIds: Set[Long] =
    MediaFeatures.features(spark, medRoot).select("doc_id")
      .as[Long].collect().toSet

  private def assertNoDoubleServe(): Unit = {
    val curDup = IncrementalIngest.corpus(spark, curRoot)
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    val medDup = MediaFeatures.features(spark, medRoot)
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(curDup == 0L, s"curated store double-serves $curDup ids")
    assert(medDup == 0L, s"media store double-serves $medDup ids")
  }

  test("append/remove/compact interleaved across both writers: no lost admission, no double-serve") {
    deleteRecursively(aroot)
    // ---- seed both stores + the curated gate's LM artifact
    val seed = seedDocs.toDF("doc_id", "text")
    IncrementalIngest.init(spark, seed, curRoot)
    LanguageModel.ensureLm(spark, seed, lmDir)
    val thr = LanguageModel.score(spark, seed, lmDir)
      .agg(max(col("mean_nll"))).head().getDouble(0) + 0.5
    MediaFeatures.ensure(spark,
      (1L to 57L).filter(_ % 10 != 0).toDF("doc_id"), medRoot)
    val medSeed = mediaIds

    // ---- writer A (curated) absorbs a batch; writer B (media) too
    val c1 = Seq(
      (11L, "the quick fox jumps near the river bank and the dog sleeps"),
      (13L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    val s1 = CuratedIngest.ingestBatch(spark, c1, curRoot, lmDir, thr)
    assert(s1.ingest.accepted == 1 && s1.ingest.rejectedVsCorpus == 1)
    val m1 = MediaIngest.ingestBatch(spark, mediaBatch(10L, 20L, 30L), medRoot)
    assert(m1.accepted + m1.rejectedQuality == 3,
      s"fresh ids must be decoded and gated: $m1")
    val medAfterM1 = mediaIds
    assert((medAfterM1 -- medSeed).size.toLong == m1.accepted)

    // ---- the nightly sweep lands BETWEEN the writers' batches
    val swept1 = graft.Maintenance.compactAll(spark, fixtureName).map(_._1)
    assert(swept1.contains("stream_curated") && swept1.contains("stream_media"),
      s"the sweep must cover both live ingest roots, got $swept1")
    assert(curatedIds == Set(1L, 2L, 3L, 11L), "sweep lost a curated admission")
    assert(mediaIds == medAfterM1, "sweep lost a media admission")

    // ---- both writers continue across the sweep: replays are no-ops,
    // fresh rows land under the RESET generation counter
    val s2 = CuratedIngest.ingestBatch(spark, c1.unionByName(
        Seq((14L, "the brown dog rests near the quiet river bank with a fox"))
          .toDF("doc_id", "text")), curRoot, lmDir, thr)
    assert(s2.ingest.accepted == 1 && s2.ingest.replayed == 1,
      s"post-sweep replay must be a counted no-op: $s2")
    val m2 = MediaIngest.ingestBatch(spark, mediaBatch(10L, 20L, 30L, 40L), medRoot)
    assert(m2.replayed == m1.accepted,
      s"post-sweep media replay must short-circuit at the membership probe: $m2")

    // ---- interleaved removals (each writer, between the other's ops)
    val nCur = IncrementalIngest.removeDocs(spark, curRoot, Seq(11L).toDF("doc_id"))
    assert(nCur == 1L)
    val medVictim = (medAfterM1 -- medSeed).head
    MediaIngest.removeDocs(spark, Seq(medVictim).toDF("doc_id"), medRoot)
    assert(!mediaIds.contains(medVictim), "tombstone must mask immediately")

    // ---- second sweep: tombstones fold in, then POST-compact removal
    // exercises the gen-reset/tombstone ordering (the zombie rule)
    graft.Maintenance.compactAll(spark, fixtureName)
    assert(!mediaIds.contains(medVictim), "compaction must not resurrect")
    assert(!curatedIds.contains(11L), "compaction must not resurrect")
    val medVictim2 = (mediaIds -- medSeed).headOption
    medVictim2.foreach { v =>
      // remove AFTER the reset: tombstone lands at tgen = 1 against
      // re-stamped gen-0 rows — it must mask them...
      MediaIngest.removeDocs(spark, Seq(v).toDF("doc_id"), medRoot)
      assert(!mediaIds.contains(v), "post-compact tombstone must mask gen-0 rows")
      // ...while a re-admission at gen >= tgen serves again
      val re = MediaIngest.ingestBatch(spark, mediaBatch(v), medRoot)
      assert(re.accepted == 1, s"removed id must be re-admittable: $re")
      assert(mediaIds.contains(v), "re-admitted doc must serve")
    }
    // the curated removal freed the id too — re-offer re-admits
    val s3 = CuratedIngest.ingestBatch(spark,
      Seq((11L, "the quick fox jumps near the river bank and the dog sleeps"))
        .toDF("doc_id", "text"), curRoot, lmDir, thr)
    assert(s3.ingest.accepted == 1, s"removed curated id must re-admit: $s3")

    // ---- end state: everything admitted exactly once
    assert(curatedIds == Set(1L, 2L, 3L, 11L, 14L))
    assertNoDoubleServe()

    // ---- a writer crash mid-mutation must make the NEXT sweep skip
    // that root (single-writer safety), not corrupt it
    Artifact.beginMutation(spark, medRoot)
    val swept2 = graft.Maintenance.compactAll(spark, fixtureName).map(_._1)
    assert(!swept2.contains("stream_media"),
      "the sweep must skip a mid-mutation root")
    Artifact.endMutation(spark, medRoot)
    assertNoDoubleServe()
  }
}
