package graft.stream

import graft.SparkSuite
import graft.ext.{Artifact, MediaDedup, MediaFeatures, MediaQuality}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streamed media-feature ingestion ([[MediaIngest]]): exactly-once
  * admission, the quality→dedup gate order, replay-storm no-ops, the
  * insert-only conflict contract, and batch-split invariance — the
  * properties the registered `stream_media_corpus` query's hash match
  * rests on.
  */
class MediaIngestSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs =
    graft.Tables.documents(spark, sfDir).select(col("doc_id"))
  private lazy val seed = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)

  private def freshRoot(name: String): String = {
    val d = s"target/mediaingestspec/$name"
    deleteRecursively(d)
    MediaFeatures.ensure(spark, seed, d)
  }

  private def storeIds(dir: String): Set[Long] =
    MediaFeatures.features(spark, dir)
      .select(col("doc_id")).as[Long].collect().toSet

  private lazy val arrivals: DataFrame =
    MediaIngest.fixtureArrivals(spark, docs).localCheckpoint()

  test("admission: quality gate, both dup tiers, plants never admitted") {
    val root = freshRoot("admission")
    val before = storeIds(root)
    val stats = MediaIngest.ingestBatch(spark, arrivals, root)
    val after = storeIds(root)
    // accounting identity
    assert(stats.batchRows === stats.replayed + stats.conflicting +
      stats.rejectedQuality + stats.rejectedDupStore +
      stats.rejectedDupBatch + stats.accepted)
    // every rejection path carried traffic: the 6 degenerate payloads
    // + the truncated-image arrival (quality), the seed-sourced exact
    // re-deliveries and tri-modal re-renders (store tier), the clones
    // of batch docs (batch tier)
    assert(stats.rejectedQuality >= 7, s"quality plants missing: $stats")
    assert(stats.rejectedDupStore >= 1, s"store-tier plants missing: $stats")
    assert(stats.rejectedDupBatch >= 1, s"batch-tier plants missing: $stats")
    // the single-modality re-encode plants (video fps swap, audio
    // 48 kHz header) differ from their sources in exactly one payload
    // hash — the exact tier is blind to them; tiers 3/4 must reject
    // every one (their sources are all real docs, seed or batch)
    val dupRejected = stats.rejectedDupStore + stats.rejectedDupBatch
    val nVideoPlants = docs.filter(pmod(col("doc_id"), lit(431)) === 3).count()
    val nAudioPlants = docs.filter(pmod(col("doc_id"), lit(433)) === 4).count()
    assert(nVideoPlants > 0 && nAudioPlants > 0, "re-encode plants must exist")
    assert(dupRejected >= nVideoPlants + nAudioPlants,
      s"re-encode plants not all rejected: $stats")
    assert(stats.accepted > 0 && stats.replayed === 0 && stats.conflicting === 0)
    // no plant id ever reaches the store; admitted ids are real batch docs
    val admitted = after -- before
    assert(admitted.forall(id => id < MediaQuality.PlantBase && id % 10 == 0),
      s"non-batch ids admitted: ${admitted.filter(_ >= MediaQuality.PlantBase)}")
    // every admitted doc passes the quality gate on the store's own rows
    val flagged = MediaQuality.qualityFlags(
        MediaFeatures.features(spark, root))
      .filter(col("undecodable") + col("audio_silent") + col("audio_clipped") +
        col("video_black") + col("video_static") + col("img_dark") +
        col("img_bright") > 0)
      .filter(col("doc_id").isin(admitted.toSeq: _*))
    assert(flagged.isEmpty, "a gate-failing doc was admitted")
  }

  test("replay storm: a full re-delivery is a counted no-op") {
    val root = freshRoot("replay")
    MediaIngest.ingestBatch(spark, arrivals, root)
    val metaAfterFirst = Artifact.readMeta(spark, root)
    val idsAfterFirst = storeIds(root)
    val again = MediaIngest.ingestBatch(spark, arrivals, root)
    assert(again.accepted === 0, s"replay must admit nothing: $again")
    assert(again.replayed > 0, "re-delivered admitted rows must count as replayed")
    // rejected rows short-circuit through the ledger under their
    // original buckets — the stats read like the first delivery
    assert(again.rejectedQuality >= 7 && again.rejectedDupStore >= 1 &&
      again.rejectedDupBatch >= 1, s"ledger buckets lost on replay: $again")
    assert(Artifact.readMeta(spark, root) === metaAfterFirst,
      "replay must not touch the store fingerprint")
    assert(storeIds(root) === idsAfterFirst)
  }

  test("conflict: an admitted id re-offered with new content is counted, not applied") {
    val root = freshRoot("conflict")
    MediaIngest.ingestBatch(spark, arrivals, root)
    // re-offer batch doc 0 with doc 10's payloads (different content)
    val conflict = graft.ext.Multimodal.withFakeAllMedia(
        docs.filter(col("doc_id") === 10))
      .select(lit(0L).as("doc_id"), col("img"), col("wav"), col("y4m"))
    val stats = MediaIngest.ingestBatch(spark, conflict, root)
    assert(stats.conflicting === 1 && stats.accepted === 0, s"got $stats")
    // the stored row for doc 0 is untouched (insert-only store)
    val dhash0 = MediaFeatures.features(spark, root)
      .filter(col("doc_id") === 0).select(col("dhash")).as[Long].head()
    val expected = MediaFeatures.features(spark,
        MediaFeatures.ensure(spark, docs, "target/mediaingestspec/fullref"))
      .filter(col("doc_id") === 0).select(col("dhash")).as[Long].head()
    assert(dhash0 === expected)
  }

  test("id-ordered batch split equals one batch (first-wins = min-id here)") {
    val rootOne = freshRoot("split-one")
    MediaIngest.ingestBatch(spark, arrivals, rootOne)
    val rootTwo = freshRoot("split-two")
    // real docs first, plants second — the split an ID-ORDERED spool
    // produces across two micro-batches. Cross-batch admission is
    // first-wins (the MediaIngest scaladoc), which equals the global
    // min-id rule exactly when earlier batches carry the smaller ids —
    // this ordering; a descending-id split of same-class docs would
    // legitimately admit the larger id instead (no fixture doc pair
    // can demonstrate that below the 327,680-id class-collision bound)
    MediaIngest.ingestBatch(spark,
      arrivals.filter(col("doc_id") < MediaQuality.PlantBase), rootTwo)
    MediaIngest.ingestBatch(spark,
      arrivals.filter(col("doc_id") >= MediaQuality.PlantBase), rootTwo)
    assert(storeIds(rootTwo) === storeIds(rootOne))
  }

  test("oversized batch: tier joins stay unpinned — no driver-broadcast of batch keys") {
    // burst safety (the MediaFeatures.append rule applied to the tier
    // joins): ingestBatch must not HINT batch-derived frames to the
    // broadcast path — AQE may still pick broadcast for slim batches
    // at runtime, but the LOGICAL plan carries no ResolvedHint, so a
    // backfill-sized batch degrades to a shuffle join instead of a
    // driver OOM. Pinned structurally: a batch far above the session
    // broadcast threshold plans its store-tier join WITHOUT a
    // broadcast hint surviving into the analyzed plan.
    val root = freshRoot("burst")
    val stats = MediaIngest.ingestBatch(spark, arrivals, root)
    assert(stats.accepted > 0)
    // source-level check: the admission code path contains no
    // broadcast() call on batch-derived frames (the store side and
    // ledger side are corpus-bounded and also unpinned); guard the
    // invariant by scanning the one seam that builds the tier joins
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/stream/MediaIngest.scala")))
    val body = src.substring(src.indexOf("def ingestBatch"),
      src.indexOf("def removeDocs"))
    assert(!body.contains("broadcast("),
      "ingestBatch must leave join-strategy choice to AQE (burst safety)")
  }

  test("removal invalidates the ledger: a rejected near-dup re-offers once its match leaves") {
    val root = freshRoot("removal")
    MediaIngest.ingestBatch(spark, arrivals, root)
    val reRenders = MediaDedup
      .triModalReRenders(docs, 419, 2, MediaIngest.ReRenderOffset)
      .localCheckpoint()
    // pick a re-render arrival that passes the quality gate (its fate
    // is then decided purely by the dedup screen)
    val ok = MediaQuality.qualityFlags(MediaFeatures.decodeMedia(reRenders))
      .filter(col("undecodable") + col("audio_silent") + col("audio_clipped") +
        col("video_black") + col("video_static") + col("img_dark") +
        col("img_bright") === 0)
      .select(col("doc_id")).as[Long].collect()
    assert(ok.nonEmpty, "need a gate-passing re-render plant")
    val arrival = ok.min
    val source = arrival - MediaIngest.ReRenderOffset
    val one = reRenders.filter(col("doc_id") === arrival)
    // before removal the re-offer short-circuits in the ledger
    val pre = MediaIngest.ingestBatch(spark, one, root)
    assert(pre.accepted === 0 &&
      pre.rejectedDupStore + pre.rejectedDupBatch === 1, s"got $pre")
    // remove the matched source — the ledger drops with it, so the
    // cached rejection is no longer implied and the re-offer re-gates
    MediaIngest.removeDocs(spark, Seq(source).toDF("doc_id"), root)
    val post = MediaIngest.ingestBatch(spark, one, root)
    assert(post.accepted === 1,
      s"rejection must be re-evaluated after its match left: $post")
  }

  test("a root left mid-mutation fails loud, and re-ensure recovers it") {
    val root = freshRoot("crash")
    MediaIngest.ingestBatch(spark, arrivals, root)
    // simulate a crash inside an append's mutation window
    Artifact.beginMutation(spark, root)
    val e = intercept[IllegalStateException] {
      MediaIngest.ingestBatch(spark, arrivals, root)
    }
    assert(e.getMessage.contains("unfinished"),
      s"pending mutation must fail loud: ${e.getMessage}")
    // the lifecycle recovery path: re-ensure rebuilds to the seed state
    // (ensure distrusts a pending artifact), after which ingestion
    // replays idempotently
    MediaFeatures.ensure(spark, seed, root)
    val stats = MediaIngest.ingestBatch(spark, arrivals, root)
    assert(stats.accepted > 0, s"post-recovery replay must re-admit: $stats")
  }

  test("streaming front end: checkpointed AvailableNow delivery, exactly once") {
    val root = freshRoot("stream")
    val spool = "target/mediaingestspec/spool"
    deleteRecursively(spool)
    arrivals.write.parquet(spool)
    val ckpt = "target/mediaingestspec/ckpt"
    deleteRecursively(ckpt)
    var batches = List.empty[MediaIngest.MediaIngestStats]
    val q = MediaIngest.start(spark,
      FileSourceConfig(spool, "parquet", arrivals.schema), ckpt, root,
      onBatch = (_, s) => batches ::= s)
    q.awaitTermination()
    assert(batches.nonEmpty && batches.map(_.accepted).sum > 0)
    val idsAfterStream = storeIds(root)
    // same checkpoint: nothing new arrives, the query drains zero rows
    val q2 = MediaIngest.start(spark,
      FileSourceConfig(spool, "parquet", arrivals.schema), ckpt, root)
    q2.awaitTermination()
    // fresh checkpoint: everything re-delivers and no-ops (the
    // registered query's replay-storm shape)
    val ckpt2 = "target/mediaingestspec/ckpt2"
    deleteRecursively(ckpt2)
    var replay = List.empty[MediaIngest.MediaIngestStats]
    val q3 = MediaIngest.start(spark,
      FileSourceConfig(spool, "parquet", arrivals.schema), ckpt2, root,
      onBatch = (_, s) => replay ::= s)
    q3.awaitTermination()
    assert(replay.map(_.accepted).sum === 0)
    assert(storeIds(root) === idsAfterStream)
  }
}
