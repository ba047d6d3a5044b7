package graft.stream

import graft.SparkSuite
import graft.ext.{Artifact, Dedup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class IncrementalIngestSpec extends SparkSuite {
  import spark.implicits._

  private val root = "target/ingestspec/root"

  private val seedDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "spark engines shuffle partitions across the cluster with hash exchange"),
    (3L, "completely different words nothing shared here at all whatsoever truly")
  )

  // Batch 1: 11 = near-dup of seed 1, 12/13 = within-batch dups of each
  // other, 14 = unique.
  private val batch1 = Seq(
    (11L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
    (12L, "distributed query planners push filter predicates into columnar scans"),
    (13L, "distributed query planners push filter predicates into columnar scans"),
    (14L, "minhash signatures compress shingle sets into fixed width sketches")
  )

  // Batch 2: 21 = near-dup of batch-1 survivor 12, 22 = unique,
  // 1 replayed verbatim from the seed, 23 = id conflict with seed 3.
  private val batch2 = Seq(
    (21L, "distributed query planners push filter predicates into columnar scans early"),
    (22L, "watermarks bound event time state for streaming session windows"),
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (3L, "this text is not what doc three said before which is a conflict")
  )

  private def freshRoot(): Unit = deleteRecursively("target/ingestspec")

  private def corpusIds(): Set[Long] =
    IncrementalIngest.corpus(spark, root).select("doc_id").as[Long].collect().toSet

  test("init seeds corpus + band index; re-init never wipes ingested state") {
    freshRoot()
    IncrementalIngest.init(spark, seedDocs.toDF("doc_id", "text"), root)
    assert(corpusIds() == Set(1L, 2L, 3L))
    val s1 = IncrementalIngest.ingestBatch(spark, batch1.toDF("doc_id", "text"), root)
    assert(s1.accepted > 0)
    val metaAfter = Artifact.readMeta(spark, root)
    IncrementalIngest.init(spark, seedDocs.toDF("doc_id", "text"), root)
    assert(Artifact.readMeta(spark, root) == metaAfter,
      "re-init with same params must be a no-op on an absorbed root")
    assert(corpusIds().contains(14L))
    // changed parameters would invalidate every stored signature: init
    // must fail fast, never silently wipe an absorbed store
    val e = intercept[IllegalStateException] {
      IncrementalIngest.init(spark, seedDocs.toDF("doc_id", "text"), root, k = 16, bands = 4)
    }
    assert(e.getMessage.contains("different parameters"))
    assert(corpusIds().contains(14L), "failed init must leave the store untouched")
    // a root left mid-mutation is directed to recover(), not re-seeded over
    Artifact.beginMutation(spark, root)
    val e2 = intercept[IllegalStateException] {
      IncrementalIngest.init(spark, seedDocs.toDF("doc_id", "text"), root)
    }
    assert(e2.getMessage.contains("recover"))
    Artifact.endMutation(spark, root)
  }

  test("batch admission: near-dups rejected vs corpus and within batch, stats account for every row") {
    freshRoot()
    IncrementalIngest.init(spark, seedDocs.toDF("doc_id", "text"), root)
    val s = IncrementalIngest.ingestBatch(spark, batch1.toDF("doc_id", "text"), root)
    assert(s == IncrementalIngest.IngestStats(
      batchRows = 4, replayed = 0, conflicting = 0,
      rejectedVsCorpus = 1,      // 11 ~ seed 1
      rejectedWithinBatch = 1,   // 13 loses to sibling 12
      accepted = 2))             // 12, 14
    assert(corpusIds() == Set(1L, 2L, 3L, 12L, 14L))
  }

  test("second batch: replay skipped, id conflict counted not silently dropped, dup-of-survivor rejected") {
    freshRoot()
    IncrementalIngest.init(spark, seedDocs.toDF("doc_id", "text"), root)
    IncrementalIngest.ingestBatch(spark, batch1.toDF("doc_id", "text"), root)
    val s = IncrementalIngest.ingestBatch(spark, batch2.toDF("doc_id", "text"), root)
    assert(s == IncrementalIngest.IngestStats(
      batchRows = 4, replayed = 1, conflicting = 1,
      rejectedVsCorpus = 1,      // 21 ~ accepted 12
      rejectedWithinBatch = 0,
      accepted = 1))             // 22
    assert(corpusIds() == Set(1L, 2L, 3L, 12L, 14L, 22L))
  }

  test("whole-batch replay is a no-op: fingerprint line and corpus unchanged") {
    freshRoot()
    IncrementalIngest.init(spark, seedDocs.toDF("doc_id", "text"), root)
    IncrementalIngest.ingestBatch(spark, batch1.toDF("doc_id", "text"), root)
    val meta = Artifact.readMeta(spark, root)
    val s = IncrementalIngest.ingestBatch(spark, batch1.toDF("doc_id", "text"), root)
    assert(s.accepted == 0 && s.replayed + s.rejectedVsCorpus + s.rejectedWithinBatch > 0)
    assert(Artifact.readMeta(spark, root) == meta)
  }

  test("folded band index is fingerprint-identical to a fresh build over the final corpus") {
    freshRoot()
    IncrementalIngest.init(spark, seedDocs.toDF("doc_id", "text"), root)
    IncrementalIngest.ingestBatch(spark, batch1.toDF("doc_id", "text"), root)
    IncrementalIngest.ingestBatch(spark, batch2.toDF("doc_id", "text"), root)
    val c = IncrementalIngest.corpus(spark, root)
    val expected = s"bandindex v3 k=32 bands=8 " +
      s"fp=${Artifact.fingerprint(c, col("doc_id"), col("text"))}"
    assert(Artifact.readMeta(spark, s"$root/bandindex").contains(expected),
      "appends must leave the index metadata equal to a fresh full build's")
    // and a fresh build elsewhere answers probes identically
    val freshDir = "target/ingestspec/freshband"
    Dedup.ensureBandIndex(spark, c, freshDir)
    val probe = Seq((91L, "watermarks bound event time state for streaming session windows too"))
      .toDF("doc_id", "text")
    def answers(d: String) =
      Dedup.incrementalPairs(spark, probe, c, d)
        .as[(Long, Long, Double)].collect().toSet
    assert(answers(s"$root/bandindex") == answers(freshDir))
    assert(answers(freshDir).map(_._2) == Set(22L))
  }

  test("crash mid-mutation: ingest refuses, recover() restores consistency from the corpus store") {
    freshRoot()
    IncrementalIngest.init(spark, seedDocs.toDF("doc_id", "text"), root)
    IncrementalIngest.ingestBatch(spark, batch1.toDF("doc_id", "text"), root)
    // simulate a crash window: root marked mid-mutation, inner index too
    Artifact.beginMutation(spark, root)
    Artifact.beginMutation(spark, s"$root/bandindex")
    val e = intercept[IllegalStateException] {
      IncrementalIngest.ingestBatch(spark, batch2.toDF("doc_id", "text"), root)
    }
    assert(e.getMessage.contains("unfinished"))
    IncrementalIngest.recover(spark, root)
    val s = IncrementalIngest.ingestBatch(spark, batch2.toDF("doc_id", "text"), root)
    assert(s.accepted == 1)
    assert(corpusIds() == Set(1L, 2L, 3L, 12L, 14L, 22L))
  }

  test("maintain compacts corpus + index files; content, metadata and admission unchanged") {
    freshRoot()
    IncrementalIngest.init(spark, seedDocs.toDF("doc_id", "text"), root)
    IncrementalIngest.ingestBatch(spark, batch1.toDF("doc_id", "text"), root)
    IncrementalIngest.ingestBatch(spark, batch2.toDF("doc_id", "text"), root)
    val before = IncrementalIngest.corpus(spark, root)
      .as[(Long, String)].collect().toSet
    val meta = Artifact.readMeta(spark, root)
    val (nBefore, nAfter) = IncrementalIngest.maintain(spark, root, maxFiles = 1)
    assert(nBefore > nAfter, s"compaction must shrink the file count: $nBefore -> $nAfter")
    assert(Artifact.readMeta(spark, root) == meta)
    assert(IncrementalIngest.corpus(spark, root)
      .as[(Long, String)].collect().toSet == before)
    // a replayed batch after compaction is still a counted no-op
    val s = IncrementalIngest.ingestBatch(spark, batch2.toDF("doc_id", "text"), root)
    assert(s.accepted == 0)
  }

  test("rejection ledger: replayed batch reports first-delivery stats without re-running the gate") {
    freshRoot()
    IncrementalIngest.init(spark, seedDocs.toDF("doc_id", "text"), root)
    val first = IncrementalIngest.ingestBatch(spark, batch1.toDF("doc_id", "text"), root)
    // the ledger now holds the gate's decisions for 11 (vs corpus) and
    // 13 (vs sibling 12); a full replay must report IDENTICAL stats —
    // rejects short-circuit through the same membership join as
    // replayed admissions, so the LSH gate never re-runs
    val replay = IncrementalIngest.ingestBatch(spark, batch1.toDF("doc_id", "text"), root)
    assert(replay == first.copy(replayed = first.accepted, accepted = 0),
      s"replay stats must mirror first delivery: first=$first replay=$replay")
    // a conflicting re-offer of a REJECTED id (new text) is not a
    // ledger hit — it re-evaluates in full and can be admitted
    val s = IncrementalIngest.ingestBatch(spark,
      Seq((13L, "entirely new content far from every stored document indeed"))
        .toDF("doc_id", "text"), root)
    assert(s.accepted == 1L, s"rejected id with fresh content re-evaluates: $s")
  }

  test("removeDocs: doc gone from corpus + index, near-dups of it admitted again, id re-ingestable") {
    freshRoot()
    IncrementalIngest.init(spark, seedDocs.toDF("doc_id", "text"), root)
    IncrementalIngest.ingestBatch(spark, batch1.toDF("doc_id", "text"), root)  // accepts 12, 14
    assert(IncrementalIngest.removeDocs(spark, root, Seq(12L, 999L).toDF("doc_id")) == 1L,
      "only ids actually in the corpus count as removed")
    assert(corpusIds() == Set(1L, 2L, 3L, 14L))
    // fingerprints were adjusted arithmetically: both the root line and
    // the band index line equal a fresh fingerprint over what remains
    val c = IncrementalIngest.corpus(spark, root).localCheckpoint()
    val fp = Artifact.fingerprint(c, col("doc_id"), col("text"))
    assert(Artifact.readMeta(spark, root).contains(s"ingest v1 k=32 bands=8 fp=$fp"))
    assert(Artifact.readMeta(spark, s"$root/bandindex")
      .contains(s"bandindex v3 k=32 bands=8 fp=$fp"))
    // 21 is a near-dup of the REMOVED 12 — it must now be admitted
    val s = IncrementalIngest.ingestBatch(spark, batch2.toDF("doc_id", "text"), root)
    assert(s.rejectedVsCorpus == 0 && s.accepted == 2, s"near-dup of a removed doc must pass: $s")
    assert(corpusIds() == Set(1L, 2L, 3L, 14L, 21L, 22L))
    // and the removed id itself is free again
    val s2 = IncrementalIngest.ingestBatch(spark,
      Seq((12L, "entirely new content for a recycled identifier slot")).toDF("doc_id", "text"), root)
    assert(s2.accepted == 1)
  }

  test("removeDocs + maintain: tombstones compacted away physically, behavior unchanged") {
    freshRoot()
    IncrementalIngest.init(spark, seedDocs.toDF("doc_id", "text"), root)
    IncrementalIngest.ingestBatch(spark, batch1.toDF("doc_id", "text"), root)
    IncrementalIngest.removeDocs(spark, root, Seq(12L).toDF("doc_id"))
    assert(Dedup.loadTombstones(spark, s"$root/bandindex").count() == 1)
    IncrementalIngest.maintain(spark, root, maxFiles = 1)
    assert(Dedup.loadTombstones(spark, s"$root/bandindex").count() == 0,
      "compaction must drop masked rows and clear the tombstone set")
    assert(spark.read.parquet(s"$root/bandindex/bands")
      .filter(col("doc_id") === 12L).isEmpty,
      "removed doc's band rows must be physically gone after compaction")
    // post-compaction admission still equals pre-compaction semantics
    val s = IncrementalIngest.ingestBatch(spark, batch2.toDF("doc_id", "text"), root)
    assert(s.rejectedVsCorpus == 0 && s.accepted == 2)
  }

  test("ingest -> export integration: syncShards keeps the training shards equal to the corpus") {
    import graft.ext.TrainingSet
    freshRoot()
    val exp = "target/ingestspec/export"
    val ref = "target/ingestspec/export_ref"
    def withLang(df: org.apache.spark.sql.DataFrame) = df.withColumn("lang", lit("en"))
    IncrementalIngest.init(spark, seedDocs.toDF("doc_id", "text"), root)
    TrainingSet.writeShards(spark, withLang(IncrementalIngest.corpus(spark, root)), exp, nShards = 2)
    // nightly loop: ingest (dedup admission) then sync the export
    IncrementalIngest.ingestBatch(spark, batch1.toDF("doc_id", "text"), root)
    TrainingSet.syncShards(spark, withLang(IncrementalIngest.corpus(spark, root)), exp)
    IncrementalIngest.ingestBatch(spark, batch2.toDF("doc_id", "text"), root)
    TrainingSet.syncShards(spark, withLang(IncrementalIngest.corpus(spark, root)), exp)
    // the synced export equals a fresh export over the final corpus —
    // i.e. only ADMITTED documents ship to trainers, rejected near-dups
    // and replays never reach the training set
    TrainingSet.writeShards(spark, withLang(IncrementalIngest.corpus(spark, root)), ref, nShards = 2)
    def manifest(d: String) = TrainingSet.shardManifest(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(manifest(exp) == manifest(ref))
    // removal flows through both stores: corpus content captured first
    val removedContent = withLang(IncrementalIngest.corpus(spark, root))
      .filter(col("doc_id") === 12L).localCheckpoint()
    IncrementalIngest.removeDocs(spark, root, Seq(12L).toDF("doc_id"))
    TrainingSet.removeFromShards(spark, removedContent, exp)
    assert(!TrainingSet.readShard(spark, exp, 0)
      .unionByName(TrainingSet.readShard(spark, exp, 1))
      .select("doc_id").as[Long].collect().toSet.contains(12L))
    deleteRecursively(ref)
    TrainingSet.writeShards(spark, withLang(IncrementalIngest.corpus(spark, root)), ref, nShards = 2)
    assert(manifest(exp) == manifest(ref),
      "post-removal export ledger equals a fresh export over the shrunken corpus")
  }

  test("crash between compaction's renames: corpus aside in corpus.old, recover() restores it") {
    freshRoot()
    IncrementalIngest.init(spark, seedDocs.toDF("doc_id", "text"), root)
    IncrementalIngest.ingestBatch(spark, batch1.toDF("doc_id", "text"), root)
    val expected = corpusIds()
    // simulate the worst compaction crash window: live corpus renamed
    // aside, compacted set not yet moved in, marker still up
    val fs = new java.io.File(root)
    assert(new java.io.File(fs, "corpus").renameTo(new java.io.File(fs, "corpus.old")))
    Artifact.beginMutation(spark, root)
    intercept[IllegalStateException] {
      IncrementalIngest.ingestBatch(spark, batch2.toDF("doc_id", "text"), root)
    }
    IncrementalIngest.recover(spark, root)
    assert(corpusIds() == expected, "the swap must roll back with no data loss")
    assert(IncrementalIngest.ingestBatch(spark, batch2.toDF("doc_id", "text"), root).accepted == 1)
  }

  test("streamed ingestion through a checkpoint equals the batch path, replay included") {
    freshRoot()
    IncrementalIngest.init(spark, seedDocs.toDF("doc_id", "text"), root)
    val ckpt = "target/ingestspec/ckpt"
    val stats = scala.collection.mutable.ArrayBuffer.empty[IncrementalIngest.IngestStats]
    implicit val sqlCtx = spark.sqlContext
    // one stream across drains: offsets continue, so each drain under the
    // SAME checkpoint processes exactly the newly-added data
    val input = MemoryStream[(Long, String)]
    def drain(data: Seq[(Long, String)]): Unit = {
      input.addData(data: _*)
      val q = IncrementalIngest.start(spark,
        DirectSource(input.toDF().toDF("doc_id", "text")), ckpt, root,
        onBatch = (_, s) => stats.synchronized { stats += s })
      q.awaitTermination()
    }
    drain(batch1)
    drain(batch2)
    assert(corpusIds() == Set(1L, 2L, 3L, 12L, 14L, 22L))
    assert(stats.map(_.accepted).sum == 3)
    // redelivery from a wiped checkpoint (at-least-once transport): the
    // whole stream content comes back as one micro-batch; admission makes
    // ingestion exactly-once — nothing new is accepted, corpus unchanged
    deleteRecursively(ckpt)
    val nBefore = stats.size
    drain(Nil)
    val redelivered = stats.drop(nBefore)
    // MemoryStream purges blocks older than the committed watermark, so
    // how much comes back is transport detail; what matters is that
    // whatever was redelivered is a counted no-op.
    assert(redelivered.map(_.batchRows).sum >= 4, "the tail must be redelivered")
    assert(redelivered.forall(_.accepted == 0), "nothing redelivered may be re-accepted")
    assert(corpusIds() == Set(1L, 2L, 3L, 12L, 14L, 22L))
  }
}
