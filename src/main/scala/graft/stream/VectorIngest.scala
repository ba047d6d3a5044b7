package graft.stream

import graft.ext.{AnnIndex, Artifact}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The [[IncrementalIngest]] analog for the vector side: micro-batches
  * of `(vec_id, embedding, label)` rows admitted exactly once and folded
  * into a persisted, DRIFT-GATED IVF index
  * ([[graft.ext.AnnIndex.appendIvfOrRebuild]]) — in-distribution batches
  * append in O(batch) with the quantizer fixed; a batch whose
  * occupancy/quantization-error profile trips the drift gate re-trains
  * the quantizer over the union corpus instead of silently degrading
  * recall. The corpus store (same staged-rename commit as the document
  * ingest, [[CorpusStore]]) is what makes that union rebuild possible at
  * all — and is the source of truth [[recover]] rebuilds from.
  *
  * State at rest, under one root:
  *  - `corpus/batch=<fp>/` — admitted `(vec_id, embedding, label)` rows.
  *  - `ivf/` — the [[graft.ext.AnnIndex.ensureIvf]] artifact over
  *    exactly the corpus store's contents.
  *  - `index_meta.txt` — `vecingest v1 nCells=.. fp=..`, additive.
  */
object VectorIngest {

  /** Per-batch outcome: admission counts plus the measured drift and
    * whether it tripped a quantizer re-train.
    */
  final case class VectorIngestStats(
      batchRows: Long,
      replayed: Long,
      conflicting: Long,
      accepted: Long,
      drift: Option[AnnIndex.DriftStats],
      rebuilt: Boolean)

  private val MetaRe = """vecingest v1 nCells=(\d+) fp=.*""".r
  private def kindPrefix = "vecingest v1 "
  private def indexPath(root: String) = s"$root/ivf"
  private val cols = Seq("vec_id", "embedding", "label")

  private def nCellsOf(spark: SparkSession, root: String): Int =
    Artifact.readMeta(spark, root) match {
      case Some(MetaRe(n)) => n.toInt
      case other => throw new IllegalStateException(s"no vector ingest root at $root: $other")
    }

  private def fp(df: DataFrame): String =
    Artifact.fingerprint(df, col("vec_id"), col("embedding"), col("label"))

  /** The admitted vector corpus so far. */
  def corpus(spark: SparkSession, root: String): DataFrame =
    CorpusStore.read(spark, root, cols)

  /** Seed a vector ingest root (same contract as
    * [[IncrementalIngest.init]]: idempotent on an absorbed root with
    * matching parameters, fail-fast on a parameter mismatch or a root
    * left mid-mutation — a stateful store is never wiped silently).
    */
  def init(spark: SparkSession, seed: DataFrame, root: String,
           nCells: Int = 16): String = {
    val existing = Artifact.readMeta(spark, root)
    val paramPrefix = s"${kindPrefix}nCells=$nCells fp="
    if (existing.exists(_.startsWith(kindPrefix))) {
      if (Artifact.hasPendingMutation(spark, root))
        throw new IllegalStateException(
          s"vector ingest root at $root was left mid-mutation — run recover() first")
      if (!existing.exists(_.startsWith(paramPrefix)))
        throw new IllegalStateException(
          s"vector ingest root at $root exists with different parameters " +
            s"(${existing.get}) — delete it explicitly to re-seed with nCells=$nCells")
    } else {
      val s = seed.select(cols.map(col): _*)
      require(!s.isEmpty, "vector ingest seed must be non-empty")
      CorpusStore.fs(spark, root).delete(new Path(root), true)
      CorpusStore.writeSeed(spark, root, s)
      AnnIndex.ensureIvf(spark, corpus(spark, root), indexPath(root), nCells)
      Artifact.endMutation(spark, root)
      Artifact.writeMeta(spark, root, s"$paramPrefix${fp(s)}")
    }
    root
  }

  /** Admit one batch: exactly-once by vec_id (re-deliveries skipped;
    * content conflicts — same id, different embedding/label — counted
    * loudly and skipped, keeping the store insert-only so the index's
    * own fail-fast append guard never fires on stream replays), then the
    * drift-gated index append: within thresholds the batch folds in with
    * the quantizer fixed; beyond them the index re-trains over the union
    * corpus. Either way the corpus store and the index stay in lockstep
    * under the root's pending marker.
    */
  def ingestBatch(spark: SparkSession, batch: DataFrame, root: String,
                  maxQerrRatio: Double = 1.5,
                  maxOccupancyTv: Double = 0.5): VectorIngestStats = {
    Artifact.requireKind(spark, root, kindPrefix)
    val nCells = nCellsOf(spark, root)
    val corpusDf = corpus(spark, root)

    val b = batch.select(cols.map(col): _*)
      .dropDuplicates("vec_id").localCheckpoint()
    val batchRows = b.count()

    val seen = corpusDf
      .join(broadcast(b.select(col("vec_id"))), Seq("vec_id"), "left_semi")
      .select(col("vec_id"), xxhash64(col("embedding"), col("label")).as("corpus_h"))
    val marked = b
      .withColumn("batch_h", xxhash64(col("embedding"), col("label")))
      .join(broadcast(seen), Seq("vec_id"), "left")
      .localCheckpoint()
    val replayed = marked.filter(col("corpus_h") === col("batch_h")).count()
    val conflicting = marked.filter(
      col("corpus_h").isNotNull && col("corpus_h") =!= col("batch_h")).count()
    val fresh = marked.filter(col("corpus_h").isNull)
      .select(cols.map(col): _*).localCheckpoint()
    val freshCount = batchRows - replayed - conflicting

    if (freshCount == 0L)
      return VectorIngestStats(batchRows, replayed, conflicting, 0L, None, rebuilt = false)

    // refuse re-insertion of tombstoned (removed-but-not-yet-compacted)
    // ids BEFORE any mutation starts, so the expected refusal leaves the
    // root clean; the index's own append guard is the backstop
    val tombstoned = AnnIndex.loadTombstones(spark, indexPath(root))
      .join(broadcast(fresh.select(col("vec_id"))), Seq("vec_id"), "left_semi")
      .take(5).map(_.getLong(0))
    if (tombstoned.nonEmpty)
      throw new IllegalStateException(
        s"ids ${tombstoned.mkString(", ")} were removed from this root — " +
          "run maintain() to compact the index before re-inserting them")

    val batchFp = fp(fresh)
    CorpusStore.stage(spark, root, fresh)
    Artifact.beginMutation(spark, root)
    val drift = AnnIndex.appendIvfOrRebuild(spark, fresh,
      corpusDf.unionByName(fresh), indexPath(root), nCells,
      maxQerrRatio, maxOccupancyTv)
    val rebuilt = drift.drifted(maxQerrRatio, maxOccupancyTv)
    CorpusStore.commitStaged(spark, root, batchFp)
    Artifact.addToFingerprint(spark, root, kindPrefix, batchFp)
    Artifact.endMutation(spark, root)
    VectorIngestStats(batchRows, replayed, conflicting, freshCount, Some(drift), rebuilt)
  }

  /** Delete vectors from the ingest root — the
    * [[IncrementalIngest.removeDocs]] analog: only corpus batch
    * directories containing removed ids are rewritten (loss-free swap),
    * the IVF index masks the ids via tombstones
    * ([[graft.ext.AnnIndex.removeVecs]] — physically dropped at the
    * next [[maintain]], and re-inserting a removed id is refused until
    * then), and both fingerprints are adjusted arithmetically so later
    * ensures serve the shrunken corpus. Returns the number of vectors
    * removed.
    */
  def removeVecs(spark: SparkSession, root: String, ids: DataFrame): Long = {
    Artifact.requireKind(spark, root, kindPrefix)
    val idsDf = ids.select(col("vec_id")).distinct().localCheckpoint()
    val removed = CorpusStore.readWithBatch(spark, root, cols)
      .join(broadcast(idsDf), Seq("vec_id"), "left_semi")
      .localCheckpoint()
    val n = removed.count()
    if (n == 0L) return 0L
    Artifact.beginMutation(spark, root)
    AnnIndex.removeVecs(spark, removed.select(cols.map(col): _*), indexPath(root))
    val touched = removed.select(col("batch")).distinct()
      .collect().map(_.getString(0))
    touched.foreach { b =>
      val remaining = spark.read.parquet(s"$root/corpus/batch=$b")
        .join(broadcast(idsDf), Seq("vec_id"), "left_anti")
      CorpusStore.rewriteBatchDir(spark, root, b, remaining)
    }
    Artifact.subtractFromFingerprint(spark, root, kindPrefix, fp(removed))
    Artifact.endMutation(spark, root)
    n
  }

  /** Rebuild derived state from the corpus store after a crash left the
    * root mid-mutation (same contract as [[IncrementalIngest.recover]]:
    * committed batch directories are authoritative, staging is
    * discarded, the interrupted batch replays through admission).
    */
  def recover(spark: SparkSession, root: String): Unit = {
    val nCells = nCellsOf(spark, root)
    CorpusStore.recoverLayout(spark, root)
    val c = corpus(spark, root).localCheckpoint()
    AnnIndex.ensureIvf(spark, c, indexPath(root), nCells)
    Artifact.writeMeta(spark, root, s"${kindPrefix}nCells=$nCells fp=${fp(c)}")
    Artifact.endMutation(spark, root)
  }

  /** Housekeeping: compact the IVF assignments' accumulated per-batch
    * file sets and the corpus store when fragmented past `maxFiles`.
    */
  def maintain(spark: SparkSession, root: String, maxFiles: Int = 64): (Int, Int) = {
    Artifact.requireKind(spark, root, kindPrefix)
    var (before, after) = (0, 0)
    if (CorpusStore.parquetFiles(spark, s"${indexPath(root)}/assignments") > maxFiles) {
      val (b, a) = AnnIndex.compact(spark, indexPath(root))
      before += b; after += a
    }
    if (CorpusStore.corpusFileCount(spark, root) > maxFiles) {
      val (b, a) = CorpusStore.compact(spark, root, cols)
      before += b; after += a
    }
    (before, after)
  }

  /** Streaming front end: any [[SourceConfig]] of
    * `(vec_id, embedding, label)` rows → [[ingestBatch]] per micro-batch
    * under a checkpoint; at-least-once delivery becomes exactly-once
    * ingestion through admission, as on the document side.
    */
  def start(spark: SparkSession, source: SourceConfig, checkpointDir: String,
            root: String, maxQerrRatio: Double = 1.5, maxOccupancyTv: Double = 0.5,
            onBatch: (Long, VectorIngestStats) => Unit = (_, _) => ()): StreamingQuery =
    StreamSources.open(spark, source)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty)
          onBatch(id, ingestBatch(spark, batch, root, maxQerrRatio, maxOccupancyTv))
      }
      .start()
}
