package graft.stream

import graft.ext.{Artifact, MediaDedup, MediaFeatures, MediaQuality, Multimodal}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streamed media-feature ingestion — the media analog of
  * [[CuratedIngest]], closing the composition gap between the media
  * family and the streaming family: tri-modal payload arrivals
  * `(doc_id, img, wav, y4m)` land per micro-batch, each batch is
  * admitted exactly once, DECODED ONCE (the decode-once rule applies
  * at the stream boundary too), gated by the
  * [[graft.ext.MediaQuality]] predicates, near-dup-screened against
  * the persisted [[graft.ext.MediaFeatures]] store and within the
  * batch, and survivors are appended to the store in O(batch)
  * ([[graft.ext.MediaFeatures.appendDecoded]]) — so every downstream
  * media serve picks up tonight's arrivals without a rebuild.
  *
  * Admission order is deliberate and mirrors the text pipeline:
  * quality BEFORE dedup (a degenerate clip must not reject its future
  * healthy re-render and then be dropped itself — the
  * [[CuratedIngest]] rationale).
  *
  * Dedup tiers (all plain equi joins — the decon_media lesson: an OR
  * of join conditions plans as a BroadcastNestedLoopJoin):
  *  - exact document dup: the `(img, wav, y4m)` payload-hash triple
  *    matches a stored doc (a re-delivered document under a new id);
  *  - image re-render: identical wav+y4m payload hashes AND the image
  *    dHash within Hamming `maxHamming` of the stored doc's (a
  *    watermarked/re-rendered image inside an otherwise identical
  *    document);
  *  - video re-encode: identical img+wav payload hashes AND an
  *    identical decoded per-frame luma-sum vector (same frames under
  *    a rewritten Y4M parameter line — the `dedup_video_fp` rule);
  *  - audio re-encode: identical img+y4m payload hashes AND an
  *    identical decoded 64-frame window-energy vector (same PCM under
  *    a rewritten container header — the `dedup_audio_fp` rule).
  *  One modality may be re-encoded per arrival; a doc re-encoding TWO
  *  modalities at once is new content by this screen's definition
  *  (each tier anchors on the two untouched payload hashes, keeping
  *  every join an equi join — no cross-modality OR).
  *  Within a batch the same tiers run against smaller-id siblings
  *  (exact groups keep the min id; perceptual/re-encode pairs drop
  *  the larger id). ACROSS micro-batches admission is FIRST-WINS, not
  *  min-id: the store tier rejects any later arrival that matches an
  *  already-admitted doc, whichever id is smaller — the store is
  *  insert-only by contract, so an earlier-admitted larger id is
  *  never displaced. The min-id rule holds only within one batch.
  *  The `stream_media_corpus` oracle replays a global min-per-class
  *  rule, which coincides with first-wins under two preconditions it
  *  depends on: (a) the fixture drains as a SINGLE batch
  *  (`Trigger.AvailableNow` with no `maxFilesPerTrigger` cap — a
  *  file-capped or Kafka source splitting same-class real docs across
  *  batches in descending-id order would diverge), and (b) no two
  *  REAL batch docs share a content class, true below doc_id
  *  ~327,680 (= lcm(65536, 10): the smallest gap between two
  *  `% 10 = 0` ids in one mod-65536 class) — far above every
  *  fixture's id range.
  *
  *  The re-encode tiers are ORACLE-NEUTRAL for real corpus docs: a
  *  natural tier-3/4 hit needs the wav (resp. y4m) payload hash equal,
  *  which under the generative formulas implies full mod-65536 (resp.
  *  mod-256 + decoded-vector) congruence... concretely, every natural
  *  hit of tiers 2-4 is already a tier-1 hit (wav-hash equality ⇒
  *  doc_id ≡ mod 65536 ⇒ the whole triple equal; img+y4m-hash equality
  *  ⇒ ≡ mod 256, and two distinct-mod-65536 clips' sample streams
  *  differ, so their window/frame SUM vectors differ — up to
  *  astronomically unlikely multi-window sum collisions, the same
  *  caveat class as the xxhash64-equality tiers), so the admitted
  *  REAL set replays with the tier-1 rule alone — only planted
  *  arrivals (ids above the real range, never admitted either way)
  *  exercise tiers 2-4.
  *
  * Exactly-once + replay storms: a re-delivered `(doc_id, payload)`
  * whose content hash matches the store short-circuits at the
  * membership probe; rejected arrivals short-circuit through the
  * rejection LEDGER (same contract as
  * [[IncrementalIngest.rejections]]: a pure cache of gate decisions,
  * valid while the store is insert-only — losing it costs
  * re-evaluation, never correctness). The replay path never touches
  * payload bytes: membership keys are `xxhash64` payload hashes
  * computed in-row, and the decode runs only over genuinely fresh
  * rows.
  *
  * Scale shape: per batch, ONE narrow scan of the slim feature store
  * (payload-hash columns only — never media bytes), one decode pass
  * over the fresh rows, equi joins keyed on payload hashes, and an
  * O(accepted) parquet append. The store is never rewritten.
  */
object MediaIngest {

  /** Per-batch admission outcome; `batchRows = replayed + conflicting
    * + rejectedQuality + rejectedDupStore + rejectedDupBatch +
    * accepted` by construction. `conflicting` rows re-use an admitted
    * doc_id with DIFFERENT payload content — skipped and counted,
    * never silently dropped (the store is insert-only).
    */
  final case class MediaIngestStats(
      batchRows: Long,
      replayed: Long,
      conflicting: Long,
      rejectedQuality: Long,
      rejectedDupStore: Long,
      rejectedDupBatch: Long,
      accepted: Long)

  // ---------------------------------------------------- fixture plants

  /** Plant id offsets — far above any fixture doc_id (the
    * [[graft.ext.MediaDedup.ReRenderOffset]] headroom discipline).
    */
  val QualityPlantBase: Long = MediaQuality.PlantBase // 40000000 + 1..6
  val UndecodableId = 45000001L
  val ExactDupOffset = 50000000L
  val ReRenderOffset = 60000000L
  val CloneOffset = 70000000L
  val VideoReEncodeOffset = 80000000L
  val AudioReEncodeOffset = 90000000L

  private def requireIdHeadroom(docs: DataFrame): Unit = {
    val mx = docs.agg(max(col("doc_id"))).head()
    require(mx.isNullAt(0) || mx.getLong(0) < QualityPlantBase,
      s"plant-id offset $QualityPlantBase must exceed max doc_id " +
        s"${mx.getLong(0)} — raise the offsets for this corpus")
  }

  /** Tonight's arrival set for the fixtures: the `doc_id % 10 = 0`
    * corpus slice as tri-modal payload rows, PLUS planted arrivals
    * that give every rejection path verified traffic:
    *  - the six [[MediaQuality.plantedArrivals]] degenerate payloads
    *    (quality gate) and one truncated-image payload (fail-closed
    *    `undecodable`);
    *  - exact re-deliveries of every `% 373 = 1` doc under new ids
    *    (document dup — store tier when the source is seed, batch tier
    *    when it arrives alongside its source);
    *  - tri-modal image re-renders of every `% 419 = 2` doc
    *    (perceptual tier);
    *  - tri-modal VIDEO re-encodes of every `% 431 = 3` doc and AUDIO
    *    re-encodes of every `% 433 = 4` doc (the re-encode tiers —
    *    identical decoded content under a rewritten container header
    *    in exactly one modality);
    *  - byte-identical clones of every `% 530 = 0` BATCH doc under new
    *    ids (within-batch exact tier).
    * Plant ids are strictly larger than all real ids, so plants can
    * never displace a real document from admission — the smaller-id
    * rule always keeps the real doc.
    */
  def fixtureArrivals(spark: SparkSession, docs: DataFrame): DataFrame = {
    requireIdHeadroom(docs)
    val batch = Multimodal.withFakeAllMedia(
      docs.filter(pmod(col("doc_id"), lit(10)) === 0))
    // rename-last (the lateral-column-alias rule)
    val exactDups = Multimodal.withFakeAllMedia(
        docs.filter(pmod(col("doc_id"), lit(373)) === 1))
      .select((col("doc_id") + lit(ExactDupOffset)).as("doc_id"),
        col("img"), col("wav"), col("y4m"))
    val reRenders = MediaDedup.triModalReRenders(docs, 419, 2, ReRenderOffset)
    val videoReEnc =
      MediaDedup.triModalVideoReEncodes(docs, 431, 3, VideoReEncodeOffset)
    val audioReEnc =
      MediaDedup.triModalAudioReEncodes(docs, 433, 4, AudioReEncodeOffset)
    val clones = Multimodal.withFakeAllMedia(
        docs.filter(pmod(col("doc_id"), lit(530)) === 0))
      .select((col("doc_id") + lit(CloneOffset)).as("doc_id"),
        col("img"), col("wav"), col("y4m"))
    val quality = MediaQuality.plantedArrivals(spark)
      .select(col("doc_id"), col("img"), col("wav"), col("y4m"))
    val undecodable = Multimodal.withFakeAllMedia(
        docs.filter(col("doc_id") === 1))
      .select(lit(UndecodableId).as("doc_id"),
        expr("substring(img, 1, 10)").as("img"), col("wav"), col("y4m"))
    batch.unionByName(exactDups).unionByName(reRenders)
      .unionByName(videoReEnc).unionByName(audioReEnc)
      .unionByName(clones).unionByName(quality).unionByName(undecodable)
  }

  // ------------------------------------------------------------ ledger

  private def rejectionsPath(dir: String) = s"$dir/rejections"

  private val RejectionsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("rej_h",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("kind",
      org.apache.spark.sql.types.StringType)))

  private def rejections(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(rejectionsPath(dir))
    if (CorpusStore.fs(spark, dir).exists(p))
      spark.read.schema(RejectionsSchema).parquet(rejectionsPath(dir))
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], RejectionsSchema)
  }

  /** Payload-level content hash, computable WITHOUT decoding — the
    * membership/ledger key, identical in-row formula on the batch side
    * and over the store's per-modality payload hashes.
    */
  private def contentHash(img: org.apache.spark.sql.Column,
                          wav: org.apache.spark.sql.Column,
                          y4m: org.apache.spark.sql.Column) =
    xxhash64(xxhash64(img), xxhash64(wav), xxhash64(y4m))

  // ---------------------------------------------------------- admission

  /** Admit one micro-batch of `(doc_id, img, wav, y4m)` rows. */
  def ingestBatch(spark: SparkSession, batch: DataFrame, dir: String,
                  maxHamming: Int = 3): MediaIngestStats = {
    Artifact.requireKind(spark, dir, MediaFeatures.MetaPrefix)
    val b = batch.select(col("doc_id"), col("img"), col("wav"), col("y4m"))
    // the REPLAY path's whole cost: payload hashes in-row (no decode),
    // one slim row per arrival. Duplicate doc_ids within a batch pick
    // ONE surviving row deterministically — min content hash — and
    // every downstream consumer (the ledger's hash pin AND the decode
    // input) derives from that same selection, so a replay of the
    // same batch re-computes identical hashes (a nondeterministic
    // dropDuplicates here could pin one sibling's hash while gating
    // the other's payload)
    val hashed = b.select(col("doc_id"),
        contentHash(col("img"), col("wav"), col("y4m")).as("batch_h"))
      .groupBy(col("doc_id")).agg(min(col("batch_h")).as("batch_h"))
      .localCheckpoint()
    val batchRows = hashed.count()
    val store = MediaFeatures.features(spark, dir)
    // one narrow read of the store (id + the three stored payload
    // hashes — media bytes never travel), semi-joined down to the
    // batch's ids; AQE picks the join strategy (no broadcast pin on a
    // caller-sized batch — the MediaFeatures.append rule)
    val seen = store
      .select(col("doc_id"),
        xxhash64(col("img_xx"), col("wav_xx"), col("y4m_xx")).as("corpus_h"))
      .join(hashed.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val rejSeen = rejections(spark, dir)
      .join(hashed.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .dropDuplicates("doc_id", "rej_h") // crash-replayed appends
      .withColumnRenamed("rej_h", "batch_h")
    val marked = hashed
      .join(seen, Seq("doc_id"), "left")
      .join(rejSeen, Seq("doc_id", "batch_h"), "left")
    // one aggregation job for all five admission counters — on a pure
    // replay this is the batch's ONLY action besides the hash pin
    val counters = marked.agg(
      sum(when(col("corpus_h") === col("batch_h"), 1L).otherwise(0L)),
      sum(when(col("corpus_h").isNotNull && col("corpus_h") =!= col("batch_h"),
        1L).otherwise(0L)),
      sum(when(col("corpus_h").isNull && col("kind") === "quality", 1L)
        .otherwise(0L)),
      sum(when(col("corpus_h").isNull && col("kind") === "dup_store", 1L)
        .otherwise(0L)),
      sum(when(col("corpus_h").isNull && col("kind") === "dup_batch", 1L)
        .otherwise(0L))).head()
    def cnt(i: Int): Long = Option(counters.get(i)).fold(0L)(_.asInstanceOf[Long])
    val (replayed, conflicting) = (cnt(0), cnt(1))
    val (ledgQ, ledgS, ledgB) = (cnt(2), cnt(3), cnt(4))
    val freshCount = batchRows - replayed - conflicting - ledgQ - ledgS - ledgB
    if (freshCount == 0L)
      return MediaIngestStats(batchRows, replayed, conflicting,
        ledgQ, ledgS, ledgB, 0L)

    // fresh rows: decode ONCE, everything downstream reads slim stats.
    // The semi join keys on (doc_id, batch_h) so the decoded row IS
    // the canonical (min-content-hash) selection the ledger pins —
    // identical-content siblings surviving it collapse to one row.
    // No broadcast hints anywhere in this batch's joins: the batch is
    // caller-sized (a backfill may arrive as one burst), so pinning
    // batch-derived frames to the driver's broadcast path grows the
    // driver with batch size — AQE broadcasts slim batches and
    // degrades oversized ones to a shuffle join instead of a driver
    // OOM (the MediaFeatures.append rule).
    val freshIds = marked
      .filter(col("corpus_h").isNull && col("kind").isNull)
      .select(col("doc_id"), col("batch_h")).localCheckpoint()
    val decoded = MediaFeatures.decodeMedia(
        b.withColumn("batch_h",
            contentHash(col("img"), col("wav"), col("y4m")))
          .join(freshIds, Seq("doc_id", "batch_h"), "left_semi")
          .dropDuplicates("doc_id")
          .drop("batch_h"))
      .localCheckpoint()

    // 1. quality gate (fail-closed: undecodable counts as a flag)
    val flags = MediaQuality.qualityFlags(decoded)
    val qualityRejects = flags.filter(
        col("undecodable") + col("audio_silent") + col("audio_clipped") +
          col("video_black") + col("video_static") + col("img_dark") +
          col("img_bright") > 0)
      .select(col("doc_id")).localCheckpoint()
    val nQuality = qualityRejects.count()
    val afterQuality = decoded
      .join(qualityRejects, Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // 2. dup screen vs the STORE: four equi hash joins (never an OR),
    // each tier anchored on the two UNTOUCHED payload hashes with its
    // re-encoded modality verified by decoded content
    val storeSlim = store.select(col("doc_id").as("s_id"),
      col("img_xx").as("s_img"), col("wav_xx").as("s_wav"),
      col("y4m_xx").as("s_y4m"), col("dhash").as("s_dhash"),
      col("frame_y").as("s_fy"), col("a_fp_windows").as("s_aw"))
    val batchKeys = afterQuality.select(col("doc_id"), col("img_xx"),
      col("wav_xx"), col("y4m_xx"), col("dhash"), col("frame_y"),
      col("a_fp_windows"))
    val tier1 = storeSlim.join(batchKeys,
        col("img_xx") === col("s_img") && col("wav_xx") === col("s_wav") &&
          col("y4m_xx") === col("s_y4m"))
      .select(col("doc_id"))
    val tier2 = storeSlim.join(batchKeys,
        col("wav_xx") === col("s_wav") && col("y4m_xx") === col("s_y4m") &&
          bit_count(col("dhash").bitwiseXOR(col("s_dhash"))) <= maxHamming)
      .select(col("doc_id"))
    val tier3 = storeSlim.join(batchKeys,
        col("img_xx") === col("s_img") && col("wav_xx") === col("s_wav") &&
          col("frame_y") === col("s_fy"))
      .select(col("doc_id"))
    val tier4 = storeSlim.join(batchKeys,
        col("img_xx") === col("s_img") && col("y4m_xx") === col("s_y4m") &&
          col("a_fp_windows") === col("s_aw"))
      .select(col("doc_id"))
    val dupStoreIds = tier1.unionByName(tier2).unionByName(tier3)
      .unionByName(tier4).distinct().localCheckpoint()
    val nDupStore = dupStoreIds.count()
    val afterStore = afterQuality
      .join(dupStoreIds, Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // 3. within the batch: exact-content groups keep the min id, then
    // the three re-render/re-encode pair tiers among the group reps
    // drop the larger id — the same tiers as the store screen, so
    // admission is batch-split-invariant
    val reps = afterStore
      .groupBy(col("img_xx"), col("wav_xx"), col("y4m_xx"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val repRows = afterStore
      .join(reps, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("img_xx"), col("wav_xx"), col("y4m_xx"),
        col("dhash"), col("frame_y"), col("a_fp_windows"))
      .localCheckpoint()
    def pairLosers(cond: org.apache.spark.sql.Column) =
      repRows.as("a").join(repRows.as("b"),
          col("a.doc_id") < col("b.doc_id") && cond)
        .select(col("b.doc_id").as("doc_id"))
    val batchLosers = pairLosers(
        col("a.wav_xx") === col("b.wav_xx") &&
          col("a.y4m_xx") === col("b.y4m_xx") &&
          bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))) <= maxHamming)
      .unionByName(pairLosers(
        col("a.img_xx") === col("b.img_xx") &&
          col("a.wav_xx") === col("b.wav_xx") &&
          col("a.frame_y") === col("b.frame_y")))
      .unionByName(pairLosers(
        col("a.img_xx") === col("b.img_xx") &&
          col("a.y4m_xx") === col("b.y4m_xx") &&
          col("a.a_fp_windows") === col("b.a_fp_windows")))
      .distinct()
    val acceptedIds = repRows.select(col("doc_id"))
      .join(batchLosers, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val accepted = decoded
      .join(acceptedIds, Seq("doc_id"), "left_semi")
    val nAccepted = acceptedIds.count()
    val nDupBatch = freshCount - nQuality - nDupStore - nAccepted

    if (nAccepted > 0L) MediaFeatures.appendDecoded(spark, accepted, dir)

    if (freshCount > nAccepted) {
      // best-effort by CONTRACT (the IncrementalIngest ledger rule):
      // the store append already committed; a failed ledger append
      // degrades to re-gating on replay, never to a wrong corpus
      val kinds = qualityRejects.withColumn("kind", lit("quality"))
        .unionByName(dupStoreIds.withColumn("kind", lit("dup_store")))
        .unionByName(afterStore.select(col("doc_id"))
          .join(acceptedIds, Seq("doc_id"), "left_anti")
          .withColumn("kind", lit("dup_batch")))
      try freshIds.join(kinds, Seq("doc_id"))
        .select(col("doc_id"), col("batch_h").as("rej_h"), col("kind"))
        .write.mode("append").parquet(rejectionsPath(dir))
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[media-ingest] rejection-ledger append failed (cache only, batch committed): ${e.getMessage}")
      }
    }
    MediaIngestStats(batchRows, replayed, conflicting,
      ledgQ + nQuality, ledgS + nDupStore, ledgB + nDupBatch, nAccepted)
  }

  /** Right-to-be-forgotten for the streamed store: tombstone the docs
    * through the store's own removal, then drop the rejection ledger
    * wholesale — a removed doc may have been the very content match
    * that rejected a near-dup arrival, so cached gate decisions are no
    * longer implied by the shrunken store (the
    * [[IncrementalIngest.removeDocs]] rule; losing the ledger costs
    * re-evaluation on re-offer, never correctness).
    */
  def removeDocs(spark: SparkSession, ids: DataFrame, dir: String): Unit = {
    MediaFeatures.removeDocs(spark, ids, dir)
    CorpusStore.fs(spark, dir).delete(new Path(rejectionsPath(dir)), true)
    ()
  }

  /** The streaming front end: any [[SourceConfig]] of
    * `(doc_id, img, wav, y4m)` rows → [[ingestBatch]] per micro-batch
    * under a checkpoint. `Trigger.AvailableNow` drains what has
    * arrived and stops; the checkpoint makes delivery at-least-once,
    * and the membership probe + rejection ledger make ingestion
    * exactly-once — a replayed micro-batch is a counted no-op.
    */
  def start(spark: SparkSession, source: SourceConfig, checkpointDir: String,
            dir: String, maxHamming: Int = 3,
            onBatch: (Long, MediaIngestStats) => Unit = (_, _) => ())
      : StreamingQuery =
    StreamSources.open(spark, source)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty)
          onBatch(id, ingestBatch(spark, batch, dir, maxHamming))
      }
      .start()
}
