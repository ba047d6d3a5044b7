package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decode-once media feature store: ONE tri-modal decode pass per
  * corpus (image + audio + video kernels over the payload bytes, all
  * in-row — no joins between the modalities) persisted under the house
  * artifact lifecycle, so every downstream media query SERVES decoded
  * features instead of re-running the byte decode inline.
  *
  * Why: before this store, the 9-query multimodal family re-decoded
  * the same corpus ~12 times per suite run. Per query each plan was a
  * clean linear map, but at 100 TB a pipeline decodes stored payloads
  * ONCE and serves features from a columnar store — decode cost is
  * paid at ingest, query cost is a narrow parquet scan of fixed-width
  * stats. This is that architecture: `features/` holds one row per
  * document with the image stats + 16-bin histogram + 9×8 tile means
  * + a dHash-style perceptual signature, the audio header/sample stats
  * + windowed folds + a fingerprint window vector, the video stats +
  * stride-1 per-frame luma sums, and an exact payload hash per
  * modality (the [[MediaDedup]] exact tier) — all from payload BYTES,
  * so every serve stays hash-verifiable against the generative oracle.
  *
  * Lifecycle (mirrors the containment index, `Dedup.ensureContainment`):
  * append admits a batch in O(batch) (decode only the fresh docs,
  * append under a new generation), removal tombstones doc ids, and
  * compaction rewrites to one gen-0 row per live doc and clears the
  * tombstones (generation counter resets so the bare-scan fast path
  * applies again). The additive content fingerprint keeps `ensure`
  * over the union corpus serving after appends instead of rebuilding.
  *
  * Scale notes (100 TB): the build is a pure map over the payload
  * column (linear with executors, no shuffle before the write); the
  * store is a few hundred bytes per document — 5-6 orders of magnitude
  * smaller than the media it summarizes — so serve-side scans touch
  * none of the payload bytes; rows are hash-distributed on doc_id so
  * the doc_id joins in the profile/pack serves shuffle only slim
  * feature rows.
  */
object MediaFeatures {

  /** dHash tile grid: 9 columns × 8 rows of tile means, 8 horizontal
    * comparisons per row → 64 bit positions, of which the top one is
    * dropped (63-bit signature) so the value stays non-negative in
    * every engine — DuckDB raises on `1::BIGINT << 63`, and a
    * sign-free signature keeps xor/bit_count replay portable.
    */
  val DhashGridW = 9
  val DhashGridH = 8
  val DhashBits = 63

  /** Audio fingerprint window: 64 frames per fold — fine enough that
    * fixture-sized clips (256..2303 frames) yield 4..36 windows, i.e.
    * up to 35 signature bits.
    */
  val FpWindowFrames = 64
  val FpMaxBits = 35

  /** Video fingerprint bits: sign-of-delta over the stride-1 per-frame
    * luma sums (fixture clips have 2..9 frames → up to 8 bits). The
    * bucket key a coarse signature needs only narrow candidates; exact
    * frame-vector equality does the verifying.
    */
  val VideoFpMaxBits = 8

  def defaultDir(d: String): String = s"${Artifact.root(d)}/media_features"

  /** The incremental-admission twin's location (one definition — the
    * Warm phase, the `mm_features_incr` query and the maintenance
    * sweep must agree or rebuild cycles / unswept stores appear with
    * no error).
    */
  def seedDir(d: String): String = s"${Artifact.root(d)}/media_features_seed"

  private[graft] val MetaPrefix = "mediafeat v1 "

  private def metaOf(docs: DataFrame): String =
    // media payloads are a pure function of doc_id (the generative
    // synth), so the identifying column set for freshness is doc_id
    s"${MetaPrefix}fp=${Artifact.fingerprint(docs, col("doc_id"))}"

  /** dHash-style perceptual signature over the 9×8 tile-mean array:
    * bit k (k = row·8 + col, k < 63) is set iff the tile right of
    * (row, col) has the strictly larger mean — relative comparisons,
    * so the signature is invariant under clamp-free brightness shifts.
    * All-integer; replayable in SQL from the tile-mean replay.
    */
  private[ext] def dhashCol(tiles: Column): Column =
    (0 until DhashBits).map { k =>
      val idx = (k / 8) * DhashGridW + (k % 8)
      when(element_at(tiles, idx + 2) > element_at(tiles, idx + 1),
        lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Shazam-style audio fingerprint bits over the 64-frame window
    * energy vector: bit k set iff window k+1's sum of |sample| is
    * strictly larger than window k's (sign-of-delta between adjacent
    * windows). Variable clip lengths yield variable bit counts —
    * absent windows contribute 0 bits, and the window COUNT rides
    * along in the candidate key so clips of different lengths never
    * collide silently.
    */
  private[ext] def audioFpCol(win: Column): Column =
    (0 until FpMaxBits).map { k =>
      when(size(win) > k + 1 &&
          element_at(win, k + 2) > element_at(win, k + 1),
        lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** [[audioFpCol]]'s video twin over the per-frame luma-sum vector:
    * bit k set iff frame k+1's luma sum strictly exceeds frame k's.
    * Cheap enough (≤ 9 elements) to derive from the stored `frame_y`
    * at query time — no extra stored column.
    */
  private[ext] def videoFpCol(sums: Column): Column =
    (0 until VideoFpMaxBits).map { k =>
      when(size(sums) > k + 1 &&
          element_at(sums, k + 2) > element_at(sums, k + 1),
        lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** The one decode pass: every feature any media query serves, from
    * one projection over the three payloads (synth'd in-row by
    * [[Multimodal.withFakeAllMedia]] — a real pipeline reads a binary
    * column here). The payload columns are each consumed by more than
    * one kernel, which keeps CollapseProject from inlining the synth
    * into its consumers (custom expressions are not collapse-cheap) —
    * each payload materializes once per row.
    */
  private[graft] def decodeAll(docs: DataFrame): DataFrame =
    decodeMedia(Multimodal.withFakeAllMedia(docs))

  /** The same decode pass over an explicit `(doc_id, img, wav, y4m)`
    * payload frame — the seam [[MediaQuality]]'s constructed
    * degenerate arrivals decode through.
    */
  private[graft] def decodeMedia(media: DataFrame): DataFrame =
    media
      .select(col("doc_id"),
        graft.functions.native.ppm_decode_stats(col("img")).as("i"),
        graft.functions.native.ppm_tile_means(col("img"), DhashGridW, DhashGridH)
          .as("tiles"),
        xxhash64(col("img")).as("img_xx"),
        graft.functions.native.wav_decode_stats(col("wav")).as("a"),
        graft.functions.native.wav_window_stats(col("wav"), 256).as("a_windows"),
        graft.functions.native.wav_window_stats(col("wav"), FpWindowFrames)
          .as("afp_raw"),
        xxhash64(col("wav")).as("wav_xx"),
        graft.functions.native.y4m_decode_stats(col("y4m")).as("v"),
        graft.functions.native.y4m_frame_y_sums(col("y4m"), 1).as("frame_y"),
        xxhash64(col("y4m")).as("y4m_xx"))
      .select(col("doc_id"),
        col("i.width").as("img_w"), col("i.height").as("img_h"),
        col("i.r_sum").as("r_sum"), col("i.g_sum").as("g_sum"),
        col("i.b_sum").as("b_sum"), col("i.hist").as("img_hist"),
        col("tiles"), dhashCol(col("tiles")).as("dhash"), col("img_xx"),
        col("a.n_channels").as("a_channels"), col("a.sample_rate").as("a_rate"),
        col("a.n_frames").as("a_frames"), col("a.duration_ms").as("a_ms"),
        col("a.c0_sum").as("a_c0_sum"), col("a.all_sum").as("a_all_sum"),
        col("a.peak").as("a_peak"), col("a.hist").as("a_hist"),
        col("a_windows"),
        transform(col("afp_raw"), w => w.getField("sum_abs")).as("a_fp_windows"),
        audioFpCol(transform(col("afp_raw"), w => w.getField("sum_abs")))
          .as("a_fp"),
        col("wav_xx"),
        col("v.width").as("v_w"), col("v.height").as("v_h"),
        col("v.fps").as("v_fps"), col("v.n_frames").as("v_frames"),
        col("v.duration_ms").as("v_ms"),
        col("v.y_sum").as("y_sum"), col("v.u_sum").as("u_sum"),
        col("v.v_sum").as("v_sum"), col("v.y_peak").as("y_peak"),
        col("v.hist").as("v_hist"), col("frame_y"), col("y4m_xx"))

  /** Build-if-needed: the full-corpus decode runs once per corpus
    * fingerprint (charged to the warm phase's `build_sec`); every
    * media serve after that reads `features/` bare.
    */
  def ensure(spark: SparkSession, docs: DataFrame, dir: String): String =
    Artifact.ensure(spark, dir, metaOf(docs)) {
      decodeAll(docs).withColumn("gen", lit(0L))
        .repartition(8, col("doc_id"))
        .write.mode("overwrite").parquet(s"$dir/features")
      Artifact.clearTombstones(spark, dir)
      Artifact.writeNextGen(spark, dir, 1L)
    }

  /** Ensure for the incremental-admission path: accept the artifact
    * in EITHER the seed state or the already-appended union state (a
    * previous run's admission left it there — the additive
    * fingerprint makes the union state recognizable without a scan
    * of the store itself). Rebuild to seed only when it matches
    * neither. Without this, every run of the incremental query paid
    * a full rebuild-to-seed + re-append cycle (14 s at 100×) instead
    * of the no-op admission probe steady state.
    */
  def ensureSeedOrUnion(spark: SparkSession, seedDocs: DataFrame,
                        unionDocs: DataFrame, dir: String): String =
    if (!Artifact.hasPendingMutation(spark, dir) &&
        Artifact.readMeta(spark, dir).contains(metaOf(unionDocs))) dir
    else ensure(spark, seedDocs, dir)

  /** The live serve view: stored rows masked against removal
    * tombstones — a bare parquet scan in the nothing-deleted steady
    * state.
    */
  def features(spark: SparkSession, dir: String): DataFrame = {
    Artifact.requireKind(spark, dir, MetaPrefix)
    Artifact.maskTombstones(spark, dir, spark.read.parquet(s"$dir/features"))
  }

  /** O(batch) incremental admission: decode ONLY the fresh batch docs
    * (idempotent — docs already live in the store are skipped) and
    * append them under a new generation; the additive fingerprint
    * bumps so a later ensure over the union corpus serves. The
    * existing rows are never rewritten.
    */
  def append(spark: SparkSession, batch: DataFrame, dir: String): Unit = {
    Artifact.requireKind(spark, dir, MetaPrefix)
    // no broadcast hints on the admission joins: the batch is
    // caller-sized (a full-corpus re-offer is legal), so pinning it to
    // the driver's broadcast path grows the driver linearly with batch
    // size — AQE picks broadcast for slim batches and degrades to a
    // shuffle join for oversized ones instead of a driver OOM
    val already = Artifact.maskTombstones(spark, dir,
        spark.read.parquet(s"$dir/features").select(col("doc_id"), col("gen"))
          .join(batch.select(col("doc_id")), Seq("doc_id"), "left_semi"))
      .select(col("doc_id")).distinct().localCheckpoint()
    // the admission is doc_id-driven (the decode pass synthesizes /
    // reads media BY id), so only ids are pinned — checkpointing the
    // full batch rows materialized every text column for nothing
    // (~13 of the 14 s the 100× incremental serve used to cost)
    val fresh = batch.select(col("doc_id"))
      .join(already, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    if (!fresh.isEmpty) appendDecoded(spark, decodeAll(fresh), dir)
  }

  /** [[append]]'s seam for callers that already DECODED the batch —
    * the streaming media ingest decodes each micro-batch once for its
    * quality/dedup gates and appends the surviving feature rows
    * directly, never re-decoding by id. The caller guarantees rows are
    * id-unique and absent from the store; this layer owns the
    * generation stamp, the additive fingerprint bump, and the mutation
    * window. Rows are pinned BEFORE the pending marker: a decode
    * failure must leave the artifact serving, not mid-mutation.
    */
  private[graft] def appendDecoded(spark: SparkSession, rows: DataFrame,
                                   dir: String): Unit = {
    Artifact.requireKind(spark, dir, MetaPrefix)
    val gen = Artifact.readNextGen(spark, dir)
    val pinned = rows.withColumn("gen", lit(gen)).localCheckpoint()
    if (!pinned.isEmpty) {
      Artifact.beginMutation(spark, dir)
      pinned.write.mode("append").parquet(s"$dir/features")
      Artifact.writeNextGen(spark, dir, gen + 1L)
      Artifact.addToFingerprint(spark, dir, MetaPrefix.trim,
        Artifact.fingerprint(pinned.select(col("doc_id")), col("doc_id")))
      Artifact.endMutation(spark, dir)
    }
  }

  /** O(removed) deletion: tombstone the doc ids (readers mask them
    * out) and subtract their fingerprint contribution — only ids
    * actually LIVE in the store count, so removing an absent id is a
    * no-op rather than a fingerprint corruption.
    */
  def removeDocs(spark: SparkSession, removedIds: DataFrame, dir: String): Unit = {
    Artifact.requireKind(spark, dir, MetaPrefix)
    val present = features(spark, dir).select(col("doc_id"))
      .join(broadcast(removedIds.select(col("doc_id"))), Seq("doc_id"), "left_semi")
      .distinct().localCheckpoint()
    if (!present.isEmpty) {
      Artifact.beginMutation(spark, dir)
      val tgen = Artifact.readNextGen(spark, dir)
      Artifact.appendTombstones(spark, dir,
        present.select(col("doc_id"), lit(tgen).as("tgen")))
      Artifact.subtractFromFingerprint(spark, dir, MetaPrefix.trim,
        Artifact.fingerprint(present, col("doc_id")))
      Artifact.endMutation(spark, dir)
    }
  }

  /** Compact after a run of appends/removals: one gen-0 row per live
    * doc, tombstones cleared, generation counter reset (the
    * containment index's zombie-manifest lesson — surviving rows MUST
    * re-stamp gen 0 or a later tombstone at tgen=1 can never mask
    * them). Returns (parquet files before, after).
    */
  def compact(spark: SparkSession, dir: String): (Int, Int) = {
    Artifact.requireKind(spark, dir, MetaPrefix)
    val r = Artifact.compactParquet(spark, dir, "features",
      merge = df => Artifact.maskTombstones(spark, dir, df)
        .withColumn("gen", lit(0L)))
    Artifact.clearTombstones(spark, dir)
    Artifact.writeNextGen(spark, dir, 1L)
    r
  }

  // ------------------------------------------------------------ serves

  /** [[Multimodal.histNeighbors]] served from the store: identical
    * scoring over the STORED image histograms — no image decode at
    * query time.
    */
  def histNeighborsStored(spark: SparkSession, dir: String,
                          nQueries: Long = 10L, k: Int = 5): DataFrame =
    Multimodal.histNeighborsFrom(
      features(spark, dir)
        .select(col("doc_id"), col("img_hist").cast("array<double>").as("vec"))
        .filter(col("vec").isNotNull),
      nQueries, k)

  /** [[Multimodal.shotBoundaries]] served from the store: delta +
    * threshold over the STORED stride-1 per-frame luma sums.
    */
  def shotCutsStored(spark: SparkSession, dir: String,
                     meanDeltaFloor: Int = 8): DataFrame =
    Multimodal.shotBoundariesFrom(
      features(spark, dir)
        .select(col("doc_id"), (col("v_w") * col("v_h")).as("wh"),
          col("frame_y").as("sums"))
        .filter(col("sums").isNotNull),
      meanDeltaFloor)

  /** [[Multimodal.audioWindowStats]] served from the store. */
  def audioWindowsStored(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir)
      .select(col("doc_id"), posexplode(col("a_windows")).as(Seq("win", "s")))
      .select(col("doc_id"), col("win"),
        col("s.peak").as("peak"), col("s.sum_abs").as("sum_abs"))

  /** [[Multimodal.videoFrameSample]] served from the store: the
    * stride-1 stored sums filtered to every `every`-th frame — same
    * rows as a strided decode, zero payload bytes touched.
    */
  def videoFramesStored(spark: SparkSession, dir: String,
                        every: Int = 2): DataFrame =
    features(spark, dir)
      .select(col("doc_id"), posexplode(col("frame_y")).as(Seq("pos", "y_sum")))
      .filter(pmod(col("pos"), lit(every)) === 0)
      .select(col("doc_id"), col("pos").cast("int").as("frame"), col("y_sum"))

  /** [[Multimodal.multimodalProfile]] served from the store: the three
    * modalities arrive pre-joined (one row per doc), so the tri-modal
    * card needs ONE doc_id join (for lang) instead of three decode
    * passes plus two exchanges.
    */
  def profileStored(spark: SparkSession, docs: DataFrame, dir: String): DataFrame =
    docs.select(col("doc_id"), col("lang"))
      .join(
        features(spark, dir).select(col("doc_id"),
          (col("img_w") * col("img_h")).as("px"),
          col("a_ms").as("audio_ms"), col("a_peak").as("audio_peak"),
          col("v_frames").as("vframes"), col("y_sum").as("vy"))
          .filter(col("px").isNotNull && col("audio_ms").isNotNull &&
            col("vframes").isNotNull),
        "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("px")).as("px_total"),
        sum(col("audio_ms")).as("audio_ms_total"),
        max(col("audio_peak")).as("audio_peak_max"),
        sum(col("vframes")).as("video_frames_total"),
        sum(col("vy")).as("video_y_total"))

  /** [[Multimodal.multimodalTokenCounts]] served from the store: the
    * media token terms come from STORED dims/frame counts (the same
    * numbers the O(header) parses recovered — certified equal by the
    * decode oracles), so the pack's budget needs no payload access.
    */
  def tokenCountsStored(spark: SparkSession, docs: DataFrame, dir: String): DataFrame =
    docs.select(col("doc_id"), TrainingSet.tokenCount(col("text")).as("text_tokens"))
      .join(
        features(spark, dir).select(col("doc_id"),
          expr("((img_w + 15) div 16) * ((img_h + 15) div 16)").as("img_tokens"),
          expr("(a_frames + 255) div 256").as("audio_tokens"),
          expr("(v_frames + 1) div 2").as("video_tokens"))
          .filter(col("img_tokens").isNotNull && col("audio_tokens").isNotNull &&
            col("video_tokens").isNotNull),
        "doc_id")
      .select(col("doc_id"),
        (col("text_tokens") + col("img_tokens") + col("audio_tokens") +
          col("video_tokens")).as("n_tokens"))
}
