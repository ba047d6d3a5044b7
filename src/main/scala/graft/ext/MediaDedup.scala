package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Media-level dedup + decontamination over the [[MediaFeatures]]
  * store — the image/audio analogs of the text dedup family: two
  * renders of the same image with different bytes sail through
  * `dedup_exact`, and an eval-suite image inside the training corpus
  * is invisible to the shingle/embedding decon operators. Every tier
  * here is exact-integer over DECODED features, so the DuckDB oracle
  * replays it bit for bit.
  *
  *  - Perceptual image dedup: the store's 63-bit dHash signatures
  *    ([[MediaFeatures.dhashCol]]) banded through the SimHash
  *    pigeonhole ([[Dedup.hammingPairs]] — four 16-bit chunks, any
  *    pair within Hamming 3 shares a chunk), verified by
  *    bit_count(xor). The fixture's noise rasters put random pairs at
  *    Hamming ≈ 31 of 63, so the ball admits only true re-renders;
  *    the photometric-invariance property (brightness shift, which
  *    noise rasters cannot demonstrate — see the degeneracy note
  *    below) is pinned on gradient images in `MediaFeaturesSpec`.
  *  - Audio fingerprint dedup: sign-of-delta bits over 64-frame
  *    window energies ([[MediaFeatures.audioFpCol]]), bucketed by
  *    (signature, window count), verified by EXACT window-vector
  *    equality — the re-encode detector (same PCM samples, different
  *    container header).
  *  - Media decontamination: exact tier = payload-hash match against
  *    a broadcast benchmark asset table; near tier = equal decoded
  *    dims + ROTATION-matched 16-bin value histogram, which catches
  *    exactly the +16·k brightness-shifted re-renders (a +16 shift
  *    rotates the `value div 16` histogram by one bin) that the exact
  *    tier misses.
  *
  * Fixture degeneracy note (why the near tier is rotation-match, not
  * a fully shift-invariant matcher): the synthetic raster byte at
  * stream position j is `(doc_id + j·K) mod 256` — doc_id only adds a
  * CONSTANT, so any two fixture images with equal dims are literal
  * brightness shifts of each other. A matcher invariant under
  * arbitrary shifts would therefore (correctly!) match every
  * equal-dims pair here. Rotation-matching the 16-bin histogram keys
  * on shifts that are multiples of the bin width — enough to catch
  * planted re-renders, deterministic for the oracle, and
  * non-degenerate on this corpus.
  *
  * Scale shape: corpus sides are always the slim feature store (a few
  * longs per doc — never payload bytes); candidate generation is
  * bucketed (one shuffle, skew-capped), verification touches only
  * candidates; benchmark/arrival sides are bounded and broadcast.
  */
object MediaDedup {

  /** Table ids for in-query planted arrivals/assets — offset far above
    * any fixture doc_id so plants never collide with corpus rows.
    */
  val ReRenderOffset = 10000000L
  val ExactAssetOffset = 20000000L
  val NearAssetOffset = 30000000L

  /** Tonight's image arrivals: a re-render of every `everyNth`-th
    * corpus image with ONE perturbed raster byte (byte 0 += 128 mod
    * 256 — a watermark/defect pixel). Byte-level different payload,
    * perceptually the same image: exact-hash dedup misses it, the
    * dHash ball catches it. Built payload-level (header + modified
    * byte + rest), so the pipeline demonstrably DECODES the arrivals
    * rather than trusting precomputed features.
    */
  def imageReRenders(docs: DataFrame, everyNth: Int = 41): DataFrame =
    Multimodal.withFakeMedia(docs.filter(pmod(col("doc_id"), lit(everyNth)) === 0))
      .select((col("doc_id") + lit(ReRenderOffset)).as("doc_id"),
        concat(
          // dims are 32..95 (always 2-digit), so the P6 header is
          // exactly 13 bytes and raster byte 0 sits at position 14
          expr("substring(media, 1, 13)"),
          unhex(lpad(hex((pmod(col("doc_id"), lit(256)) + lit(128)) % 256),
            2, "0")),
          expr("substring(media, 15, length(media))")).as("media"))

  /** Perceptual near-dup image pairs over corpus ∪ arrivals: stored
    * signatures for the corpus (no decode), a real decode for the
    * arrival payloads, then the SimHash banding + Hamming verify.
    */
  def imagePhashPairs(spark: SparkSession, docs: DataFrame, dir: String,
                      maxHamming: Int = 3, maxBucket: Int = 256): DataFrame = {
    val stored = MediaFeatures.features(spark, dir)
      .select(col("doc_id"), col("dhash").as("sig"))
      .filter(col("sig").isNotNull)
    val arrivals = imageReRenders(docs)
      .select(col("doc_id"),
        MediaFeatures.dhashCol(graft.functions.native.ppm_tile_means(
          col("media"), MediaFeatures.DhashGridW, MediaFeatures.DhashGridH))
          .as("sig"))
      .filter(col("sig").isNotNull)
    Dedup.hammingPairs(stored.unionByName(arrivals), maxHamming, maxBucket)
  }

  /** The removal form: drop the higher id of every perceptual pair
    * (the arrival, for planted re-renders), keep the rest of
    * corpus ∪ arrivals.
    */
  def applyImagePhash(spark: SparkSession, docs: DataFrame, dir: String,
                      maxHamming: Int = 3, maxBucket: Int = 256): DataFrame = {
    val all = MediaFeatures.features(spark, dir).select(col("doc_id"))
      .unionByName(imageReRenders(docs).select(col("doc_id")))
    val losers = imagePhashPairs(spark, docs, dir, maxHamming, maxBucket)
      .select(col("b_id").as("doc_id")).distinct()
    all.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Tonight's audio arrivals: every `everyNth`-th corpus clip
    * RE-ENCODED — identical PCM samples and frame/channel layout,
    * different container header (sample-rate field rewritten to
    * 48 kHz), so the payload hash differs while the decoded sample
    * stream is byte-identical.
    */
  def audioReEncodes(docs: DataFrame, everyNth: Int = 89): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(everyNth)) === 0)
      .select(col("doc_id"),
        (Multimodal.metaHash(3) % 2048 + lit(256)).cast("int").as("frames"),
        (Multimodal.metaHash(4) % 2 + lit(1)).cast("int").as("channels"))
      .select((col("doc_id") + lit(ReRenderOffset)).as("doc_id"),
        graft.functions.native.wav_synth(col("doc_id"), col("frames"),
          col("channels"), lit(48000)).as("media"))

  /** Audio fingerprint dedup over corpus ∪ arrivals: stored
    * fingerprints for the corpus, a real decode for the arrivals;
    * candidates bucket on (signature, window count) — one shuffle,
    * skew-capped — and survive only EXACT window-vector equality
    * (same decoded audio content). One row per duplicate pair
    * `(a_id, b_id, n_windows)`.
    */
  def audioFpPairs(spark: SparkSession, docs: DataFrame, dir: String,
                   maxBucket: Int = 256): DataFrame = {
    val stored = MediaFeatures.features(spark, dir)
      .select(col("doc_id"), col("a_fp").as("sig"), col("a_fp_windows").as("vec"))
    val arrivals = audioReEncodes(docs)
      .select(col("doc_id"),
        transform(graft.functions.native.wav_window_stats(
          col("media"), MediaFeatures.FpWindowFrames),
          w => w.getField("sum_abs")).as("vec"))
      .select(col("doc_id"), MediaFeatures.audioFpCol(col("vec")).as("sig"),
        col("vec"))
    stored.unionByName(arrivals)
      .filter(col("vec").isNotNull)
      .withColumn("n_windows", size(col("vec")).cast("long"))
      .groupBy(col("sig"), col("n_windows"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("vec")))).as("m"))
      .filter(size(col("m")).between(2, maxBucket))
      .select(col("n_windows"), explode(flatten(transform(col("m"), (x, i) =>
        transform(slice(col("m"), i + lit(2), size(col("m"))),
          y => struct(x.getField("doc_id").as("a_id"),
            y.getField("doc_id").as("b_id"),
            x.getField("vec").as("a_vec"), y.getField("vec").as("b_vec"))))))
        .as("p"))
      .filter(col("p.a_vec") === col("p.b_vec"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
        col("n_windows"))
  }

  /** The benchmark asset table for media decontamination: exact copies
    * of every `doc_id % 97 == 0` corpus image, plus +16
    * brightness-shifted re-renders of every `doc_id % 97 == 13` image
    * (raster seed doc_id+16 under the ORIGINAL dims — each pixel
    * shifts by exactly one histogram bin).
    */
  def mediaBenchmark(docs: DataFrame): DataFrame = {
    val dims = docs.select(col("doc_id"),
      (Multimodal.metaHash(0) % 64 + lit(32)).cast("int").as("w"),
      (Multimodal.metaHash(1) % 64 + lit(32)).cast("int").as("h"))
    val exact = dims.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select((col("doc_id") + lit(ExactAssetOffset)).as("bench_id"),
        graft.functions.native.ppm_synth(col("doc_id"), col("w"), col("h"))
          .as("media"))
    val near = dims.filter(pmod(col("doc_id"), lit(97)) === 13)
      .select((col("doc_id") + lit(NearAssetOffset)).as("bench_id"),
        graft.functions.native.ppm_synth(col("doc_id") + lit(16L), col("w"),
          col("h")).as("media"))
    exact.unionByName(near)
  }

  /** Media decontamination report: corpus documents whose image
    * payload matches a benchmark asset — `exact` (identical bytes,
    * via the stored payload hash against the broadcast asset hashes)
    * or `near` (equal decoded dims + rotation-matched 16-bin value
    * histogram — the brightness-quantization-shift-invariant tier
    * that catches re-rendered assets the exact tier misses). The
    * corpus side is ONE scan of the slim feature store; assets are
    * decoded once and broadcast.
    */
  def deconMedia(spark: SparkSession, docs: DataFrame, dir: String): DataFrame = {
    val bench = mediaBenchmark(docs)
      .select(col("bench_id"), xxhash64(col("media")).as("bxx"),
        graft.functions.native.ppm_decode_stats(col("media")).as("bd"))
      .filter(col("bd").isNotNull)
      .select(col("bench_id"), col("bxx"), col("bd.width").as("bw"),
        col("bd.height").as("bh"), col("bd.hist").as("bhist"))
      .localCheckpoint()
    val corpus = MediaFeatures.features(spark, dir)
      .select(col("doc_id"), col("img_xx"), col("img_w"), col("img_h"),
        col("img_hist"))
    corpus.join(broadcast(bench),
        col("img_xx") === col("bxx") ||
          (col("img_w") === col("bw") && col("img_h") === col("bh") &&
            expr("exists(sequence(0, 15), " +
              "r -> slice(concat(img_hist, img_hist), r + 1, 16) == bhist)")))
      .groupBy(col("doc_id"))
      .agg(max(when(col("img_xx") === col("bxx"), 2).otherwise(1)).as("pri"))
      .select(col("doc_id"),
        when(col("pri") === 2, lit("exact")).otherwise(lit("near"))
          .as("match_kind"))
  }

  /** The removal form: corpus minus every matched document. */
  def deconMediaApply(spark: SparkSession, docs: DataFrame, dir: String): DataFrame =
    docs.select(col("doc_id"))
      .join(deconMedia(spark, docs, dir).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
}
