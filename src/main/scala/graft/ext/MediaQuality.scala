package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Media quality gates over the [[MediaFeatures]] store — the
  * curation-stage predicates a multimodal pipeline runs after decode,
  * each a pure exact-integer test over already-decoded stats (no
  * payload access at gate time):
  *
  *  - `audio_silent`: peak |sample| below 327 (≈ −40 dBFS) — no
  *    signal.
  *  - `audio_clipped`: more than 25% of samples in the two rail bins
  *    of the amplitude histogram — hard clipping.
  *  - `video_black`: more than half the luma mass in histogram bin 0.
  *  - `video_static`: every frame's luma sum identical (≥ 2 frames) —
  *    a frozen clip. The one gate with real in-data traffic: ~1.2% of
  *    fixture videos are exactly static by luma sum.
  *  - `img_dark` / `img_bright`: more than half the pixel-value mass
  *    in the two lowest / highest histogram bins — under/over-exposed.
  *
  * Thresholds carry REAL semantics (what you would gate real media
  * on), so on the clean synthetic corpus most gates pass everything;
  * the gate query therefore unions CONSTRUCTED degenerate arrivals
  * ([[plantedArrivals]] — byte-built silent/clipped WAV, black/static
  * Y4M, dark/bright P6 payloads, decoded through the real kernels) so
  * every gate carries verified traffic, and the planted stats are
  * analytically exact for the oracle.
  */
object MediaQuality {

  val PlantBase = 40000000L

  /** Constructed degenerate payloads, one per gate, each row carrying
    * a healthy payload in the other two modalities (healthy video is
    * seed 1 at 20×16×3 — seed 1 at 16×16×2 happens to be luma-static,
    * which would cross-fire the static gate). All constructions are
    * literal byte arithmetic over kernel-synth'd bases, so the decoded
    * stats are analytically certain and the oracle states them as
    * literals.
    */
  def plantedArrivals(spark: SparkSession): DataFrame = {
    val base = spark.createDataFrame(Seq(
      (PlantBase + 1, "audio_silent"), (PlantBase + 2, "audio_clipped"),
      (PlantBase + 3, "video_black"), (PlantBase + 4, "video_static"),
      (PlantBase + 5, "img_dark"), (PlantBase + 6, "img_bright")))
      .toDF("doc_id", "kind")
      .withColumn("img0",
        graft.functions.native.ppm_synth(lit(1L), lit(32), lit(32)))
      .withColumn("wav0",
        graft.functions.native.wav_synth(lit(1L), lit(256), lit(1), lit(8000)))
      .withColumn("y4m0",
        graft.functions.native.y4m_synth(lit(1L), lit(20), lit(16), lit(3),
          lit(12)))
    // frame block = "FRAME\n" + 3·20·16 plane bytes = 966; 3 frames
    val silentWav =
      expr("substring(wav0, 1, 44)") |+| unhex(expr("repeat('00', 512)"))
    val clippedWav =
      expr("substring(wav0, 1, 44)") |+| unhex(expr("repeat('ff7f', 256)"))
    val zeroFrame = unhex(lit("4652414d450a")) |+| unhex(expr("repeat('00', 960)"))
    val blackY4m =
      expr("substring(y4m0, 1, length(y4m0) - 2898)") |+|
        zeroFrame |+| zeroFrame |+| zeroFrame
    val f1 = expr("substring(y4m0, length(y4m0) - 2898 + 1, 966)")
    val staticY4m =
      expr("substring(y4m0, 1, length(y4m0) - 2898)") |+| f1 |+| f1 |+| f1
    val darkImg =
      expr("substring(img0, 1, 13)") |+| unhex(expr("repeat('05', 3072)"))
    val brightImg =
      expr("substring(img0, 1, 13)") |+| unhex(expr("repeat('f8', 3072)"))
    base.select(col("doc_id"),
      when(col("kind") === "img_dark", darkImg)
        .when(col("kind") === "img_bright", brightImg)
        .otherwise(col("img0")).as("img"),
      when(col("kind") === "audio_silent", silentWav)
        .when(col("kind") === "audio_clipped", clippedWav)
        .otherwise(col("wav0")).as("wav"),
      when(col("kind") === "video_black", blackY4m)
        .when(col("kind") === "video_static", staticY4m)
        .otherwise(col("y4m0")).as("y4m"))
  }

  private implicit class BinConcat(private val c: org.apache.spark.sql.Column) {
    def |+|(other: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat(c, other)
  }

  /** The gate flags (0/1 longs) over a decoded feature frame — the six
    * quality predicates plus `undecodable`: a payload whose decode
    * quarantined to NULL stats must FAIL the gate, not sail through
    * it (a null predicate would otherwise flag() to 0 on every gate —
    * the inverse of the media family's malformed-drops-rows rule).
    */
  def qualityFlags(features: DataFrame): DataFrame = {
    def flag(c: org.apache.spark.sql.Column) = when(c, 1L).otherwise(0L)
    features.select(col("doc_id"),
      flag(col("a_peak").isNull || col("v_frames").isNull ||
        col("img_w").isNull).as("undecodable"),
      flag(col("a_peak") < 327).as("audio_silent"),
      flag((element_at(col("a_hist"), 1) + element_at(col("a_hist"), 16)) * 4 >
        col("a_frames") * col("a_channels")).as("audio_clipped"),
      flag(element_at(col("v_hist"), 1) * 2 >
        col("v_frames") * col("v_w") * col("v_h")).as("video_black"),
      flag(size(col("frame_y")) >= 2 &&
        size(array_distinct(col("frame_y"))) === 1).as("video_static"),
      flag((element_at(col("img_hist"), 1) + element_at(col("img_hist"), 2)) * 2 >
        col("img_w") * col("img_h") * 3).as("img_dark"),
      flag((element_at(col("img_hist"), 15) + element_at(col("img_hist"), 16)) * 2 >
        col("img_w") * col("img_h") * 3).as("img_bright"))
  }

  /** The gate report: every REJECTED document (any flag set) across
    * corpus ∪ constructed degenerate arrivals, with its flags. Corpus
    * flags come from the store; arrival flags from a real decode of
    * the constructed payloads.
    */
  def qualityGate(spark: SparkSession, dir: String): DataFrame = {
    val corpus = qualityFlags(MediaFeatures.features(spark, dir))
    val planted = qualityFlags(MediaFeatures.decodeMedia(plantedArrivals(spark)))
    corpus.unionByName(planted)
      .filter(col("undecodable") + col("audio_silent") + col("audio_clipped") +
        col("video_black") + col("video_static") + col("img_dark") +
        col("img_bright") > 0)
  }

  /** Per-doc modality OK flags for the curation funnel's media stages
    * (corpus only — booleans, true = survives).
    */
  def mediaOkFlags(spark: SparkSession, dir: String): DataFrame =
    qualityFlags(MediaFeatures.features(spark, dir))
      .select(col("doc_id"),
        (col("undecodable") + col("audio_silent") + col("audio_clipped") === 0)
          .as("audio_ok"),
        (col("undecodable") + col("video_black") + col("video_static") === 0)
          .as("video_ok"),
        (col("undecodable") + col("img_dark") + col("img_bright") === 0)
          .as("image_ok"))
}
