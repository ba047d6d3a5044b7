package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: media
  * (image/audio/video) as opaque `binary` columns with typed metadata,
  * plus decode / feature-extract / resize / frame-sample stages.
  *
  * The Spark-side shape is the real thing — schema, partition-parallel
  * batched execution via `mapPartitions` (the JVM analog of arrow-batch
  * UDFs: one iterator per partition, no per-row task overhead), column
  * pruning (the wide binary column is only read by stages that need
  * it). The codecs themselves are STUBBED: this container has no
  * image/audio libraries, so `decodeRgbStub` derives a deterministic
  * fake pixel summary from the bytes. Swapping in a real decoder
  * changes only the function body, not the dataflow.
  *
  * Scale notes (100 TB): media bytes dominate storage — keep them in
  * their own parquet column (or external object store with a path
  * column) so metadata-only queries never touch them; decode stages are
  * pure maps (no shuffle) and scale linearly with executors; feature
  * vectors (small, fixed-dim) flow into the [[Similarity]] ANN path.
  */
object Multimodal {

  val FeatureDim = 16

  case class MediaRow(doc_id: Long, media: Array[Byte], format: String,
                      width: Int, height: Int, nFrames: Int)
  case class DecodedRow(doc_id: Long, width: Int, height: Int,
                        features: Array[Float])

  /** Attach a deterministic synthetic media payload to each document —
    * stands in for reading a real binary column from parquet. Payload
    * bytes are the doc text; metadata is a multiplicative hash of
    * doc_id (Knuth constant) in plain integer arithmetic, so the
    * downstream metadata-only stages are reproducible in ANSI SQL and
    * can be hash-verified by the DuckDB oracle (engine-private hashes
    * like xxhash64 would make them self-certified only).
    */
  private def metaHash(k: Int): org.apache.spark.sql.Column =
    (col("doc_id") + lit(k)) * lit(2654435761L) % lit(4294967296L)

  def withFakeMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      // binary payload: text bytes repeated — opaque to the pipeline
      encode(concat_ws("|", col("text"), col("source")), "UTF-8").as("media"),
      lit("fake/rgb8").as("format"),
      (metaHash(0) % 64 + lit(32)).cast("int").as("width"),
      (metaHash(1) % 64 + lit(32)).cast("int").as("height"),
      (metaHash(2) % 8 + lit(1)).cast("int").as("nFrames"))

  /** Materialize each row's media payload as an individual `<doc_id>.bin`
    * file — the on-disk shape a binary ingestion source reads.
    *
    * LOCAL-MODE SCAFFOLDING ONLY: `foreachPartition` writes to a plain
    * filesystem path, which on a multi-executor cluster would scatter
    * files across each executor's *local* disk (silently wrong). It
    * exists solely to stage fixture files for the `s7_binary_source`
    * test query in this single-JVM sandbox. At scale media files already
    * sit in shared object storage and are read in place; a job that
    * genuinely needed to emit per-record files would go through a
    * committer (task-temp + rename on the shared store), not this.
    */
  def writeMediaFiles(docs: DataFrame, dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    docs.select(col("doc_id"), col("media"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"${r.getLong(0)}.bin"),
            r.getAs[Array[Byte]](1))
        }
      }
  }

  /** STUB decoder: a real implementation would decode the image/frame
    * here (e.g. via a JNI codec); the fake derives a 16-bin byte
    * histogram normalized to unit L1 — deterministic, so tests can pin
    * outputs. Everything around this body is production-shaped.
    */
  private[ext] def decodeRgbStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xFF) % FeatureDim) += 1f
      i += 1
    }
    val total = math.max(bytes.length, 1).toFloat
    var j = 0
    while (j < FeatureDim) { hist(j) /= total; j += 1 }
    hist
  }

  /** Decode + feature-extract stage: batched per partition. The
    * iterator-in/iterator-out shape means a real codec could hold one
    * decoder context per partition (not per row) — the property that
    * makes arrow-batch UDFs fast, expressed natively in Scala.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("format"), col("width"),
        col("height"), col("nFrames"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder context would be initialized here
        rows.map(r => DecodedRow(r.doc_id, r.width, r.height, decodeRgbStub(r.media)))
      }
  }

  /** Resize stage: metadata-only transform — must not deserialize the
    * payload (verified in the spec via column pruning of `media`).
    */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height")))
    media
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame-sampling stage for video-like payloads: explode each media
    * row into ≤ `every`-strided frame slices (byte ranges — a real
    * pipeline would seek/decode per keyframe). Output is one row per
    * sampled frame with its own payload slice.
    */
  def sampleFrames(media: DataFrame, every: Int = 2): DataFrame = {
    val frameIdx = filter(sequence(lit(0), col("nFrames") - 1),
      i => i % every === 0)
    media
      .select(col("doc_id"), col("media"), col("nFrames"),
        explode(frameIdx).as("frame"))
      .withColumn("frame_bytes",
        expr("substring(media, CAST(frame * (length(media) DIV greatest(nFrames,1)) AS INT) + 1, " +
          "greatest(CAST(length(media) DIV greatest(nFrames,1) AS INT), 1))"))
      .drop("media")
  }
}
