package graft.ext

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def media = Multimodal.withFakeMedia(Tables.documents(spark, sfDir))

  test("decode: deterministic 16-dim unit-L1 features per doc") {
    val out = Multimodal.decodeFeatures(spark, media).collect()
    assert(out.length == 500)
    out.take(20).foreach { r =>
      assert(r.features.length == Multimodal.FeatureDim)
      assert(math.abs(r.features.map(_.toDouble).sum - 1.0) < 1e-3)
    }
    // determinism: same input → same features
    val again = Multimodal.decodeFeatures(spark, media).collect()
    assert(out.sortBy(_.doc_id).head.features.toSeq ==
      again.sortBy(_.doc_id).head.features.toSeq)
  }

  test("resize: bounded by max side, never upscales") {
    val out = Multimodal.resizeMeta(media, 48)
      .select("width", "height", "out_width", "out_height").collect()
    out.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(math.max(ow, oh) <= 48 || (w <= 48 && h <= 48))
      assert(ow <= w && oh <= h)
    }
  }

  test("frame sampling: strided frames with non-empty byte slices") {
    val out = Multimodal.sampleFrames(media, every = 2)
    val counts = out.groupBy("doc_id").agg(count(lit(1)).as("n"),
        max("frame").as("max_frame"))
      .join(media.select(col("doc_id"), col("nFrames")), "doc_id")
      .collect()
    counts.foreach { r =>
      val (n, maxFrame, nFrames) = (r.getLong(1), r.getInt(2), r.getInt(3))
      assert(n == (nFrames + 1) / 2, s"expected ceil($nFrames/2) frames, got $n")
      assert(maxFrame < nFrames)
    }
    assert(out.filter(length(col("frame_bytes")) === 0).isEmpty)
  }

  test("metadata-only stages do not carry the payload column") {
    val resized = Multimodal.resizeMeta(media, 48)
      .select("doc_id", "out_width", "out_height")
    val optimized = resized.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("media"),
      s"resize meta plan should prune the binary column:\n$optimized")
  }
}
