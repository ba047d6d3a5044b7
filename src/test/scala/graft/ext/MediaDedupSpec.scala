package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Media dedup/decon over the feature store ([[MediaDedup]]): the
  * planted perturbed/re-encoded/shifted payloads are caught by the
  * perceptual tiers and MISSED by exact byte identity — the property
  * that motivates each operator.
  */
class MediaDedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sfDir)
  private lazy val dir: String = {
    val d = "target/mediadedupspec/store"
    deleteRecursively(d)
    MediaFeatures.ensure(spark, docs, d)
  }

  test("re-rendered image: different bytes, caught by the dHash ball") {
    // the arrival payload differs from its source byte-for-byte...
    val srcXx = Multimodal.withFakeMedia(docs.filter(col("doc_id") === 0))
      .select(xxhash64(col("media"))).as[Long].head()
    val arrXx = MediaDedup.imageReRenders(docs)
      .filter(col("doc_id") === MediaDedup.ReRenderOffset)
      .select(xxhash64(col("media"))).as[Long].head()
    assert(srcXx != arrXx, "re-render must differ at the byte level")
    // ...but lands within Hamming 1 of its source perceptually: either
    // its signature still equals the source's (same exact-sig group)
    // or it forms its own group whose rep pairs with the source's rep
    // at Hamming 1
    val groups = MediaDedup.imageSigGroups(spark, docs, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = MediaDedup.imagePhashPairs(spark, docs, dir)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val arrivalIsRep = groups.exists(_._2 == MediaDedup.ReRenderOffset)
    if (arrivalIsRep) {
      val planted = pairs.filter(_._2 == MediaDedup.ReRenderOffset)
      assert(planted.nonEmpty && planted.forall(_._3 <= 1),
        s"arrival rep must pair within Hamming 1, got ${pairs.mkString(",")}")
    } else
      // joined an existing group — the perturbation left the signature
      // unchanged, i.e. caught as an exact-signature duplicate
      assert(groups.exists(g => g._2 < MediaDedup.ReRenderOffset && g._3 > 1))
    // the removal form keeps one rep per signature, never the arrival
    val kept = MediaDedup.applyImagePhash(spark, docs, dir)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(kept.contains(0L) && !kept.contains(MediaDedup.ReRenderOffset))
  }

  test("re-encoded audio: different container bytes, identical decoded content") {
    val srcXx = Multimodal.withFakeAudio(docs.filter(col("doc_id") === 0))
      .select(xxhash64(col("media"))).as[Long].head()
    val arrXx = MediaDedup.audioReEncodes(docs)
      .filter(col("doc_id") === MediaDedup.ReRenderOffset)
      .select(xxhash64(col("media"))).as[Long].head()
    assert(srcXx != arrXx, "re-encode must differ at the byte level")
    val pairs = MediaDedup.audioFpPairs(spark, docs, dir)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, MediaDedup.ReRenderOffset)),
      s"re-encoded clip missing from ${pairs.mkString(", ")}")
  }

  test("re-encoded video: rewritten fps field, identical decoded frames") {
    // byte-level different payload (the parameter line changed)...
    val srcXx = Multimodal.withFakeVideo(docs.filter(col("doc_id") === 0))
      .select(xxhash64(col("media"))).as[Long].head()
    val arrXx = MediaDedup.videoReEncodes(docs)
      .filter(col("doc_id") === MediaDedup.ReRenderOffset)
      .select(xxhash64(col("media"))).as[Long].head()
    assert(srcXx != arrXx, "re-encode must differ at the byte level")
    // ...but the decoded frame stream is identical, so the pair tier
    // links the arrival's payload-group rep to the corpus rep
    val pairs = MediaDedup.videoFpPairs(spark, docs, dir)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect()
    assert(pairs.contains((0L, MediaDedup.ReRenderOffset)),
      s"re-encoded clip missing from ${pairs.mkString(", ")}")
    // cap telemetry: in-data and zero on this fixture
    val caps = MediaDedup.videoFpPairs(spark, docs, dir)
      .select(col("n_capped_buckets")).as[Long].collect()
    assert(caps.nonEmpty && caps.forall(_ == 0L))
  }

  test("resized video: 2x re-render evades the exact tier, caught by percep") {
    // the resized arrival is a REAL nearest-neighbor re-encode: new
    // payload bytes, new dims, new frame-sum vector — every exact tier
    // is blind to it
    def stats(df: org.apache.spark.sql.DataFrame) = df
      .select(xxhash64(col("media")).as("xx"),
        graft.functions.native.y4m_decode_stats(col("media")).as("d"),
        graft.functions.native.y4m_frame_y_sums(col("media"), 1).as("vec"))
      .select(col("xx"), col("d.width").as("w"), col("d.height").as("h"),
        col("d.n_frames").as("nf"), col("vec"))
      .as[(Long, Long, Long, Long, Seq[Long])].head()
    val src = stats(Multimodal.withFakeVideo(docs.filter(col("doc_id") === 0)))
    val arr = stats(MediaDedup.videoResizedReEncodes(docs)
      .filter(col("doc_id") === MediaDedup.ReRenderOffset))
    assert(src._1 != arr._1, "resize must change the payload bytes")
    assert(arr._2 == 2 * src._2 && arr._3 == 2 * src._3,
      "resize must double the decoded dims")
    assert(arr._4 == src._4, "resize keeps the frame count")
    assert(arr._5 == src._5.map(_ * 4),
      "NN 2x upscale quadruples each frame's luma sum exactly (mean preserved)")
    assert(arr._5 != src._5,
      "the raw frame vector changes — the exact video tier is blind")
    // the normalized-mean tier links the arrival to its source's rep
    val pairs = MediaDedup.videoPercepPairs(spark, docs, dir)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect()
    assert(pairs.contains((0L, MediaDedup.ReRenderOffset)),
      s"resized re-render missing from ${pairs.mkString(", ")}")
    val caps = MediaDedup.videoPercepPairs(spark, docs, dir)
      .select(col("n_capped_buckets")).as[Long].collect()
    assert(caps.nonEmpty && caps.forall(_ == 0L))
  }

  test("resampled audio: 2x rate evades the exact tier, caught by percep") {
    def stats(df: org.apache.spark.sql.DataFrame) = df
      .select(xxhash64(col("media")).as("xx"),
        graft.functions.native.wav_decode_stats(col("media")).as("d"),
        transform(graft.functions.native.wav_window_stats(
          col("media"), MediaFeatures.FpWindowFrames),
          w => w.getField("sum_abs")).as("w64"))
      .select(col("xx"), col("d.sample_rate").as("rate"),
        col("d.n_frames").as("nf"), col("d.duration_ms").as("ms"), col("w64"))
      .as[(Long, Long, Long, Long, Seq[Long])].head()
    val src = stats(Multimodal.withFakeAudio(docs.filter(col("doc_id") === 0)))
    val arr = stats(MediaDedup.audioResamples(docs)
      .filter(col("doc_id") === MediaDedup.ReRenderOffset))
    assert(src._1 != arr._1, "resample must change the payload bytes")
    assert(arr._2 == 2 * src._2 && arr._3 == 2 * src._3,
      "NN resample doubles rate and frames")
    assert(arr._4 == src._4, "duration is preserved")
    // the exact 64-FRAME window vector changes (each window now covers
    // half the time span) — the exact audio tier is blind to a resample
    assert(arr._5 != src._5,
      "raw 64-frame window vectors must diverge under resampling")
    // ...the time-normalized envelope tier links it to its source
    val pairs = MediaDedup.audioPercepPairs(spark, docs, dir)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect()
    assert(pairs.contains((0L, MediaDedup.ReRenderOffset)),
      s"resampled clip missing from ${pairs.mkString(", ")}")
    val caps = MediaDedup.audioPercepPairs(spark, docs, dir)
      .select(col("n_capped_buckets")).as[Long].collect()
    assert(caps.nonEmpty && caps.forall(_ == 0L))
  }

  test("no-silent-caps: dropped-bucket telemetry rides the pair rows") {
    // this fixture caps nothing — every pair row reports 0
    val img = MediaDedup.imagePhashPairs(spark, docs, dir)
      .select(col("n_capped_buckets")).as[Long].collect()
    assert(img.forall(_ == 0L), s"fixture must cap nothing: ${img.toSeq}")
    val au = MediaDedup.audioFpPairs(spark, docs, dir)
      .select(col("n_capped_buckets")).as[Long].collect()
    assert(au.nonEmpty && au.forall(_ == 0L))
    // constructed over-cap universe: 300 identical signatures blow the
    // 256-cap in all four pigeonhole chunks — the pairs are dropped
    // (the declared cap semantics) AND the telemetry reports exactly
    // the 4 dropped buckets instead of staying silent
    val sigs = spark.range(300).select(col("id").as("doc_id"), lit(5L).as("sig"))
    assert(Dedup.hammingPairs(sigs, 3, 256).isEmpty)
    assert(Dedup.hammingCappedBuckets(sigs, 256).as[Long].head() == 4L)
  }

  test("audio/video decon: exact copies → exact tier; re-encodes → content tier") {
    val kinds = MediaDedup.deconMediaAv(spark, docs, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getString(2))
      .toMap
    // the %97=31/59 bounded slices are byte-exact asset copies; the
    // %97=47/73 slices are re-encodes (48 kHz header / fps swap) whose
    // payload hash differs — only the decoded-content tier sees them
    assert(kinds.get((31L, "audio")).contains("exact"), s"got $kinds")
    assert(kinds.get((59L, "video")).contains("exact"), s"got $kinds")
    assert(kinds.get((47L, "audio")).contains("content"), s"got $kinds")
    assert(kinds.get((73L, "video")).contains("content"), s"got $kinds")
  }

  test("media decon: exact copy → exact tier; +16 shift → near tier only") {
    val kinds = MediaDedup.deconMedia(spark, docs, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds.get(0L).contains("exact"),
      s"doc 0 is a benchmark exact copy, got $kinds")
    // doc 13's asset is its +16-shifted re-render: different payload
    // bytes (exact tier blind), one-bin histogram rotation (near tier)
    assert(kinds.get(13L).contains("near"),
      s"doc 13's shifted asset must be caught by the near tier, got $kinds")
    val kept = MediaDedup.deconMediaApply(spark, docs, dir)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(!kept.contains(0L) && !kept.contains(13L))
    assert(kept.nonEmpty, "apply must keep the unmatched corpus")
  }
}
