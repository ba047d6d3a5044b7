package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The decode-once media feature store ([[MediaFeatures]]): stored
  * serves equal the inline-decode paths, the append → remove → compact
  * lifecycle matches a from-scratch build (including the
  * post-compaction re-append the containment index's zombie-manifest
  * bug class targets), and the dHash signature carries the perceptual
  * property the fixture's noise rasters cannot show — invariance under
  * a clamp-free brightness shift on a realistic gradient image.
  */
class MediaFeaturesSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(name: String): String = {
    val dir = s"target/mediafeatspec/$name"
    deleteRecursively(dir)
    dir
  }

  private def docs = graft.Tables.documents(spark, sfDir)

  test("stored serves equal the inline-decode paths") {
    val dir = freshDir("serve_eq")
    MediaFeatures.ensure(spark, docs, dir)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq

    assert(rows(MediaFeatures.histNeighborsStored(spark, dir)) ==
      rows(Multimodal.histNeighbors(Multimodal.withFakeMedia(docs))))
    assert(rows(MediaFeatures.shotCutsStored(spark, dir)) ==
      rows(Multimodal.shotBoundaries(Multimodal.withFakeVideo(docs))))
    assert(rows(MediaFeatures.audioWindowsStored(spark, dir)) ==
      rows(Multimodal.audioWindowStats(Multimodal.withFakeAudio(docs))))
    assert(rows(MediaFeatures.videoFramesStored(spark, dir)) ==
      rows(Multimodal.videoFrameSample(Multimodal.withFakeVideo(docs))))
    assert(rows(MediaFeatures.profileStored(spark, docs, dir)) ==
      rows(Multimodal.multimodalProfile(docs)))
    assert(rows(MediaFeatures.tokenCountsStored(spark, docs, dir)) ==
      rows(Multimodal.multimodalTokenCounts(docs)))
  }

  test("second ensure serves without rebuild; changed corpus rebuilds") {
    val dir = freshDir("freshness")
    MediaFeatures.ensure(spark, docs.limit(20), dir)
    val meta = Artifact.readMeta(spark, dir)
    MediaFeatures.ensure(spark, docs.limit(20), dir)
    assert(Artifact.readMeta(spark, dir) == meta, "unchanged corpus must serve")
    MediaFeatures.ensure(spark, docs.limit(25), dir)
    assert(Artifact.readMeta(spark, dir) != meta, "changed corpus must rebuild")
  }

  test("append folds a batch in O(batch) and equals a from-scratch build") {
    val dir = freshDir("append")
    val seed = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    MediaFeatures.ensure(spark, seed, dir)
    MediaFeatures.append(spark, batch, dir)
    // idempotent: a double-submitted batch is a no-op
    val metaAfter = Artifact.readMeta(spark, dir)
    MediaFeatures.append(spark, batch, dir)
    assert(Artifact.readMeta(spark, dir) == metaAfter)
    // the additive fingerprint equals the union build's: ensure over
    // the union SERVES (no rebuild — the generation counter keeps the
    // append history; a rebuild would reset it to 1)
    val genBefore = Artifact.readNextGen(spark, dir)
    assert(genBefore > 1L)
    MediaFeatures.ensure(spark, docs, dir)
    assert(Artifact.readNextGen(spark, dir) == genBefore,
      "ensure over the union corpus must serve, not rebuild")
    // the incremental-admission ensure accepts the union state too
    MediaFeatures.ensureSeedOrUnion(spark, seed, docs, dir)
    assert(Artifact.readNextGen(spark, dir) == genBefore,
      "ensureSeedOrUnion must accept a previous append's union state")
    // content equals a fresh full build
    val fresh = freshDir("append_fresh")
    MediaFeatures.ensure(spark, docs, fresh)
    def sig(d: String): Seq[String] =
      MediaFeatures.features(spark, d)
        .select(col("doc_id"), col("dhash"), col("a_fp"), col("y_sum"),
          col("img_xx"), col("wav_xx"), col("y4m_xx"))
        .collect().map(_.toString).sorted.toSeq
    assert(sig(dir) == sig(fresh))
  }

  test("remove masks, compact drops physically, re-append readmits") {
    val dir = freshDir("lifecycle")
    MediaFeatures.ensure(spark, docs, dir)
    val removedIds = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("doc_id"))
    val removedSet = removedIds.as[Long].collect().toSet
    MediaFeatures.removeDocs(spark, removedIds, dir)
    val live = MediaFeatures.features(spark, dir)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(live.intersect(removedSet).isEmpty, "removed docs must be masked")
    // removing an absent id is a no-op, not a fingerprint corruption
    val metaAfterRemove = Artifact.readMeta(spark, dir)
    MediaFeatures.removeDocs(spark, Seq(999999L).toDF("doc_id"), dir)
    assert(Artifact.readMeta(spark, dir) == metaAfterRemove)
    // fingerprint subtraction equals a build over the survivors
    val genBefore = Artifact.readNextGen(spark, dir)
    MediaFeatures.ensure(spark,
      docs.filter(pmod(col("doc_id"), lit(3)) =!= 0), dir)
    assert(Artifact.readNextGen(spark, dir) == genBefore,
      "ensure over the survivors must serve, not rebuild")
    // compact: physical drop + gen reset; serves unchanged
    val before = MediaFeatures.features(spark, dir)
      .select(col("doc_id"), col("dhash")).collect().map(_.toString).sorted.toSeq
    MediaFeatures.compact(spark, dir)
    assert(!Artifact.hasTombstones(spark, dir))
    assert(Artifact.readNextGen(spark, dir) == 1L)
    val after = MediaFeatures.features(spark, dir)
      .select(col("doc_id"), col("dhash")).collect().map(_.toString).sorted.toSeq
    assert(after == before)
    // POST-compaction re-append of previously removed docs must
    // readmit them (the zombie-manifest bug class: a surviving row
    // keeping a stale gen would mask-proof itself)
    MediaFeatures.append(spark, docs.filter(pmod(col("doc_id"), lit(3)) === 0), dir)
    val readmitted = MediaFeatures.features(spark, dir)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(removedSet.subsetOf(readmitted), "re-appended docs must serve")
  }

  test("stored serve plans touch no decode kernel (decode-once, for real)") {
    val dir = freshDir("plan_audit")
    MediaFeatures.ensure(spark, docs, dir)
    val decodeKernels =
      Seq("ppmdecodestats", "wavdecodestats", "y4mdecodestats", "ppmsynth",
        "wavsynth", "y4msynth", "ppmtilemeans", "wavwindowstats",
        "y4mframeysums", "ppmheadermeta", "wavheadermeta", "y4mheadermeta")
    for ((name, df) <- Seq(
        "histNeighbors" -> MediaFeatures.histNeighborsStored(spark, dir),
        "shotCuts" -> MediaFeatures.shotCutsStored(spark, dir),
        "audioWindows" -> MediaFeatures.audioWindowsStored(spark, dir),
        "videoFrames" -> MediaFeatures.videoFramesStored(spark, dir),
        "profile" -> MediaFeatures.profileStored(spark, docs, dir),
        "tokenCounts" -> MediaFeatures.tokenCountsStored(spark, docs, dir))) {
      val plan = df.queryExecution.optimizedPlan.toString.toLowerCase
      val hit = decodeKernels.filter(plan.contains)
      assert(hit.isEmpty, s"$name serve plan re-decodes payloads: $hit")
    }
  }

  /** A hand-built clamp-free gradient P6 payload: header + raster where
    * byte (x, y, ch) = base(x, y) + shift, base ≤ 200 — realistic
    * smooth content (the synth fixture's stride rasters are noise, on
    * which any perceptual hash is a coin flip; the invariance property
    * needs real structure).
    */
  private def gradientPpm(w: Int, h: Int, shift: Int, flip: Boolean): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val raster = new Array[Byte](w * h * 3)
    var i = 0
    for (y <- 0 until h; x <- 0 until w; _ <- 0 until 3) {
      val base = if (flip) (w - 1 - x) * 4 + y else x * 4 + y
      raster(i) = (math.min(base, 200) + shift).toByte
      i += 1
    }
    header ++ raster
  }

  test("dHash is invariant under clamp-free brightness shift; far for different content") {
    val media = Seq(
      (1L, gradientPpm(32, 32, 0, flip = false)),
      (2L, gradientPpm(32, 32, 20, flip = false)), // same image, +20 brightness
      (3L, gradientPpm(32, 32, 0, flip = true))    // mirrored gradient
    ).toDF("doc_id", "media")
    val sigs = media.select(col("doc_id"),
        MediaFeatures.dhashCol(graft.functions.native.ppm_tile_means(
          col("media"), MediaFeatures.DhashGridW, MediaFeatures.DhashGridH))
          .as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L),
      "brightness shift must not change the perceptual signature")
    val hamming = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    assert(hamming > 20,
      s"mirrored content must be far in Hamming space, got $hamming")
  }
}
