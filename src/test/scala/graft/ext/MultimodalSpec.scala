package graft.ext

import graft.{SparkSuite, Tables}
import graft.functions.PpmKernel
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def media = Multimodal.withFakeMedia(Tables.documents(spark, sfDir))

  /** The generative raster formula, recomputed independently of the
    * kernel: byte k = (doc_id + k·2654435761) mod 256.
    */
  private def expectedStats(docId: Long, w: Int, h: Int): (Array[Long], Array[Long]) = {
    val sums = new Array[Long](3)
    val hist = new Array[Long](PpmKernel.HistBins)
    var k = 0
    val n = w * h * 3
    while (k < n) {
      val v = ((docId + k * 2654435761L) % 256L).toInt
      sums(k % 3) += v
      hist(v >> 4) += 1
      k += 1
    }
    (sums, hist)
  }

  test("kernel round-trip: synth → decode recovers dims and formula stats") {
    for ((id, w, h) <- Seq((0L, 1, 1), (7L, 32, 95), (123456L, 95, 32))) {
      val row = PpmKernel.decode(PpmKernel.synth(id, w, h))
      assert(row != null, s"well-formed payload rejected: id=$id ${w}x$h")
      assert(row.getLong(0) == w && row.getLong(1) == h,
        s"decoded dims ${row.getLong(0)}x${row.getLong(1)} != ${w}x$h")
      val (sums, hist) = expectedStats(id, w, h)
      assert(Seq(row.getLong(2), row.getLong(3), row.getLong(4)) == sums.toSeq)
      assert(row.getArray(5).toLongArray().toSeq == hist.toSeq)
      assert(hist.sum == w.toLong * h * 3)
    }
  }

  test("decode: header dims and integer stats match the formula per doc") {
    val out = Multimodal.decodeStats(media)
      .join(media.select(col("doc_id"), col("width").as("meta_w"),
        col("height").as("meta_h")), "doc_id")
      .orderBy(col("doc_id")).collect()
    assert(out.length == 500)
    out.foreach { r =>
      // decoded-from-payload dims equal the metadata the synth used
      assert(r.getLong(1) == r.getInt(7).toLong, s"width mismatch: $r")
      assert(r.getLong(2) == r.getInt(8).toLong, s"height mismatch: $r")
    }
    out.take(5).foreach { r =>
      val (sums, hist) = expectedStats(r.getLong(0), r.getInt(7), r.getInt(8))
      assert(Seq(r.getLong(3), r.getLong(4), r.getLong(5)) == sums.toSeq)
      assert(r.getSeq[Long](6) == hist.toSeq)
    }
  }

  test("decode: malformed payloads quarantine as NULL, never fail") {
    def bytes(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val good = PpmKernel.synth(1L, 2, 2)
    val cases: Seq[(String, Array[Byte])] = Seq(
      ("bad magic", { val b = good.clone(); b(1) = '5'; b }),
      ("truncated raster", good.dropRight(1)),
      ("oversized raster", good :+ 0.toByte),
      ("maxval not 255", bytes("P6\n2 2\n254\n") ++ Array.fill(12)(0.toByte)),
      ("non-numeric dims", bytes("P6\nx 2\n255\n") ++ Array.fill(12)(0.toByte)),
      ("empty", Array.empty[Byte]))
    cases.foreach { case (why, b) =>
      assert(PpmKernel.decode(b) == null, s"kernel accepted: $why")
    }
    // through the expression: NULL rows, not exceptions (and the good
    // payload still decodes in the same plan)
    val df = (cases.map(_._2) :+ good).zipWithIndex
      .map { case (b, i) => (i.toLong, b) }.toDF("doc_id", "media")
    val decoded = df.select(col("doc_id"),
      graft.functions.native.ppm_decode_stats(col("media")).as("d"))
    assert(decoded.filter(col("d").isNull).count() == cases.length.toLong)
    assert(decoded.filter(col("d").isNotNull).count() == 1L)
  }

  test("tile pooling: partition covers every pixel, means match the formula") {
    for ((id, w, h) <- Seq((3L, 32, 95), (42L, 95, 33), (7L, 2, 2))) {
      val arr = graft.functions.PpmKernel
        .tileMeans(graft.functions.PpmKernel.synth(id, w, h), 4, 4)
      assert(arr != null && arr.numElements() == 16)
      // independent recompute: per-tile half-up mean over all channels
      val sums = new Array[Long](16); val counts = new Array[Long](16)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val k = (y * w + x) * 3 + c
        val t = (y * 4 / h) * 4 + x * 4 / w
        sums(t) += ((id + k * 2654435761L) % 256L); counts(t) += 1
      }
      val expected = (0 until 16).map(i =>
        if (counts(i) == 0) -1L else (2 * sums(i) + counts(i)) / (2 * counts(i)))
      assert(arr.toLongArray().toSeq == expected,
        s"tile means mismatch for id=$id ${w}x$h")
      assert(counts.sum == w.toLong * h * 3)
      // a 2x2 image under a 4x4 grid has pixel-less tiles marked -1
      if (w < 4) assert(arr.toLongArray().count(_ == -1L) > 0)
    }
    // through the stage: malformed payloads contribute zero rows
    val bad = Seq((1L, Array[Byte]('P', '5', '\n'))).toDF("doc_id", "media")
    assert(Multimodal.tilePool(bad).count() == 0L)
    val rows = Multimodal.tilePool(media).groupBy(col("doc_id"))
      .count().agg(min("count"), max("count")).head()
    assert(rows.getLong(0) == 16L && rows.getLong(1) == 16L,
      "every fixture doc (all sides >= 32) must fill all 16 tiles")
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

  /** The generative WAV sample formula, recomputed independently of
    * the kernel: sample k = ((doc_id + k·2654435761) mod 65536) − 32768.
    */
  private def expectedAudio(docId: Long, frames: Int, channels: Int)
      : (Long, Long, Long, Array[Long]) = {
    var c0 = 0L; var all = 0L; var peak = 0L
    val hist = new Array[Long](graft.functions.WavKernel.HistBins)
    var k = 0
    val n = frames * channels
    while (k < n) {
      val v = ((docId + k * 2654435761L) % 65536L) - 32768L
      all += v
      if (k % channels == 0) c0 += v
      if (math.abs(v) > peak) peak = math.abs(v)
      hist(((v + 32768L) >> 12).toInt) += 1
      k += 1
    }
    (c0, all, peak, hist)
  }

  test("wav round-trip: synth → decode recovers header fields and formula stats") {
    import graft.functions.WavKernel
    for ((id, frames, ch, rate) <- Seq((0L, 1, 1, 8000), (7L, 300, 2, 16000),
        (123456L, 2303, 1, 44100))) {
      val row = WavKernel.decode(WavKernel.synth(id, frames, ch, rate))
      assert(row != null, s"well-formed payload rejected: id=$id")
      assert(row.getLong(0) == ch.toLong && row.getLong(1) == rate.toLong &&
        row.getLong(2) == frames.toLong)
      assert(row.getLong(3) == frames.toLong * 1000L / rate)
      val (c0, all, peak, hist) = expectedAudio(id, frames, ch)
      assert((row.getLong(4), row.getLong(5), row.getLong(6)) == ((c0, all, peak)))
      assert(row.getArray(7).toLongArray().toSeq == hist.toSeq)
      assert(hist.sum == frames.toLong * ch)
    }
  }

  test("wav decode: malformed payloads quarantine as NULL, never fail") {
    import graft.functions.WavKernel
    val good = WavKernel.synth(1L, 4, 2, 8000)
    def mut(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = v; b
    }
    val cases: Seq[(String, Array[Byte])] = Seq(
      ("bad RIFF magic", mut(0, 'X')),
      ("bad WAVE magic", mut(8, 'X')),
      ("non-PCM format", mut(20, 2)),
      ("bits != 16", mut(34, 8)),
      ("inconsistent byte rate", mut(28, 1)),
      ("inconsistent block align", mut(32, 1)),
      ("truncated data", good.dropRight(1)),
      ("oversized data", good :+ 0.toByte),
      ("header only", good.take(44).clone()), // data len now inconsistent
      ("empty", Array.empty[Byte]))
    cases.foreach { case (why, b) =>
      assert(WavKernel.decode(b) == null, s"kernel accepted: $why")
    }
    val df = (cases.map(_._2) :+ good).zipWithIndex
      .map { case (b, i) => (i.toLong, b) }.toDF("doc_id", "media")
    val decoded = df.select(col("doc_id"),
      graft.functions.native.wav_decode_stats(col("media")).as("d"))
    assert(decoded.filter(col("d").isNull).count() == cases.length.toLong)
    assert(decoded.filter(col("d").isNotNull).count() == 1L)
  }

  test("audio stage: decoded header fields match the synth metadata per doc") {
    val audio = Multimodal.withFakeAudio(Tables.documents(spark, sfDir))
    val out = Multimodal.audioStats(audio).orderBy(col("doc_id")).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getLong(0)
      def metaHash(k: Int): Long = (id + k) * 2654435761L % 4294967296L
      assert(r.getLong(1) == metaHash(4) % 2 + 1, s"channels: $r")
      assert(r.getLong(2) == (metaHash(5) % 2 + 1) * 8000L, s"rate: $r")
      assert(r.getLong(3) == metaHash(3) % 2048 + 256, s"frames: $r")
      assert(r.getLong(4) == r.getLong(3) * 1000L / r.getLong(2))
    }
    out.take(3).foreach { r =>
      val (c0, all, peak, hist) =
        expectedAudio(r.getLong(0), r.getLong(3).toInt, r.getLong(1).toInt)
      assert((r.getLong(5), r.getLong(6), r.getLong(7)) == ((c0, all, peak)))
      assert(r.getSeq[Long](8) == hist.toSeq)
    }
    // mono docs: channel-0 sum IS the all-channel sum
    out.filter(_.getLong(1) == 1L).take(5)
      .foreach(r => assert(r.getLong(5) == r.getLong(6)))
  }

  /** The generative Y4M byte formula, recomputed independently of the
    * kernel: stream plane byte j = (doc_id + j·2654435761) mod 256,
    * plane = (j mod 3wh) div wh.
    */
  private def expectedVideo(docId: Long, w: Int, h: Int, nFrames: Int)
      : (Array[Long], Long, Array[Long]) = {
    val sums = new Array[Long](3)
    var yPeak = 0L
    val hist = new Array[Long](graft.functions.Y4mKernel.HistBins)
    val planeLen = w * h
    var j = 0L
    val n = nFrames.toLong * 3 * planeLen
    while (j < n) {
      val v = (docId + j * 2654435761L) % 256L
      val plane = ((j % (3L * planeLen)) / planeLen).toInt
      sums(plane) += v
      if (plane == 0) {
        if (v > yPeak) yPeak = v
        hist((v >> 4).toInt) += 1
      }
      j += 1
    }
    (sums, yPeak, hist)
  }

  test("y4m round-trip: synth → decode recovers header fields and formula stats") {
    import graft.functions.Y4mKernel
    for ((id, w, h, nf, fps) <- Seq((0L, 1, 1, 1, 1), (7L, 16, 47, 9, 24),
        (123456L, 47, 16, 2, 12))) {
      val row = Y4mKernel.decode(Y4mKernel.synth(id, w, h, nf, fps))
      assert(row != null, s"well-formed payload rejected: id=$id")
      assert(row.getLong(0) == w.toLong && row.getLong(1) == h.toLong &&
        row.getLong(2) == fps.toLong && row.getLong(3) == nf.toLong)
      assert(row.getLong(4) == nf.toLong * 1000L / fps)
      val (sums, yPeak, hist) = expectedVideo(id, w, h, nf)
      assert(Seq(row.getLong(5), row.getLong(6), row.getLong(7)) == sums.toSeq)
      assert(row.getLong(8) == yPeak)
      assert(row.getArray(9).toLongArray().toSeq == hist.toSeq)
      assert(hist.sum == nf.toLong * w * h)
    }
  }

  test("y4m decode: malformed payloads quarantine as NULL, never fail") {
    import graft.functions.Y4mKernel
    val good = Y4mKernel.synth(1L, 16, 17, 2, 24)
    def mut(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = v; b
    }
    def bytes(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val hdrLen = "YUV4MPEG2 W16 H17 F24:1 Ip A1:1 C444\n".length
    val cases: Seq[(String, Array[Byte])] = Seq(
      ("bad magic", mut(0, 'X')),
      ("leading-zero width", bytes("YUV4MPEG2 W016 H17 F24:1 Ip A1:1 C444\n")
        ++ good.drop(hdrLen)),
      ("fps denominator != 1", mut("YUV4MPEG2 W16 H17 F24:".length, '2')),
      ("interlaced flag", mut("YUV4MPEG2 W16 H17 F24:1 I".length, 't')),
      ("chroma not C444", mut(hdrLen - 2, '2')),
      ("corrupt FRAME marker", mut(hdrLen, 'G')),
      ("corrupt second marker", mut(hdrLen + 6 + 3 * 16 * 17, 'G')),
      ("truncated frame", good.dropRight(1)),
      ("oversized payload", good :+ 0.toByte),
      ("header only", good.take(hdrLen).clone()),
      ("empty", Array.empty[Byte]))
    cases.foreach { case (why, b) =>
      assert(Y4mKernel.decode(b) == null, s"kernel accepted: $why")
      assert(Y4mKernel.frameYSums(b, 2) == null, s"frame fold accepted: $why")
    }
    val df = (cases.map(_._2) :+ good).zipWithIndex
      .map { case (b, i) => (i.toLong, b) }.toDF("doc_id", "media")
    val decoded = df.select(col("doc_id"),
      graft.functions.native.y4m_decode_stats(col("media")).as("d"))
    assert(decoded.filter(col("d").isNull).count() == cases.length.toLong)
    assert(decoded.filter(col("d").isNotNull).count() == 1L)
    // and the malformed rows contribute zero frames to the sampler
    assert(Multimodal.videoFrameSample(df, every = 2).count() ==
      (2 + 1) / 2) // only the good 2-frame payload, frames {0}... ceil(2/2)=1
  }

  test("video stage: decoded header fields match the synth metadata per doc") {
    val video = Multimodal.withFakeVideo(Tables.documents(spark, sfDir))
    val out = Multimodal.videoStats(video).orderBy(col("doc_id")).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getLong(0)
      def metaHash(k: Int): Long = (id + k) * 2654435761L % 4294967296L
      assert(r.getLong(1) == metaHash(6) % 32 + 16, s"width: $r")
      assert(r.getLong(2) == metaHash(7) % 32 + 16, s"height: $r")
      assert(r.getLong(3) == (metaHash(9) % 2 + 1) * 12L, s"fps: $r")
      assert(r.getLong(4) == metaHash(8) % 8 + 2, s"frames: $r")
      assert(r.getLong(5) == r.getLong(4) * 1000L / r.getLong(3))
    }
    out.take(3).foreach { r =>
      val (sums, yPeak, hist) = expectedVideo(r.getLong(0),
        r.getLong(1).toInt, r.getLong(2).toInt, r.getLong(4).toInt)
      assert(Seq(r.getLong(6), r.getLong(7), r.getLong(8)) == sums.toSeq)
      assert(r.getLong(9) == yPeak)
      assert(r.getSeq[Long](10) == hist.toSeq)
    }
  }

  test("video frame sampling: strided decoded luma sums tile the full fold") {
    import graft.functions.Y4mKernel
    val payload = Y4mKernel.synth(9L, 20, 21, 7, 12)
    // every=1 covers every frame; their sum must equal the decode's y_sum
    val all = Y4mKernel.frameYSums(payload, 1)
    assert(all.numElements() == 7)
    assert(all.toLongArray().sum == Y4mKernel.decode(payload).getLong(5))
    // every=2 picks frames 0,2,4,6 — elementwise equal to the full fold
    val strided = Y4mKernel.frameYSums(payload, 2)
    assert(strided.toLongArray().toSeq ==
      all.toLongArray().zipWithIndex.filter(_._2 % 2 == 0).map(_._1).toSeq)
    // through the stage: one row per sampled frame, frame = pos·every
    val video = Multimodal.withFakeVideo(Tables.documents(spark, sfDir))
    val counts = Multimodal.videoFrameSample(video, every = 2)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max("frame").as("max_frame"))
      .collect()
    assert(counts.length == 500)
    counts.foreach { r =>
      def metaHash(k: Int): Long = (r.getLong(0) + k) * 2654435761L % 4294967296L
      val nf = metaHash(8) % 8 + 2
      assert(r.getLong(1) == (nf + 1) / 2, s"expected ceil($nf/2), got $r")
      assert(r.getInt(2) < nf && r.getInt(2) % 2 == 0)
    }
  }

  test("audio window stats: windows tile the stream, folds match the formula") {
    import graft.functions.WavKernel
    // kernel-level: window sums tile the whole stream's |sample| fold,
    // window peaks max up to the decode's global peak; short last window
    val payload = WavKernel.synth(9L, 1000, 2, 8000)
    val ws = WavKernel.windowStats(payload, 256)
    assert(ws.numElements() == 4) // ceil(1000/256)
    val rows = (0 until 4).map(ws.getStruct(_, 2))
    val (_, _, peak, _) = expectedAudio(9L, 1000, 2)
    assert(rows.map(_.getLong(0)).max == peak)
    val sumAbs = (0 until 2000).map(k =>
      math.abs(((9L + k * 2654435761L) % 65536L) - 32768L)).sum
    assert(rows.map(_.getLong(1)).sum == sumAbs)
    // independent per-window recompute
    rows.zipWithIndex.foreach { case (r, w) =>
      val lo = w * 256 * 2; val hi = math.min((w + 1) * 256, 1000) * 2
      val abs = (lo until hi).map(k =>
        math.abs(((9L + k * 2654435761L) % 65536L) - 32768L))
      assert(r.getLong(0) == abs.max && r.getLong(1) == abs.sum,
        s"window $w mismatch")
    }
    // malformed payloads and bad window sizes quarantine as null
    assert(WavKernel.windowStats(payload.dropRight(1), 256) == null)
    assert(WavKernel.windowStats(payload, 0) == null)
    // through the stage: every doc emits ceil(frames/256) windows
    val audio = Multimodal.withFakeAudio(Tables.documents(spark, sfDir))
    val counts = Multimodal.audioWindowStats(audio)
      .groupBy("doc_id").agg(count(lit(1)).as("n")).collect()
    assert(counts.length == 500)
    counts.foreach { r =>
      def metaHash(k: Int): Long = (r.getLong(0) + k) * 2654435761L % 4294967296L
      val frames = metaHash(3) % 2048 + 256
      assert(r.getLong(1) == (frames + 255) / 256, s"window count: $r")
    }
  }

  test("shot boundaries: deltas recompute from the formula, threshold exact, quarantine") {
    val video = Multimodal.withFakeVideo(Tables.documents(spark, sfDir))
    val cuts = Multimodal.shotBoundaries(video)
    // one transition row per adjacent frame pair, per doc
    val perDoc = cuts.groupBy("doc_id").agg(count(lit(1)).as("n")).collect()
    assert(perDoc.length == 500)
    perDoc.foreach { r =>
      def metaHash(k: Int): Long = (r.getLong(0) + k) * 2654435761L % 4294967296L
      assert(r.getLong(1) == metaHash(8) % 8 + 2 - 1, s"transitions: $r")
    }
    // independent recompute for a handful of docs: deltas from the
    // generative formula, the is_cut flag from the exact threshold
    val sample = cuts.filter(col("doc_id") < 3).orderBy("doc_id", "frame").collect()
    sample.foreach { r =>
      val id = r.getLong(0); val f = r.getInt(1)
      def metaHash(k: Int): Long = (id + k) * 2654435761L % 4294967296L
      val wh = ((metaHash(6) % 32 + 16) * (metaHash(7) % 32 + 16)).toInt
      def ySum(fr: Int): Long = (0 until wh).map(i =>
        (id + (fr.toLong * 3 * wh + i) * 2654435761L) % 256L).sum
      val delta = ySum(f) - ySum(f - 1)
      assert(r.getLong(2) == delta, s"delta mismatch: $r")
      assert(r.getLong(3) == (if (math.abs(delta) >= 8L * wh) 1L else 0L))
    }
    // malformed payloads contribute zero transition rows
    val bad = Seq((1L, Array[Byte]('Y', 'U', 'V'))).toDF("doc_id", "media")
    assert(Multimodal.shotBoundaries(bad).count() == 0L)
    // a single-frame payload has zero transitions — not two fabricated
    // null-delta rows (sequence(1, 0) is DESCENDING in Spark)
    val oneFrame = Seq((2L, graft.functions.Y4mKernel.synth(2L, 8, 8, 1, 12)))
      .toDF("doc_id", "media")
    assert(Multimodal.shotBoundaries(oneFrame).count() == 0L)
  }

  test("hist neighbors: a malformed QUERY payload quarantines instead of failing the stage") {
    val good = (0L until 12L).map(id =>
      (id, graft.functions.PpmKernel.synth(id, 8, 8)))
    // doc 3 is inside the query set (doc_id < 10) and malformed
    val rows = good.map { case (id, b) =>
      if (id == 3L) (id, b.dropRight(1)) else (id, b)
    }
    val out = Multimodal.histNeighbors(
      rows.toDF("doc_id", "media"), nQueries = 10L, k = 2)
    val qIds = out.select("q_id").distinct().collect().map(_.getLong(0)).sorted
    assert(qIds.toSeq == (0L until 10L).filterNot(_ == 3L),
      s"query 3 must drop, the rest must serve: ${qIds.toSeq}")
    assert(!out.select("n_id").collect().exists(_.getLong(0) == 3L),
      "the malformed doc must not appear as a neighbor either")
  }

  test("hist neighbors: decoded-feature cosine top-k matches a local recompute") {
    val out = Multimodal.histNeighbors(media).orderBy(col("q_id"), col("rank")).collect()
    // 10 fixed queries × k=5, ranks dense from 1, cos non-increasing,
    // self excluded
    assert(out.length == 50)
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).toSeq == (1L to 5L))
      val coss = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b })
      assert(!rows.exists(_.getLong(2) == q))
    }
    // exact local recompute of query 0's ranking over the whole corpus
    def hist(id: Long): Array[Long] = {
      def metaHash(k: Int): Long = (id + k) * 2654435761L % 4294967296L
      val w = (metaHash(0) % 64 + 32).toInt; val h = (metaHash(1) % 64 + 32).toInt
      val out = new Array[Long](16)
      (0 until w * h * 3).foreach { k =>
        out((((id + k * 2654435761L) % 256L) >> 4).toInt) += 1
      }
      out
    }
    val q0 = hist(0L)
    val expected = (1L until 500L).map { id =>
      val c = hist(id)
      val num = q0.zip(c).map { case (a, b) => a * b }.sum
      val cos = BigDecimal(num.toDouble /
          (math.sqrt(q0.map(x => x * x).sum.toDouble) *
            math.sqrt(c.map(x => x * x).sum.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, cos)
    }.sortBy { case (id, cos) => (-cos, id) }.take(5)
    val got = out.filter(_.getLong(0) == 0L).sortBy(_.getLong(1))
      .map(r => (r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected, s"query-0 ranking mismatch: $got vs $expected")
  }

  test("multimodal pack: decoded media terms add to the budget; offsets telescope") {
    import graft.ext.TrainingSet
    val docs = Tables.documents(spark, sfDir)
    val counts = Multimodal.multimodalTokenCounts(docs)
    // media adds patches∈[4,36] + windows∈[1,9] + frames∈[1,5] on top
    // of the text tokens — bounds from the metadata formula ranges
    val withText = counts.join(
      docs.select(col("doc_id"),
        TrainingSet.tokenCount(col("text")).as("t")), "doc_id").collect()
    assert(withText.length == 500)
    withText.foreach { r =>
      val extra = r.getLong(1) - r.getLong(2)
      assert(extra >= 6L && extra <= 50L, s"media token term out of range: $r")
    }
    // pack invariants: within each shard (ordered by sk, doc_id)
    // offsets telescope by n_tokens and bins are the offset div budget
    val packed = TrainingSet.packCounts(counts, budget = 768L).collect()
    packed.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val ord = rows.sortBy(r =>
        ((r.getLong(0) * 40503L) % 65521L, r.getLong(0)))
      var off = 0L
      ord.foreach { r =>
        assert(r.getLong(4) == off, s"offset must telescope: $r")
        assert(r.getLong(2) == off / 768L, s"bin must be offset div budget: $r")
        off += r.getLong(3)
      }
    }
  }

  test("metadata-only stages do not carry the payload column") {
    val resized = Multimodal.resizeMeta(media, 48)
      .select("doc_id", "out_width", "out_height")
    val optimized = resized.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("media"),
      s"resize meta plan should prune the binary column:\n$optimized")
  }
}
