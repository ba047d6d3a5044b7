package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Y4M (YUV4MPEG2) codec kernel — the THIRD real multimodal decode,
  * completing the image ([[PpmKernel]]) / audio ([[WavKernel]]) / video
  * trio. Uncompressed Y4M is pure public-knowledge byte layout: one
  * ASCII parameter line (`YUV4MPEG2 W.. H.. F..:.. Ip A1:1 C444\n`),
  * then per frame a `FRAME\n` marker followed by three full planes
  * (Y, U, V — C444 means no chroma subsampling, so each plane is
  * `w·h` bytes). No codec library needed: [[synth]] emits a well-formed
  * stream from a deterministic integer byte formula, and [[decode]]
  * parses the HEADER BYTES and frame markers (not the formula) and
  * folds the plane bytes into integer stats in one pass. Both sides are
  * plain long arithmetic, so a SQL oracle replaying the generative
  * formula must agree bit-for-bit with what the decoder recovers.
  *
  * The decoder is strict canonical-header: exactly the parameter set
  * `W<w> H<h> F<num>:1 Ip A1:1 C444` in that order (integer frame
  * rates only, square pixels, progressive, 4:4:4), every frame
  * introduced by `FRAME\n` with no frame parameters, and the payload
  * length exactly `nFrames·(6 + 3·w·h)`. Anything else returns null
  * (cast-or-null parse semantics — the P7 ingest discipline applied to
  * media, same as the other two kernels).
  */
object Y4mKernel {

  /** Luma histogram bins: byte value div 16 → 16 bins. */
  val HistBins = 16

  /** Caps on a corrupt header's allocation and the synth payload. */
  val MaxDim = 4096
  val MaxFrames = 256
  val MaxFps = 120

  private val Mult = 2654435761L // Knuth multiplicative constant

  private val Magic = "YUV4MPEG2 W"
  private val FrameMarker = "FRAME\n"

  /** Deterministic canonical Y4M payload: the parameter line, then
    * `nFrames` frames of `FRAME\n` + `3·w·h` plane bytes where the
    * j-th PLANE byte of the whole stream (markers excluded) is
    * `(docId + j·2654435761) mod 256` — so frame f, plane p (0=Y,
    * 1=U, 2=V), in-plane offset i has j = `f·3wh + p·wh + i`, all
    * replayable in ANSI SQL with BIGINT arithmetic.
    */
  def synth(docId: Long, w: Int, h: Int, nFrames: Int, fps: Int): Array[Byte] = {
    require(docId >= 0, s"y4m_synth needs a non-negative doc id: $docId")
    require(w > 0 && w <= MaxDim && h > 0 && h <= MaxDim,
      s"y4m_synth dims out of range (1..$MaxDim): ${w}x$h")
    require(nFrames > 0 && nFrames <= MaxFrames,
      s"y4m_synth frames out of range (1..$MaxFrames): $nFrames")
    require(fps > 0 && fps <= MaxFps,
      s"y4m_synth fps out of range (1..$MaxFps): $fps")
    val header = s"YUV4MPEG2 W$w H$h F$fps:1 Ip A1:1 C444\n"
    val frameLen = 3 * w * h
    // the per-dim caps admit combinations whose TOTAL overflows Int
    // (4096·4096·3·256 ≈ 12.9 GB) — check the product in Long before
    // sizing the array, instead of wrapping into NegativeArraySize
    val total = header.length.toLong + nFrames.toLong * (6L + frameLen)
    require(total <= (1L << 30),
      s"y4m_synth payload too large (${total} bytes > 1 GiB): " +
        s"${w}x$h x$nFrames frames")
    val out = new Array[Byte](total.toInt)
    var off = 0
    def ascii(s: String): Unit = {
      var i = 0
      while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
      off += s.length
    }
    ascii(header)
    var j = 0L
    var f = 0
    while (f < nFrames) {
      ascii(FrameMarker)
      var i = 0
      while (i < frameLen) {
        out(off + i) = ((docId + j * Mult) % 256L).toByte
        i += 1; j += 1
      }
      off += frameLen
      f += 1
    }
    out
  }

  private def hasAscii(b: Array[Byte], off: Int, s: String): Boolean = {
    if (off + s.length > b.length) return false
    var i = 0
    while (i < s.length) {
      if (b(off + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  /** Strict decimal parse at `off`: 1–4 digits, no leading zero,
    * value in [1, max]. Returns `(value << 32) | nextOffset`, or -1.
    */
  private def parseInt(b: Array[Byte], off: Int, max: Int): Long = {
    var i = off
    var v = 0
    while (i < b.length && b(i) >= '0'.toByte && b(i) <= '9'.toByte && i - off < 5) {
      v = v * 10 + (b(i) - '0'.toByte)
      i += 1
    }
    if (i == off || i - off > 4) return -1L
    if (b(off) == '0'.toByte) return -1L // no leading zeros (and no 0)
    if (v < 1 || v > max) return -1L
    (v.toLong << 32) | i.toLong
  }

  /** Strict canonical parse: returns `{w, h, fps, nFrames, headerLen}`
    * or null for anything that is not an integer-fps progressive
    * square-pixel C444 stream whose every frame is a bare `FRAME\n`
    * and whose total length matches exactly.
    */
  def parseHeader(bytes: Array[Byte]): Array[Long] = {
    if (bytes == null || bytes.length < Magic.length + 1) return null
    if (!hasAscii(bytes, 0, Magic)) return null
    var off = Magic.length
    val wp = parseInt(bytes, off, MaxDim)
    if (wp < 0) return null
    val w = (wp >> 32).toInt; off = (wp & 0xFFFFFFFFL).toInt
    if (!hasAscii(bytes, off, " H")) return null
    off += 2
    val hp = parseInt(bytes, off, MaxDim)
    if (hp < 0) return null
    val h = (hp >> 32).toInt; off = (hp & 0xFFFFFFFFL).toInt
    if (!hasAscii(bytes, off, " F")) return null
    off += 2
    val fp = parseInt(bytes, off, MaxFps)
    if (fp < 0) return null
    val fps = (fp >> 32).toInt; off = (fp & 0xFFFFFFFFL).toInt
    if (!hasAscii(bytes, off, ":1 Ip A1:1 C444\n")) return null
    off += 16
    val frameLen = 3L * w * h
    val rem = bytes.length.toLong - off
    val stride = 6L + frameLen
    if (rem <= 0 || rem % stride != 0) return null
    val nFrames = rem / stride
    if (nFrames < 1 || nFrames > MaxFrames) return null
    var f = 0L
    var p = off
    while (f < nFrames) {
      if (!hasAscii(bytes, p, FrameMarker)) return null
      p += (6L + frameLen).toInt
      f += 1
    }
    Array(w.toLong, h.toLong, fps.toLong, nFrames, off.toLong)
  }

  /** Header-only parse: `(width, height, fps, n_frames)` from
    * [[parseHeader]] — O(header + frame markers), no plane-byte fold.
    * The stage that needs only geometry (e.g. shot-boundary
    * thresholds) pays this instead of a full 3-plane stats pass.
    * Returns null for malformed payloads.
    */
  def headerMeta(bytes: Array[Byte]): GenericInternalRow = {
    val hdr = parseHeader(bytes)
    if (hdr == null) return null
    new GenericInternalRow(Array[Any](hdr(0), hdr(1), hdr(2), hdr(3)))
  }

  /** Parse a canonical Y4M payload and fold the plane bytes into
    * integer stats in one pass: `(width, height, fps, n_frames,
    * duration_ms, y_sum, u_sum, v_sum, y_peak, hist[16])` where
    * `duration_ms = nFrames·1000 div fps` (truncating — positive longs,
    * so Spark and DuckDB agree), the three sums fold each plane across
    * ALL frames, `y_peak` is the max luma byte, and `hist[i]` counts
    * luma bytes with `value div 16 = i`. Returns null for malformed
    * payloads ([[parseHeader]]).
    */
  def decode(bytes: Array[Byte]): GenericInternalRow = {
    val hdr = parseHeader(bytes)
    if (hdr == null) return null
    val w = hdr(0).toInt; val h = hdr(1).toInt
    val fps = hdr(2); val nFrames = hdr(3)
    val planeLen = w * h
    val frameLen = 3 * planeLen
    var ySum = 0L; var uSum = 0L; var vSum = 0L; var yPeak = 0L
    val hist = new Array[Long](HistBins)
    var f = 0L
    var off = hdr(4).toInt
    while (f < nFrames) {
      off += 6 // FRAME\n
      var i = 0
      while (i < frameLen) {
        val v = (bytes(off + i) & 0xFF).toLong
        if (i < planeLen) {
          ySum += v
          if (v > yPeak) yPeak = v
          hist((v >> 4).toInt) += 1
        } else if (i < 2 * planeLen) uSum += v
        else vSum += v
        i += 1
      }
      off += frameLen
      f += 1
    }
    new GenericInternalRow(Array[Any](w.toLong, h.toLong, fps, nFrames,
      nFrames * 1000L / fps, ySum, uSum, vSum, yPeak,
      new GenericArrayData(hist.map(v => v: Any))))
  }

  /** REAL nearest-neighbor upscale re-encode: parse a canonical Y4M
    * payload and re-emit it at `(factor·w, factor·h)` — each output
    * plane pixel `(x, y)` copies source pixel `(x div factor,
    * y div factor)`, for all three planes, same fps and frame count.
    * The video analog of an image resize stage: the output is a
    * well-formed canonical stream [[decode]] accepts, whose per-frame
    * luma SUM is exactly `factor²` times the source's (every source
    * pixel is counted `factor²` times), so the normalized frame MEAN
    * is bit-preserved — the invariant the resize-robust dedup tier
    * verifies. Returns null for malformed payloads or a factor that
    * would breach [[MaxDim]] / the 1 GiB payload cap.
    */
  def resizeNn(bytes: Array[Byte], factor: Int): Array[Byte] = {
    if (factor < 1) return null
    val hdr = parseHeader(bytes)
    if (hdr == null) return null
    val w = hdr(0).toInt; val h = hdr(1).toInt
    val fps = hdr(2).toInt; val nFrames = hdr(3).toInt
    val ow = w * factor; val oh = h * factor
    if (ow > MaxDim || oh > MaxDim) return null
    val header = s"YUV4MPEG2 W$ow H$oh F$fps:1 Ip A1:1 C444\n"
    val srcPlane = w * h
    val outPlane = ow * oh
    val total = header.length.toLong + nFrames.toLong * (6L + 3L * outPlane)
    if (total > (1L << 30)) return null
    val out = new Array[Byte](total.toInt)
    var off = 0
    def ascii(s: String): Unit = {
      var i = 0
      while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
      off += s.length
    }
    ascii(header)
    var src = hdr(4).toInt
    var f = 0
    while (f < nFrames) {
      src += 6 // source FRAME\n
      ascii(FrameMarker)
      var p = 0
      while (p < 3) {
        var y = 0
        while (y < oh) {
          val srcRow = src + p * srcPlane + (y / factor) * w
          var x = 0
          while (x < ow) {
            out(off) = bytes(srcRow + x / factor)
            off += 1; x += 1
          }
          y += 1
        }
        p += 1
      }
      src += 3 * srcPlane
      f += 1
    }
    out
  }

  /** Per-frame luma sums for every `every`-th frame (0, every, 2·every,
    * …) — the REAL frame-sampling stage: each sampled frame's Y plane
    * is folded from the payload bytes, so element `i` of the result is
    * the luma sum of frame `i·every`. Returns null for malformed
    * payloads; `every` must be positive.
    */
  def frameYSums(bytes: Array[Byte], every: Int): GenericArrayData = {
    if (every <= 0) return null
    val hdr = parseHeader(bytes)
    if (hdr == null) return null
    val w = hdr(0).toInt; val h = hdr(1).toInt
    val nFrames = hdr(3).toInt
    val planeLen = w * h
    val stride = 6 + 3 * planeLen
    val base = hdr(4).toInt
    val n = (nFrames + every - 1) / every
    val out = new Array[Long](n)
    var s = 0
    while (s < n) {
      val off = base + s * every * stride + 6
      var sum = 0L
      var i = 0
      while (i < planeLen) {
        sum += (bytes(off + i) & 0xFF).toLong
        i += 1
      }
      out(s) = sum
      s += 1
    }
    new GenericArrayData(out.map(v => v: Any))
  }
}
