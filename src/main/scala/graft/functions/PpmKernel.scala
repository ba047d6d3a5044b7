package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** P6 (binary PPM) codec kernel — the REAL decode behind the multimodal
  * stage. PPM is pure public-knowledge byte arithmetic (magic + ASCII
  * dims + maxval header, then `w·h·3` interleaved RGB bytes), so the
  * container needs no codec library: [[synth]] emits a well-formed P6
  * payload from a deterministic integer pixel formula, and [[decode]]
  * parses the HEADER BYTES (not the formula) and folds the raster into
  * integer stats in one pass. Both sides are plain long arithmetic, so
  * a SQL oracle replaying the generative formula must agree bit-for-bit
  * with what the decoder recovers from the payload — which is exactly
  * the hash-compare the driver gate runs.
  *
  * The decoder is strict single-image P6: one whitespace run between
  * header fields, no `#` comments, maxval exactly 255, raster length
  * exactly `w·h·3`. Anything else returns null (cast-or-null parse
  * semantics — the P7 ingest discipline applied to media).
  */
object PpmKernel {

  /** Histogram bins: pixel value div 16 → 16 bins. */
  val HistBins = 16

  /** Largest accepted side length — caps a malicious/corrupt header's
    * `w·h·3` allocation (decode) and the synth payload (64 MiB ceiling).
    */
  val MaxSide = 4096

  /** Deterministic P6 payload: `"P6\n<w> <h>\n255\n"` header followed by
    * `w·h·3` raster bytes with byte k = `(docId + k·2654435761) mod 256`
    * (the Knuth multiplicative constant, same family as the metadata
    * hash — replayable in ANSI SQL with BIGINT arithmetic).
    */
  def synth(docId: Long, w: Int, h: Int): Array[Byte] = {
    require(docId >= 0, s"ppm_synth needs a non-negative doc id: $docId")
    require(w > 0 && h > 0 && w <= MaxSide && h <= MaxSide,
      s"ppm_synth dims out of range (1..$MaxSide): ${w}x$h")
    val header = ("P6\n" + w + " " + h + "\n255\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val n = w * h * 3
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var k = 0
    while (k < n) {
      out(header.length + k) = ((docId + k * 2654435761L) % 256L).toByte
      k += 1
    }
    out
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r'

  /** Strict P6 header parse shared by the stats and pooling kernels:
    * returns `{width, height, rasterOffset}` or null for anything that
    * is not a single-image maxval-255 P6 payload with an exact-length
    * raster (bad magic, non-numeric dims, truncated/oversized raster).
    */
  /** Header-only parse: `(width, height)` from [[parseHeader]] —
    * O(header), no raster fold; for stages that need only geometry
    * (patch-count budgeting, resize planning). Null when malformed.
    */
  def headerMeta(bytes: Array[Byte]): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val hdr = parseHeader(bytes)
    if (hdr == null) return null
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](hdr(0), hdr(1)))
  }

  def parseHeader(bytes: Array[Byte]): Array[Long] = {
    if (bytes == null || bytes.length < 12) return null
    if (bytes(0) != 'P' || bytes(1) != '6') return null
    var i = 2
    val vals = new Array[Long](3)
    var f = 0
    while (f < 3) {
      // at least one whitespace byte, then a digit run
      if (i >= bytes.length || !isWs(bytes(i))) return null
      while (i < bytes.length && isWs(bytes(i))) i += 1
      if (i >= bytes.length || bytes(i) < '0' || bytes(i) > '9') return null
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0')
        if (v > MaxSide.toLong * MaxSide) return null
        i += 1
      }
      vals(f) = v
      f += 1
    }
    // exactly ONE whitespace byte between maxval and the raster (the
    // P6 spec's single-whitespace rule — raster bytes may themselves
    // look like whitespace, so no run-skipping here)
    if (i >= bytes.length || !isWs(bytes(i))) return null
    i += 1
    val w = vals(0)
    val h = vals(1)
    if (vals(2) != 255L || w < 1 || h < 1 || w > MaxSide || h > MaxSide)
      return null
    if ((bytes.length - i).toLong != w * h * 3L) return null
    Array(w, h, i.toLong)
  }

  /** Parse a P6 payload and fold the raster into integer stats in one
    * pass: `(width, height, r_sum, g_sum, b_sum, hist[16])` where the
    * sums are per-channel byte-value totals (channel = raster index mod
    * 3) and `hist[i]` counts raster bytes with value div 16 = i. Returns
    * null for malformed payloads ([[parseHeader]]) — the caller
    * surfaces that as a NULL row, never a crash.
    */
  def decode(bytes: Array[Byte]): GenericInternalRow = {
    val hdr = parseHeader(bytes)
    if (hdr == null) return null
    val w = hdr(0)
    val h = hdr(1)
    val n = w * h * 3L
    val off = hdr(2).toInt
    val nn = n.toInt
    var rs = 0L; var gs = 0L; var bs = 0L
    val hist = new Array[Long](HistBins)
    var k = 0
    while (k + 2 < nn) {
      // unrolled per pixel: channel = k mod 3 without the mod
      val r = bytes(off + k) & 0xFF
      val g = bytes(off + k + 1) & 0xFF
      val b = bytes(off + k + 2) & 0xFF
      rs += r; gs += g; bs += b
      hist(r >> 4) += 1; hist(g >> 4) += 1; hist(b >> 4) += 1
      k += 3
    }
    new GenericInternalRow(Array[Any](w, h, rs, gs, bs,
      new GenericArrayData(hist.map(v => v: Any))))
  }

  /** Tiled average-pooling over the DECODED raster: half-up integral
    * mean byte value (all three channels) per tile of a gridW×gridH
    * tiling — tile of pixel (x, y) is `((y·gridH) div h)·gridW +
    * (x·gridW) div w`, the equi-partition the SQL oracle replays.
    * Returns a row-major `gridW·gridH` long array (−1 marks a tile
    * with no pixels, possible only when a side is smaller than the
    * grid), or null for malformed payloads.
    */
  def tileMeans(bytes: Array[Byte], gridW: Int, gridH: Int): GenericArrayData = {
    val hdr = parseHeader(bytes)
    if (hdr == null) return null
    val w = hdr(0).toInt
    val h = hdr(1).toInt
    val off = hdr(2).toInt
    val nt = gridW * gridH
    val sums = new Array[Long](nt)
    val counts = new Array[Long](nt)
    var y = 0
    while (y < h) {
      val rowTile = (y * gridH / h) * gridW
      val rowOff = off + y * w * 3
      var x = 0
      while (x < w) {
        val t = rowTile + x * gridW / w
        val p = rowOff + x * 3
        sums(t) += (bytes(p) & 0xFF) + (bytes(p + 1) & 0xFF) + (bytes(p + 2) & 0xFF)
        counts(t) += 3
        x += 1
      }
      y += 1
    }
    val means = new Array[Long](nt)
    var i = 0
    while (i < nt) {
      means(i) =
        if (counts(i) == 0) -1L
        else (2L * sums(i) + counts(i)) / (2L * counts(i)) // half-up
      i += 1
    }
    new GenericArrayData(means.map(v => v: Any))
  }
}
