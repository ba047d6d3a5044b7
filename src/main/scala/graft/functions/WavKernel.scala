package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** WAV (RIFF/PCM) codec kernel — the SECOND real multimodal decode,
  * mirroring [[PpmKernel]]'s discipline for audio. Canonical 16-bit PCM
  * WAV is pure public-knowledge byte arithmetic (the 44-byte
  * RIFF/fmt/data header layout, then little-endian int16 samples
  * interleaved by channel), so the container needs no codec library:
  * [[synth]] emits a well-formed payload from a deterministic integer
  * sample formula, and [[decode]] parses the HEADER BYTES (not the
  * formula) and folds the sample stream into integer stats in one pass.
  * Both sides are plain long arithmetic, so a SQL oracle replaying the
  * generative formula must agree bit-for-bit with what the decoder
  * recovers from the payload.
  *
  * The decoder is strict canonical-header PCM: exactly the 44-byte
  * RIFF("WAVE") + fmt(16, PCM, 16-bit) + data layout (no extra chunks,
  * no extension words), data length exactly `frames·channels·2`.
  * Anything else returns null (cast-or-null parse semantics — the P7
  * ingest discipline applied to media).
  */
object WavKernel {

  /** Amplitude histogram bins: (sample + 32768) div 4096 → 16 bins. */
  val HistBins = 16

  /** Largest accepted frame count / channel count — caps a corrupt
    * header's allocation and the synth payload size.
    */
  val MaxFrames = 1 << 24
  val MaxChannels = 8
  val MaxSampleRate = 192000

  private val Mult = 2654435761L // Knuth multiplicative constant

  /** Deterministic canonical WAV payload: 44-byte header (RIFF size,
    * PCM fmt, byte rate, block align, data size all derived from the
    * arguments) followed by `frames·channels` little-endian int16
    * samples with sample k = `((docId + k·2654435761) mod 65536) −
    * 32768` — replayable in ANSI SQL with BIGINT arithmetic.
    */
  def synth(docId: Long, frames: Int, channels: Int, sampleRate: Int): Array[Byte] = {
    require(docId >= 0, s"wav_synth needs a non-negative doc id: $docId")
    require(frames > 0 && frames <= MaxFrames,
      s"wav_synth frames out of range (1..$MaxFrames): $frames")
    require(channels > 0 && channels <= MaxChannels,
      s"wav_synth channels out of range (1..$MaxChannels): $channels")
    require(sampleRate > 0 && sampleRate <= MaxSampleRate,
      s"wav_synth sample rate out of range (1..$MaxSampleRate): $sampleRate")
    val n = frames * channels          // samples
    val dataLen = n * 2
    val out = new Array[Byte](44 + dataLen)
    def ascii(off: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def le32(off: Int, v: Long): Unit = {
      out(off) = (v & 0xFF).toByte
      out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte
      out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte
      out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    ascii(0, "RIFF"); le32(4, 36L + dataLen); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16L); le16(20, 1); le16(22, channels)
    le32(24, sampleRate.toLong)
    le32(28, sampleRate.toLong * channels * 2)   // byte rate
    le16(32, channels * 2)                       // block align
    le16(34, 16)                                 // bits per sample
    ascii(36, "data"); le32(40, dataLen.toLong)
    var k = 0
    while (k < n) {
      val v = (((docId + k * Mult) % 65536L) - 32768L).toInt
      le16(44 + 2 * k, v & 0xFFFF)
      k += 1
    }
    out
  }

  private def rdLe32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def rdLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def hasAscii(b: Array[Byte], off: Int, s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (b(off + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  /** Strict canonical-header parse: returns `{channels, sampleRate,
    * frames}` or null for anything that is not a single-fmt single-data
    * 16-bit PCM payload whose derived fields (RIFF size, byte rate,
    * block align, data length) are all internally consistent.
    */
  /** Header-only parse: `(n_channels, sample_rate, n_frames)` from
    * [[parseHeader]] — O(header), no sample fold; for stages that need
    * only the stream geometry (window-count budgeting, duration
    * planning). Null when malformed.
    */
  def headerMeta(bytes: Array[Byte]): GenericInternalRow = {
    val hdr = parseHeader(bytes)
    if (hdr == null) return null
    new GenericInternalRow(Array[Any](hdr(0), hdr(1), hdr(2)))
  }

  def parseHeader(bytes: Array[Byte]): Array[Long] = {
    if (bytes == null || bytes.length < 44) return null
    if (!hasAscii(bytes, 0, "RIFF") || !hasAscii(bytes, 8, "WAVE") ||
        !hasAscii(bytes, 12, "fmt ") || !hasAscii(bytes, 36, "data")) return null
    if (rdLe32(bytes, 16) != 16L) return null          // fmt chunk size
    if (rdLe16(bytes, 20) != 1) return null            // PCM
    val channels = rdLe16(bytes, 22)
    val sampleRate = rdLe32(bytes, 24)
    if (channels < 1 || channels > MaxChannels) return null
    if (sampleRate < 1 || sampleRate > MaxSampleRate) return null
    if (rdLe16(bytes, 34) != 16) return null           // bits per sample
    val blockAlign = channels * 2
    if (rdLe16(bytes, 32) != blockAlign) return null
    if (rdLe32(bytes, 28) != sampleRate * blockAlign) return null // byte rate
    val dataLen = rdLe32(bytes, 40)
    if (dataLen != (bytes.length - 44).toLong) return null
    if (rdLe32(bytes, 4) != 36L + dataLen) return null // RIFF size
    if (dataLen % blockAlign != 0) return null
    val frames = dataLen / blockAlign
    if (frames < 1 || frames > MaxFrames) return null
    Array(channels.toLong, sampleRate, frames)
  }

  /** REAL nearest-neighbor (sample-and-hold) resample re-encode: parse
    * a canonical WAV payload and re-emit it at `factor·sampleRate`
    * with `factor·frames` frames — output frame `f` copies source
    * frame `f div factor` verbatim (all channels), so the duration is
    * preserved and every 1-frame span of source audio is represented
    * by `factor` identical output frames. The audio analog of an image
    * resize: the output is a well-formed canonical payload [[decode]]
    * accepts, whose per-TIME-window `sum_abs` is exactly `factor`
    * times the source's — the rate-normalized invariant the
    * resample-robust dedup tier verifies. Returns null for malformed
    * payloads or a factor that breaches [[MaxFrames]]/[[MaxSampleRate]].
    */
  def resampleNn(bytes: Array[Byte], factor: Int): Array[Byte] = {
    if (factor < 1) return null
    val hdr = parseHeader(bytes)
    if (hdr == null) return null
    val channels = hdr(0).toInt
    val rate = hdr(1)
    val frames = hdr(2)
    val oFrames = frames * factor
    val oRate = rate * factor
    if (oFrames > MaxFrames || oRate > MaxSampleRate) return null
    val out = synth(0L, oFrames.toInt, channels, oRate.toInt)
    var f = 0
    while (f < oFrames) {
      val srcOff = 44 + 2 * (f / factor).toInt * channels
      val dstOff = 44 + 2 * f.toInt * channels
      var c = 0
      while (c < 2 * channels) {
        out(dstOff + c) = bytes(srcOff + c)
        c += 1
      }
      f += 1
    }
    out
  }

  /** Parse a canonical WAV payload and fold the sample stream into
    * integer stats in one pass: `(n_channels, sample_rate, n_frames,
    * duration_ms, c0_sum, all_sum, peak, hist[16])` where `duration_ms
    * = frames·1000 div sampleRate` (truncating — frames and rate are
    * positive, so Spark and DuckDB agree), `c0_sum` sums channel 0,
    * `all_sum` sums every channel, `peak` is the max |sample|, and
    * `hist[i]` counts samples with `(v + 32768) div 4096 = i`. Returns
    * null for malformed payloads ([[parseHeader]]).
    */
  def decode(bytes: Array[Byte]): GenericInternalRow = {
    val hdr = parseHeader(bytes)
    if (hdr == null) return null
    val channels = hdr(0).toInt
    val sampleRate = hdr(1)
    val frames = hdr(2)
    val n = (frames * channels).toInt
    var c0 = 0L; var all = 0L; var peak = 0L
    val hist = new Array[Long](HistBins)
    var k = 0
    while (k < n) {
      val raw = rdLe16(bytes, 44 + 2 * k)
      val v = (if (raw >= 32768) raw - 65536 else raw).toLong
      all += v
      if (k % channels == 0) c0 += v
      val a = if (v < 0) -v else v
      if (a > peak) peak = a
      hist(((v + 32768L) >> 12).toInt) += 1
      k += 1
    }
    new GenericInternalRow(Array[Any](channels.toLong, sampleRate, frames,
      frames * 1000L / sampleRate, c0, all, peak,
      new GenericArrayData(hist.map(v => v: Any))))
  }

  /** Per-window integer folds over the decoded sample stream — the
    * frame-level feature-extract an audio pipeline runs after decode
    * (energy/onset analysis, VAD front-ends): the stream is cut into
    * windows of `windowFrames` frames (the last window may be short),
    * and each yields `(peak, sum_abs)` — max and sum of |sample| over
    * ALL channels in the window. Returns null for malformed payloads
    * or a non-positive window size (quarantine, not failure).
    */
  def windowStats(bytes: Array[Byte], windowFrames: Int): GenericArrayData = {
    if (windowFrames <= 0) return null
    val hdr = parseHeader(bytes)
    if (hdr == null) return null
    val channels = hdr(0).toInt
    val frames = hdr(2).toInt
    // Long ceil-div: frames + windowFrames - 1 wraps negative for
    // window sizes near Int.MaxValue, silently yielding zero windows
    val nWin = ((frames.toLong + windowFrames - 1) / windowFrames).toInt
    val out = new Array[Any](nWin)
    var w = 0
    while (w < nWin) {
      val lo = w * windowFrames * channels
      val hi = math.min((w + 1) * windowFrames, frames) * channels
      var peak = 0L; var sumAbs = 0L
      var k = lo
      while (k < hi) {
        val raw = rdLe16(bytes, 44 + 2 * k)
        val v = (if (raw >= 32768) raw - 65536 else raw).toLong
        val a = if (v < 0) -v else v
        if (a > peak) peak = a
        sumAbs += a
        k += 1
      }
      out(w) = new GenericInternalRow(Array[Any](peak, sumAbs))
      w += 1
    }
    new GenericArrayData(out)
  }
}
