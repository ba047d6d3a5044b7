package graft

import org.scalatest.funsuite.AnyFunSuite

/** The retime protocol's selection/ordering logic, driven with a
  * synthetic reproduction of the r13 gate failure: a host-stall window
  * covering the END of the first pass inflated `w5_window_suite` to
  * 12.4 s, and the old biggest-first retry ran it again SECONDS later —
  * inside the same window — recording 11.6 s against an idle-host truth
  * of 0.99 s. The protocol now (a) retries earliest-started first, so a
  * late-suite outlier gets the whole retry pass as separation, and
  * (b) gives any retry that improved < 20% one final attempt at the
  * very end.
  */
class BenchSpec extends AnyFunSuite {

  // A 158-query-suite miniature: three queries, starts 0 s / 60 s /
  // 120 s into the pass; a stall window over [110 s, ∞) inflates the
  // late query only.
  private val earlyFine = ("a_early", 0.4, 1000L)
  private val midOutlier = ("m_mid", 3.0, 60000L)
  private val lateStalled = ("z_late", 12.4, 120000L)
  private val firstPass = Seq(lateStalled, earlyFine, midOutlier)
  private def floor(name: String): Double = 1.5

  test("retry order is first-pass-start order, not biggest-first") {
    // biggest-first would put z_late (12.4 s) first — right back into
    // its stall window; start order retries it LAST.
    assert(Bench.retryOrder(firstPass, floor) == Seq("m_mid", "z_late"))
  }

  test("sub-floor and failed queries are never retried") {
    val withFailure = firstPass :+ (("f_failed", -1.0, 30000L))
    assert(!Bench.retryOrder(withFailure, floor).contains("a_early"))
    assert(!Bench.retryOrder(withFailure, floor).contains("f_failed"))
  }

  test("a retry inside the same stall window earns a third pass") {
    // z_late's retry ran adjacent to its stalled first pass: 11.6 s is
    // a < 20% improvement on 12.4 s while still over the floor — the
    // r13 signature. m_mid's retry confirmed its first pass is real
    // work at 2.9 s? No: 2.9 > 0.8·3.0 ⇒ also unimproved, also third
    // pass (bounded by the shared budget; a genuinely-slow query costs
    // one extra sample, a stall is recovered).
    val retried = Map("z_late" -> 11.6, "m_mid" -> 2.9)
    assert(Bench.thirdPassCandidates(firstPass, retried, floor) ==
      Seq("m_mid", "z_late"))
  }

  test("an improved or sub-floor retry ends the protocol") {
    // the idle-window retry recovered the truth (0.99 s) — no third
    // pass; and a retry landing under the floor needs no further proof
    val recovered = Map("z_late" -> 0.99, "m_mid" -> 1.2)
    assert(Bench.thirdPassCandidates(firstPass, recovered, floor).isEmpty)
  }

  test("drift-normalized floors: a uniformly hot host flags nothing") {
    // the r15 observation in miniature: identical code, every query a
    // uniform ~1.31× over its committed history — the absolute 1.3×
    // floor retimed 44/180 of these; the drift floor must flag ZERO
    val hist = (1 to 20).map(i => s"q$i" -> (0.2 + i * 0.1)).toMap
    val hot = hist.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((n, h), i) => (n, 1.31 * h, i * 1000L)
    }
    val drift = Bench.driftScalar(hot, hist)
    assert(math.abs(drift - 1.31) < 0.02, s"drift=$drift")
    def floor(n: String) = Bench.historyFloor(hist(n), drift)
    assert(Bench.retryOrder(hot, floor).isEmpty,
      "uniform host drift must not spend the retry budget")
    // ...while a genuine single-query 3× regression ON the same hot
    // host (measured 1.31 × 3 × h) still exceeds its drifted floor
    val regressed = hot.map { case (n, s, t) =>
      if (n == "q15") (n, s * 3, t) else (n, s, t) }
    val drift2 = Bench.driftScalar(regressed, hist)
    def floor2(n: String) = Bench.historyFloor(hist(n), drift2)
    assert(Bench.retryOrder(regressed, floor2) == Seq("q15"),
      "a real regression must still be caught on a hot host")
  }

  test("drift scalar is capped: a uniform code regression cannot vanish into it") {
    // a change that slows EVERY query 3× is indistinguishable from
    // host heat by the median alone — the cap (1.5, above the VM's
    // observed thermal band) stops the floors from stretching with it,
    // so the regressed queries DO flag and the slowdown surfaces in
    // retimed counts + totals instead of disappearing (r16 advice).
    // Detection threshold for a UNIFORM slowdown is cap×multiplier =
    // 2.25×; between the thermal band and that line the retime gate
    // stays quiet by design and the engine-independent probe_ratio in
    // the bench line is the signal that says which case it was.
    val hist = (1 to 20).map(i => s"q$i" -> (0.5 + i * 0.1)).toMap
    val slowCode = hist.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((n, h), i) => (n, 3.0 * h, i * 1000L)
    }
    val drift = Bench.driftScalar(slowCode, hist)
    assert(drift == 1.5, s"scalar must cap at 1.5, got $drift")
    def floor(n: String) = Bench.historyFloor(hist(n), drift)
    val flagged = Bench.retryOrder(slowCode, floor)
    assert(flagged.size == 20,
      s"a uniform 3x regression must flag everywhere, got ${flagged.size}")
    // the probe is engine-independent and strictly positive
    val p = Bench.hostProbe()
    assert(p > 0.0 && p < 30.0, s"probe out of range: $p")
  }

  test("drift replay of the committed r15 hot-host line") {
    // the real data the protocol change exists for: the r15 driver
    // gate line (uniformly hot) against the committed builder history
    // tolerant of both line formats: the builder's compact stdout line
    // and the driver's pretty-printed wrapper (whose tail keeps only
    // the ~39 most expensive queries — the biased-expensive subset is
    // exactly where the old floors burned the retry budget)
    def queriesOf(path: String): Map[String, Double] = {
      val f = new java.io.File(path)
      if (!f.exists) return Map.empty
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val qIdx = text.indexOf("\"queries\"")
      if (qIdx < 0) return Map.empty
      val open = text.indexOf('{', qIdx)
      val end = if (open < 0) -1 else text.indexOf('}', open)
      if (end < 0) return Map.empty
      "\"([^\"]+)\"\\s*:\\s*(-?[0-9.]+)".r
        .findAllMatchIn(text.substring(open + 1, end))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
    val hot = queriesOf("BENCH_r15.json")
    val hist = Bench.mergeHistories(Seq(
      queriesOf("BENCH_r15_builder.json"),
      queriesOf("bench_history/BENCH_r14_builder.json")))
    assume(hot.nonEmpty && hist.nonEmpty, "committed lines not present")
    val pass = hot.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((n, s), i) => (n, s, i * 1000L) }
    val drift = Bench.driftScalar(pass, hist)
    assert(drift > 1.1, s"the r15 line was hot; drift=$drift")
    def floor(n: String) =
      hist.get(n).filter(_ > 0).fold(1.5)(h => Bench.historyFloor(h, drift))
    val flagged = Bench.retryOrder(pass, floor)
    // the old protocol flagged 44 of these; drift normalization must
    // cut the false-positive storm to a handful of genuine outliers
    assert(flagged.size <= 8, s"still ${flagged.size} flagged: $flagged")
    // and a synthetic 2.5× regression planted on one mid-pack query of
    // the SAME hot line is still caught
    val victim = pass.filter(p => hist.contains(p._1)).apply(pass.size / 2)._1
    val planted = pass.map { case (n, s, t) =>
      if (n == victim) (n, s * 2.5, t) else (n, s, t) }
    val drift3 = Bench.driftScalar(planted, hist)
    def floor3(n: String) =
      hist.get(n).filter(_ > 0).fold(1.5)(h => Bench.historyFloor(h, drift3))
    assert(Bench.retryOrder(planted, floor3).contains(victim),
      s"planted regression on $victim not caught")
  }

  test("history floors take the per-query min over builder lines") {
    // one clean line in the two-line window keeps a loaded-host line
    // (every number ~1.35x hot) from inflating the floors
    val hot = Map("q1" -> 1.35, "q2" -> 6.75, "q3" -> 2.0)
    val clean = Map("q1" -> 1.0, "q2" -> 5.0)
    val merged = Bench.mergeHistories(Seq(hot, clean))
    assert(merged == Map("q1" -> 1.0, "q2" -> 5.0, "q3" -> 2.0))
  }

  test("recorded failures contribute no history floor") {
    assert(Bench.mergeHistories(Seq(Map("q" -> -1.0))).isEmpty)
    assert(Bench.mergeHistories(Seq(Map("q" -> -1.0), Map("q" -> 2.0))) ==
      Map("q" -> 2.0))
  }
}
