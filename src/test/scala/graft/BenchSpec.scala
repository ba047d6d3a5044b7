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
