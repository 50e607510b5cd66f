package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-artifact window-contention quarantine (r13, r12 VERDICT #6).
  *
  * The per-query degraded flags (probe > 2x median, in-suite > 2x rerun,
  * canary band) each look at one measurement; a machine that deteriorates
  * DURING the run instead pushes many fresh-JVM drift reruns ABOVE their
  * in-suite times — individually unremarkable, collectively a window whose
  * raw total must not be compared across rounds. `Bench.windowContended`
  * is the pure rule; this spec pins it retroactively on the exact drift
  * pairs the r12 driver artifact published (the window the rule was
  * designed to catch) and on a clean artifact's shape.
  */
class BenchWindowSpec extends AnyFunSuite {

  /** BENCH_r12.json's full drift map (insuite, fresh-JVM rerun), verbatim
    * from the committed artifact's detail tail. 5 of 10 reruns exceed
    * in-suite by >1.3x (q157 7.3->13.3, q204 7.2->10.2, q165, q320, q206)
    * — the "6 of 10 above in-suite" window the r12 verdict ordered
    * quarantined at the artifact level. */
  private val r12Drift: Seq[(Double, Double)] = Seq(
    (11.688, 14.126), // q270_ivfadc_trained_k256
    (10.621, 9.548),  // q244_ivfadc_trained
    (9.610, 9.528),   // q245_bitext_ann
    (8.920, 8.134),   // q278_grid_dbscan
    (8.726, 9.152),   // q97_dedup_clusters
    (8.053, 10.840),  // q165_leakage_safe_split
    (7.325, 13.290),  // q157_dedup_ledger
    (7.155, 10.187),  // q204_ivfadc_refine
    (6.868, 9.286),   // q320_lpa_modularity
    (6.861, 9.935))   // q206_markov_attribution

  test("BENCH_r12's driver drift map retro-triggers window_contended") {
    assert(Bench.windowContended(r12Drift),
      "the r12 contended window must trip the whole-artifact flag")
  }

  test("a clean window (reruns at/below in-suite) does not trigger") {
    val clean = r12Drift.map { case (insuite, _) => (insuite, insuite * 0.95) }
    assert(!Bench.windowContended(clean))
  }

  test("exactly K high reruns is NOT contended; K+1 is (boundary pin)") {
    val base = Seq.fill(6)((5.0, 5.0))
    val k = Bench.WindowContendedK
    val atK = base ++ Seq.fill(k)((5.0, 7.0))
    assert(!Bench.windowContended(atK))
    assert(Bench.windowContended(atK :+ (5.0, 7.0)))
  }

  test("sub-second noise is immaterial regardless of ratio") {
    val noisy = Seq.fill(10)((0.2, 0.9)) // 4.5x but all sub-second
    assert(!Bench.windowContended(noisy))
  }
}
