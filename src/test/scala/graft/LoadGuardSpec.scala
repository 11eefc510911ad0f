package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench load-contamination verdict (VERDICT r9 #2): the r8 guard
  * used only an absolute bar (probe > 1.5× floor), which passed a run
  * whose START probe was loaded and END probe quiet — r9's driver
  * artifact read calibration [0.271, 0.080] (3.4× apart, loadavg
  * 2.8→8.0) and stamped `load_contaminated: false` while ~27 untouched
  * keys carried a +0.3–0.5 s offset. The verdict is a pure function so
  * that exact failure is replayable here. */
class LoadGuardSpec extends AnyFunSuite {

  private val floor = 0.20

  test("r9 driver probes [0.271, 0.080] are flagged by the disagreement rule") {
    // 0.271 < 1.5×0.20 = 0.30, so the r8 absolute rule passed it;
    // 0.271/0.080 = 3.4× disagreement must flag it now.
    assert(Bench.loadVerdict(0.271, 0.080, floor))
  }

  test("disagreement flags in either direction (run ends loaded)") {
    assert(Bench.loadVerdict(0.080, 0.271, floor))
  }

  test("absolute bar still flags a run loaded throughout") {
    // both probes inflated ~2× and AGREEING — the r8 scenario the
    // absolute rule exists for; disagreement alone would miss it
    assert(Bench.loadVerdict(0.42, 0.45, floor))
  }

  test("the measured QUIET pair [0.21, 0.11] passes: warm-up slope sits under the 2x bar") {
    // BASELINE.md's stamped-clean quiet re-run — the start probe pays
    // residual JIT (1.9× the steady probe) even after calibrate()'s
    // double warmup; the disagreement bar must clear it
    assert(!Bench.loadVerdict(0.21, 0.11, floor))
  }

  test("steady-state quiet pair passes comfortably") {
    assert(!Bench.loadVerdict(0.12, 0.08, floor))
  }

  test("r10: fresh-JVM quiet start probe [0.26] with warm end probe passes under the default floor") {
    // measured on an idle box (loadavg 0.24): the start probe reads
    // ~0.26 s from a fresh JVM even after five warmups — whole-JVM
    // warmth, not load. The default floor must clear it (an r10
    // attempt at floor 0.11 false-flagged every such run; the
    // documented trade is that constant ~2× load on a fresh JVM is
    // indistinguishable from this — see CalibrationFloorSec scaladoc)
    assert(!Bench.loadVerdict(0.26, 0.157))
  }

  test("r10 review: a quiet LONG run pairing fresh-JVM start with deep steady state passes") {
    // the floor scaladoc's own physics: start ~0.26 s (fresh JVM,
    // whole-JVM warmth), end 0.09–0.12 s deep into a long run —
    // ratio up to ~2.9. The old 2.0 bar false-flagged exactly the
    // full-inventory artifacts the guard exists to protect; the 3.0
    // bar clears them while r9's 3.4× contaminated pair still flags.
    assert(!Bench.loadVerdict(0.26, 0.09))
    assert(!Bench.loadVerdict(0.26, 0.12))
    assert(Bench.loadVerdict(0.271, 0.080)) // r9 stays caught
  }

  test("floor override scales the absolute bar") {
    // a slower box with floor 0.40: 0.45 agreeing probes are quiet
    assert(!Bench.loadVerdict(0.45, 0.44, 0.40))
    assert(Bench.loadVerdict(0.65, 0.63, 0.40))
  }
}
