package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench's contention self-identification: the record must tag itself
  * when reps show the measured external-load signature (wall up,
  * task-total flat) and must NOT tag honest regressions (wall and
  * task-total up together) or ordinary quiet-run wobble. */
class BenchContentionSpec extends AnyFunSuite {

  private def q(name: String, reps: (Double, Double)*) =
    name -> Some(reps.toSeq)

  test("quiet run: small wobble is not contention") {
    val (per, spread, flag) = Bench.contentionStats(Seq(
      q("q1", (1.00, 20.0), (1.05, 20.3), (1.10, 20.1)),
      q("q2", (0.20, 2.0), (0.25, 2.1), (0.22, 2.0)),
      q("q3", (5.00, 80.0), (5.40, 81.0), (5.20, 80.5))))
    assert(per.isEmpty && spread == 0.0 && !flag)
  }

  test("r8-style single burst: one rep 16x wall at flat taskTotal tags the record") {
    // q143's measured profile: ~0.9 s wall, ~21 s task CPU; the outlier
    // rep read ~16 s wall with taskTotal unchanged
    val (per, spread, flag) = Bench.contentionStats(Seq(
      q("q143", (0.92, 21.0), (16.1, 22.5), (0.95, 20.8)),
      q("q20", (0.19, 1.2), (0.21, 1.2), (0.20, 1.3))))
    assert(per.map(_._1) == Seq("q143"))
    assert(spread > 15.0 && flag)
  }

  test("r10-style smear: many cheap queries +1-3 s at flat taskTotal tags the record") {
    val smeared = (1 to 12).map(i =>
      q(s"q$i", (0.5, 3.0), (2.5, 3.2), (0.55, 3.1)))
    val (per, _, flag) = Bench.contentionStats(smeared)
    assert(per.size == 12 && flag)
  }

  test("honest regression: wall up WITH taskTotal up is not tagged") {
    // a real plan regression reproduces its cost in task time
    val (per, _, flag) = Bench.contentionStats(Seq(
      q("q65", (3.0, 60.0), (9.0, 185.0), (8.8, 180.0)),
      q("q20", (0.2, 1.2), (0.21, 1.2), (0.2, 1.2))))
    assert(per.isEmpty && !flag)
  }

  test("failed queries and sub-floor noise are ignored") {
    val (per, spread, flag) = Bench.contentionStats(Seq(
      "qboom" -> None,
      // +0.25 s on a 0.05 s query is under the 0.3 s absolute floor
      q("qtiny", (0.05, 0.4), (0.30, 0.45), (0.06, 0.4))))
    assert(per.isEmpty && spread == 0.0 && !flag)
  }
}
