package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contention guard's pure decision rules, pinned against
  * the two historical pollution incidents they were built from.
  */
class BenchGuardsSpec extends AnyFunSuite {
  import Bench.Guards

  test("the r4 driver incident (load 3.0→15.5 on 32 cpus) flags contaminated") {
    assert(!Guards.busyStart(3.0, 32)) // start looked fine...
    assert(Guards.contaminated(3.0, 15.5, 32)) // ...the climb does not
  }

  test("an idle judge-style run (0.6→1.8 on 32 cpus) stays clean") {
    assert(!Guards.contaminated(0.6, 1.8, 32))
  }

  test("busy start alone flags, even if the end looks calm") {
    assert(Guards.busyStart(6.0, 32))
    assert(Guards.contaminated(6.0, 1.0, 32))
  }

  test("the end threshold is looser than the start threshold") {
    // cpus/8 < load <= cpus/4: suspicious at start, tolerated at end
    assert(Guards.contaminated(5.0, 1.0, 32))
    assert(!Guards.contaminated(1.0, 7.0, 32))
  }

  test("retry triggers on >3x iteration spread, never on failures") {
    assert(Guards.needsRetry(Seq(0.2, 0.7)))
    assert(!Guards.needsRetry(Seq(0.5, 0.6)))
    assert(!Guards.needsRetry(Seq(-1.0, 10.0))) // failed query: report -1, don't retry
  }
}
