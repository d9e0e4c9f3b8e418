package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contention guard's pure decision rules, pinned against
  * the three historical pollution incidents they were built from.
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

  test("the judge's idle r5 re-run (2.5→2.4 — sbt/JVM startup load) stays clean") {
    // this is why the start threshold is cpus/8, not cpus/16: the
    // 1-minute load on an idle box still carries the launcher's wake
    assert(!Guards.contaminated(2.5, 2.4, 32))
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

  test("a long single-key bench's own load does not flag; external load on top does") {
    // r17 per-key ladder incident: dedup_incremental_exact ran ~5 min
    // of 32-thread work and was refused at loadEnd 20.6 on an idle box
    // — the load was ALL self. With measured self cores the guard must
    // pass it, and must still flag the same end load when the process
    // itself was mostly idle (the load is someone else's).
    assert(!Guards.contaminated(3.5, 20.6, 32, selfCores = 26.0))
    assert(Guards.contaminated(3.5, 20.6, 32, selfCores = 2.0))
    // selfCores = 0 reproduces the old absolute rule (r4 incident)
    assert(Guards.contaminated(3.0, 15.5, 32))
  }

  test("retry triggers on >3x iteration spread, never on failures") {
    assert(Guards.needsRetry(allOk = true, Seq(0.2, 0.7)))
    assert(!Guards.needsRetry(allOk = true, Seq(0.5, 0.6)))
    // failed query: report an error, don't retry — and a legitimate
    // timing can never collide with a failure sentinel (there is none)
    assert(!Guards.needsRetry(allOk = false, Seq(10.0, 10.0)))
  }

  test("the r5 incident (sub-threshold load, 36% inflated total) flags via the relative axis") {
    // per-query shape of the r5 artifact vs the judge's idle re-run:
    // every common query uniformly ~1.36× slower
    val idle = (1 to 20).map(i => s"q$i" -> 0.5).toMap
    val loaded = idle.view.mapValues(_ * 1.36).toMap
    val ratio = Guards.commonRatio(loaded, idle)
    assert(ratio.exists(r => r > 1.35 && r < 1.37))
    assert(Guards.inflated(ratio))
    // and the idle re-run against the same baseline stays clean
    assert(!Guards.inflated(Guards.commonRatio(idle, idle)))
  }

  test("new queries cannot fake a regression: ratio is over COMMON queries only") {
    val base = (1 to 20).map(i => s"q$i" -> 0.5).toMap
    val cur = base ++ Map("q_new_expensive" -> 30.0)
    assert(Guards.commonRatio(cur, base).exists(r => r > 0.99 && r < 1.01))
  }

  test("errored queries are excluded from both sides of the ratio") {
    val base = (1 to 20).map(i => s"q$i" -> 0.5).toMap + ("qf" -> 9.0)
    val cur = base.view.mapValues(identity).toMap + ("qf" -> -1.0)
    assert(Guards.commonRatio(cur, base).exists(r => r > 0.99 && r < 1.01))
  }

  test("too few common queries yields no verdict, not a false one") {
    assert(Guards.commonRatio(Map("a" -> 1.0), Map("a" -> 0.1)).isEmpty)
    assert(!Guards.inflated(None))
  }

  test("artifact per-query parse round-trips the bench's own grammar") {
    val json = """{"metric":"total","value":1.5,"unit":"sec","contaminated":false,""" +
      """"queries":{"q1_agg":0.25,"q2":-1.0,"q3":1.2E-4},"errors":["q2"],"sf":"/x"}"""
    val m = Bench.parseQueryTimes(json)
    assert(m == Map("q1_agg" -> 0.25, "q2" -> -1.0, "q3" -> 1.2e-4))
  }

  test("fixed floor sums the streaming+sink+maintenance families only, excluding errors") {
    val times = Map(
      "stream_dedup" -> 2.0, "stream_sessionize" -> 1.5,
      "sink_upsert_partitioned" -> 3.0, "sink_jdbc_insert" -> -1.0,
      "maintain_vacuum" -> 2.5,
      "dedup_exact" -> 9.0, "ann_ivf" -> 4.0)
    assert(Guards.isFixedFloor("stream_windowed_counts"))
    assert(Guards.isFixedFloor("sink_csv"))
    // maintenance rows time the swap/vacuum write protocol, not a
    // corpus-sized computation — floor family since round 11
    assert(Guards.isFixedFloor("maintain_vacuum_pinned"))
    assert(!Guards.isFixedFloor("dedup_exact"))
    // 2.0 + 1.5 + 3.0 + 2.5; the errored sink (-1) must not deflate
    // the sum, and compute rows stay out of the floor entirely
    assert(Guards.fixedFloorSeconds(times) == 9.0)
  }

  test("per-query axis: the r11 window rows re-run at end of bench, small rows don't") {
    // the failure the total-ratio gate structurally missed in r11: a
    // ~19 s transient window covered BOTH iterations of four
    // consecutive rows and the common ratio (1.2455) squeaked under
    // the 1.25 gate. Each committed r11 row vs its isolated re-run:
    assert(Guards.slowVsBaseline(8.05, 0.66), "mm_resize 8.05 vs 0.66 must re-run")
    assert(Guards.slowVsBaseline(4.47, 0.65), "mm_audio_decode 4.47 vs 0.65 must re-run")
    // the two rows a 3x fence would MISS — why the rule went to 2.5x
    assert(Guards.slowVsBaseline(7.19, 2.45), "dedup_incremental 7.19 vs 2.45 (2.93x) must re-run")
    assert(Guards.slowVsBaseline(1.55, 0.55), "ann_lsh_quantized 1.55 vs 0.55 (2.8x) must re-run")
    // the r14 count-anchor pollution the 2.5x fence let through — why
    // the rule is 2x since r15: pipeline_pretrain rode a loading box
    // at 2.29x its committed baseline with ~4 s absolute excess
    assert(Guards.slowVsBaseline(7.35, 3.21), "pipeline_pretrain 7.35 vs 3.21 (2.29x) must re-run")
    assert(Guards.slowVsBaseline(4.93, 2.35), "stream_join_attrib 4.93 vs 2.35 (2.1x) must re-run")
    // just under the ratio fence: sub-2x drift is round-over-round noise
    assert(!Guards.slowVsBaseline(1.05, 0.55))
    assert(!Guards.slowVsBaseline(3.80, 2.00), "1.9x with excess is still under the fence")
    // 3x of a tiny row is noise, not a window: both fences hold
    assert(!Guards.slowVsBaseline(0.30, 0.04), "base under 50 ms carries no signal")
    assert(!Guards.slowVsBaseline(0.60, 0.15), "sub-0.5 s excess is jitter")
    // failed queries are surfaced via errors, never re-timed here
    assert(!Guards.slowVsBaseline(-1.0, 2.0))
    // a genuinely regressed query also re-runs — and will reproduce
    // its slow time at end of bench, keeping the regression visible
    assert(Guards.slowVsBaseline(9.0, 2.0))
  }

  test("a baseline is usable only at the same sf AND cpu count, and only if clean") {
    def art(sf: String, cpus: Int, dirty: Boolean) =
      s"""{"metric":"total","value":1.0,"unit":"sec","contaminated":$dirty,""" +
        s""""queries":{"a":1.0},"errors":[],"sf":"$sf","env":{"cpus":$cpus,"gc_ms":1}}"""
    assert(Bench.baselineMatches(art("/x", 32, dirty = false), "/x", "32"))
    // a local[4] artifact must never judge a local[32] run (or vice
    // versa): the ratio would measure parallelism, not contention
    assert(!Bench.baselineMatches(art("/x", 4, dirty = false), "/x", "32"))
    assert(!Bench.baselineMatches(art("/y", 32, dirty = false), "/x", "32"))
    assert(!Bench.baselineMatches(art("/x", 32, dirty = true), "/x", "32"))
  }

  test("count and full-plan artifacts are separate baseline epochs") {
    def art(mode: Option[String]) =
      s"""{"metric":"total","value":1.0,"unit":"sec",""" +
        mode.map(m => s""""mode":"$m",""").getOrElse("") +
        s""""contaminated":false,"queries":{"a":1.0},"errors":[],""" +
        s""""sf":"/x","env":{"cpus":32,"gc_ms":1}}"""
    // a full-plan run times different work per query (toRdd vs a
    // prunable count aggregate) — cross-mode guarding would flag every
    // full run as ~1.4x inflated against the count series
    assert(Bench.baselineMatches(art(Some("count")), "/x", "32", "count"))
    assert(Bench.baselineMatches(art(Some("full")), "/x", "32", "full"))
    assert(!Bench.baselineMatches(art(Some("full")), "/x", "32", "count"))
    assert(!Bench.baselineMatches(art(Some("count")), "/x", "32", "full"))
    // pre-mode artifacts (rounds <= 13) are count-mode by construction
    assert(Bench.baselineMatches(art(None), "/x", "32", "count"))
    assert(!Bench.baselineMatches(art(None), "/x", "32", "full"))
  }

  test("a pretty-printed committed artifact still parses and matches") {
    // the r14 full-plan run found NO baseline although
    // artifacts/bench_full_r13.json matched on every axis: the file
    // had been round-tripped through json.dump (": " after colons) and
    // the compact-grammar regexes silently rejected it — breaking the
    // chain for exactly the committed fallback it exists for
    val pretty =
      """{"metric": "total", "value": 1.0, "unit": "sec", "mode": "full",
        | "contaminated": false,
        | "queries": {"a": 0.25, "b": 1.2E-4},
        | "errors": [], "sf": "/x",
        | "env": {"cpus": 32, "gc_ms": 1}}""".stripMargin
    assert(Bench.baselineMatches(pretty, "/x", "32", "full"))
    assert(Bench.parseQueryTimes(pretty) == Map("a" -> 0.25, "b" -> 1.2e-4))
    assert(!Bench.baselineMatches(pretty, "/x", "32", "count"))
    assert(!Bench.baselineMatches(pretty, "/x", "4", "full"))
  }

  test("committed artifacts resolve newest-round-first") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bench_art")
    def put(name: String): Unit =
      java.nio.file.Files.writeString(dir.resolve(name), "{}")
    put("bench_r9.json"); put("bench_r13.json"); put("bench_r12.json")
    put("bench_full_r13.json"); put("notes.txt")
    val got = Bench.committedArtifacts(dir.toString).map(p =>
      new java.io.File(p).getName)
    // r13 artifacts (either series) ahead of r12 ahead of r9; the
    // non-artifact file never enters the chain. loadBaseline's
    // baselineMatches mode check picks the right series from the pair.
    assert(got.size == 4 && !got.contains("notes.txt"))
    assert(got.take(2).toSet == Set("bench_r13.json", "bench_full_r13.json"))
    assert(got(2) == "bench_r12.json" && got(3) == "bench_r9.json")
    // absent directory: empty chain, not a throw
    assert(Bench.committedArtifacts(dir.resolve("nope").toString).isEmpty)
  }
}
