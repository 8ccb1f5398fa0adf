package graft

import org.scalatest.funsuite.AnyFunSuite

/** BENCH_BEST ledger parsing (r15): the regression layer keys off
  * this map, and a format drift between the writer (merge_ledgers.py,
  * json.dump with a space after the colon) and the reader (a regex
  * that required NO space) silently produced an EMPTY best-known map —
  * zero flags could ever fire, with no error anywhere. Pin both
  * formats, and pin that the REPO's committed ledger actually parses
  * to its full entry count.
  */
class BenchBestParseSpec extends AnyFunSuite {

  test("compact format (r12-r13 hand-maintained) parses") {
    val m = Bench.parseBestKnown("""{"a1":0.5,"sr11_x":7.19,"wall:b":87.0}""")
    assert(m === Map("a1" -> 0.5, "sr11_x" -> 7.19, "wall:b" -> 87.0))
  }

  test("json.dump format (merge_ledgers.py, space + newlines) parses") {
    val m = Bench.parseBestKnown(
      "{\n \"a1\": 0.5,\n \"sr11_x\": 7.19,\n \"wall:board_concurrent\": 87.0\n}\n")
    assert(m === Map("a1" -> 0.5, "sr11_x" -> 7.19,
      "wall:board_concurrent" -> 87.0))
  }

  test("verdictOf: the shared adjudication rule (plan/drain/wall)") {
    // ambient: the re-measure came back inside the flag threshold.
    assert(Bench.verdictOf(1.0, 0.9, 0.0, 0.0, 1.0, fsyncGated = true) === "ambient")
    // confirmed: still slow alone with every entry gate clean.
    assert(Bench.verdictOf(2.0, 1.0, 0.5, 2.0, 2.0, fsyncGated = true) === "confirmed")
    // unresolved: slow but the re-measure's own environment was dirty
    // (fsync gate only bites the fsync-gated surfaces).
    assert(Bench.verdictOf(2.0, 1.0, 0.5, 2.0, 50.0, fsyncGated = true) === "unresolved")
    assert(Bench.verdictOf(2.0, 1.0, 0.5, 2.0, 50.0, fsyncGated = false) === "confirmed")
    // a failed re-measure (re = -1) can never be ambient or confirmed.
    assert(Bench.verdictOf(-1.0, 1.0, 0.0, 0.0, 1.0, fsyncGated = true) === "unresolved")
  }

  test("round-trip gate (r16): a degraded-scheduler regime cannot mint 'confirmed'") {
    // The measured blind spot: drains 2-7x over best on two
    // code-identical jars with io/cpu/fsync ALL clean — only the
    // driver->executor round trip (127-180 ms/job vs the <=20 ms floor
    // the drain best-knowns imply) saw the regime. Gated surfaces
    // (rtGated) read 'unresolved' there; ungated plan queries are
    // unaffected; and the gate never rescues an ambient verdict.
    assert(Bench.verdictOf(2.0, 1.0, 0.5, 2.0, 2.0, fsyncGated = true,
      rt = 150.0, rtGated = true) === "unresolved")
    assert(Bench.verdictOf(2.0, 1.0, 0.5, 2.0, 2.0, fsyncGated = true,
      rt = 15.0, rtGated = true) === "confirmed")
    assert(Bench.verdictOf(2.0, 1.0, 0.5, 2.0, 2.0, fsyncGated = true,
      rt = 150.0, rtGated = false) === "confirmed")
    assert(Bench.verdictOf(1.0, 0.9, 0.0, 0.0, 1.0, fsyncGated = true,
      rt = 150.0, rtGated = true) === "ambient")
    // a missing probe reading (-1) on a gated surface is not clean.
    assert(Bench.verdictOf(2.0, 1.0, 0.0, 0.0, 1.0, fsyncGated = true,
      rt = -1.0, rtGated = true) === "unresolved")
  }

  test("round-trip gate covers plan/eager kinds (r17, closing the r16 gap)") {
    // The gap the driver's own r16 artifact demonstrated: its lone
    // "confirmed" was a PLAN query (x34_bigram_lm, 1.79x best) minted
    // in a 176 ms/job regime the drain-only rt gate ignored — the
    // judge's re-measure on the same regime acquitted it at 1.20 s.
    // Plan/eager kinds gate with fsyncGated=false (their work never
    // force()s) but rtGated=true: a slow re-measure under a degraded
    // scheduler reads unresolved, never confirmed.
    assert(Bench.verdictOf(2.0, 1.0, 0.5, 2.0, -1.0, fsyncGated = false,
      rt = 150.0, rtGated = true) === "unresolved")
    assert(Bench.verdictOf(2.0, 1.0, 0.5, 2.0, -1.0, fsyncGated = false,
      rt = 15.0, rtGated = true) === "confirmed")
    // A fast re-measure still acquits in ANY regime — contention can
    // only inflate, so ambient needs no rt cleanliness.
    assert(Bench.verdictOf(1.0, 0.9, 0.5, 2.0, -1.0, fsyncGated = false,
      rt = 150.0, rtGated = true) === "ambient")
  }

  test("regressedVsBest carries the absolute jitter floor (the d21 calibration)") {
    // A 148 ms best: warm jitter to 0.30 s must NOT flag — the pure
    // ratio threshold (0.222) sat inside the query's measured warm
    // variance band and produced a factually wrong 'confirmed'.
    assert(!Bench.regressedVsBest(0.30, 0.148))
    // A real regression of the same query (>0.42 s) still flags.
    assert(Bench.regressedVsBest(0.45, 0.148))
    // At drain/wall scale the floor is negligible either way.
    assert(Bench.regressedVsBest(7.0, 4.4))
    assert(!Bench.regressedVsBest(6.0, 4.4))
    // And verdictOf stays symmetric with the flag rule: a re-measure
    // landing just inside the floor is ambient.
    assert(Bench.verdictOf(0.30, 0.148, 0.0, 0.0, 1.0, fsyncGated = false) === "ambient")
  }

  test("cold:-prefixed eager keys parse (r16 key class)") {
    val m = Bench.parseBestKnown(
      "{\n \"cold:v8_compaction\": 1.754,\n \"v8_compaction\": 0.058\n}\n")
    assert(m === Map("cold:v8_compaction" -> 1.754, "v8_compaction" -> 0.058))
  }

  test("every eager-registry query exists on the board") {
    // A renamed/removed query with a stale registry entry would make
    // its cold flag silently impossible — the r15 lesson that guard
    // layers rot without a liveness pin.
    val missing = Bench.EagerPlanQueries -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"EagerPlanQueries not on the board: $missing")
    // And none of them is an sr drain — drains already have their own
    // cold surface; double-flagging one would double-adjudicate it.
    assert(Bench.EagerPlanQueries.forall(!_.startsWith("sr")))
  }

  test("fsync probe targets the resolved replay scratch root (r15 verdict #2)") {
    // The resolution rule itself, unit-tested via the env parameter:
    // an explicit SPARK_GRAFT_SCRATCH pin wins; without it tmpfs or
    // java.io.tmpdir per capacity. The probe allocates under
    // scratchRoot() by construction (Bench.fsyncProbeMsPerOp's default
    // argument), so pinning the resolution pins the probe's device.
    val tmp = java.nio.file.Files.createTempDirectory("graft_scratch_spec_")
    try {
      assert(graft.streaming.ReplayStaging.scratchRoot(
        Map("SPARK_GRAFT_SCRATCH" -> tmp.toString)) === tmp)
      val default = graft.streaming.ReplayStaging.scratchRoot(Map.empty)
      assert(default === java.nio.file.Paths.get("/dev/shm") ||
        default === java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
      // And the probe actually runs against a caller-given root.
      val ms = Bench.fsyncProbeMsPerOp(() => tmp)
      assert(ms > 0)
      // Root RESOLUTION failures degrade to -1 like every other probe
      // failure (r16 ADVICE: as a plain default argument the
      // resolution ran at the call site, outside the try, so an
      // invalid SPARK_GRAFT_SCRATCH aborted the whole bench run).
      assert(Bench.fsyncProbeMsPerOp(() => sys.error("bad scratch")) === -1.0)
      // The probe cleans up after itself.
      val leftover = java.nio.file.Files.list(tmp)
      try assert(!leftover.iterator().hasNext) finally leftover.close()
    } finally graft.streaming.ReplayStaging.deleteRecursively(tmp)
  }

  test("the committed BENCH_BEST.json parses to every entry") {
    val p = java.nio.file.Paths.get("BENCH_BEST.json")
    assume(java.nio.file.Files.exists(p))
    val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val m = Bench.parseBestKnown(s)
    // Count the entries the cheap way (lines with a colon) and demand
    // the regex found them all — a future format drift fails HERE, not
    // as silently-empty best-known.
    val n = s.linesIterator.count(_.contains("\":"))
    assert(m.size === n, s"regex parsed ${m.size} of $n ledger entries")
    assert(m.nonEmpty && m.values.forall(_ > 0))
  }
}
