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
