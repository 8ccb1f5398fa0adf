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
