package graft

import java.security.MessageDigest

/** DuckDB-independent regression net: md5 of the canonicalized,
  * sorted result matrix for representative queries at sf0.001
  * (deterministic seed-42 data, TESTDATA.md). Catches any semantic
  * drift in the engine without needing the oracle harness — if one of
  * these moves, either the change is intentional (recompute via
  * scripts/check.sh outputs) or something broke.
  *
  * Canonicalization: columns sorted by name, floats at Java %.9g,
  * rows sorted lexicographically (self-consistent snapshot — Java %g
  * keeps trailing zeros where Python's strips them, so these hashes
  * intentionally differ from scripts/oracle_check.py's).
  */
class GoldenSpec extends SparkSpecBase {

  private val Golden = Map(
    "a1_ohlcv_5m" -> (973, "7c1df6f03eb9c1941be8bab5a02facd9"),
    "t4_doc_features" -> (200, "1fadae2318e673ae0fe69f7bd973f550"),
    "x1_asof_join" -> (202, "d3343dca7004469a2af0434a0ae53702"),
    "h1_pricing_summary" -> (6, "12ec5bb0335c71398dff988c7c980652"),
    // Round-2 surfaces.
    "d6_embedding_dups" -> (50, "203327a4956e6eae623c5524ab4cb000"),
    "x17_market_hours" -> (15, "0202bee15d77b71816d2d477870e7e55"),
    "f4_validation_rate" -> (1, "ba9232ae855ea6de6a6a8dd58c7f8573"),
    "x10_token_packing" -> (6, "0d6a693aa259dc86ceb696e7cf133768"))

  private def canon(v: Any): String = v match {
    case null => "NULL"
    case d: Double if d.isNaN => "NaN"
    case d: Double => String.format(java.util.Locale.ROOT, "%.9g", Double.box(d))
    case f: Float => canon(f.toDouble)
    case other => other.toString
  }

  private def fingerprint(name: String): (Int, String) = {
    val df = SparkEntry.queries(name)(spark, Sf)
    val cols = df.columns.sorted
    val rows = df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(canon).mkString("|")).sorted
    (rows.length, MessageDigest.getInstance("MD5")
      .digest(rows.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
  }

  Golden.foreach { case (name, (n, hash)) =>
    test(s"golden: $name is stable at sf0.001") {
      val (gotN, gotHash) = fingerprint(name)
      assert(gotN === n, s"$name row count")
      assert(gotHash === hash, s"$name content hash drifted")
    }
  }
}
