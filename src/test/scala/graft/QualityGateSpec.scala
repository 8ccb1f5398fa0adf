package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** T17 — Gopher/C4-style hard quality gate: per-rule fail flags,
  * verdict, and first-fail reject reason (rule precedence short >
  * long > wordlen > alpha > stop > symbol > rep).
  */
class QualityGateSpec extends SparkSpecBase {
  import spark.implicits._

  private def gate(rows: (Long, String)*): Map[Long, (Boolean, String)] =
    TextAnalysis.qualityGate(rows.toSeq.toDF("doc_id", "text"))
      .select(col("doc_id"), col("pass"), col("reject_reason"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2))))
      .toMap

  // 25 distinct 3–5-letter words incl. two stopwords, no punctuation:
  // passes every rule.
  private val clean = "the a cat dog bird fish horse mouse table chair " +
    "stone river cloud grass plant light sound water earth metal glass " +
    "paper brick wheel"

  test("clean document passes every rule") {
    val m = gate(0L -> clean)
    assert(m(0L) === ((true, "pass")))
  }

  test("short-circuit order: a short doc failing several rules reports 'short'") {
    // 3 tokens: also fails stop (0 hits < 2) and rep ("zz" 1/3 > 20%)
    // — but `short` is checked first.
    val m = gate(1L -> "zz yy xx")
    assert(m(1L) === ((false, "short")))
  }

  test("long rule fires before rep on a 1002-token two-word loop") {
    val m = gate(2L -> Seq.fill(501)("the a").mkString(" "))
    assert(m(2L) === ((false, "long")))
  }

  test("wordlen rejects a mean token length over 12") {
    val longWords = Seq.fill(18)("abcdefghijklmnop").mkString(" ")
    val m = gate(3L -> s"the a $longWords")
    assert(m(3L) === ((false, "wordlen")))
  }

  test("alpha rejects mostly-numeric tokens") {
    // 20 numeric tokens + 2 stopwords: alpha 2/22 < 70%; mean word
    // length (64 chars / 22 tokens) stays inside [2, 12].
    val nums = (100 to 119).map(_.toString).mkString(" ")
    val m = gate(4L -> s"the a $nums")
    assert(m(4L) === ((false, "alpha")))
  }

  test("stop rejects a stopword-free document") {
    val words = (0 until 25).map(i => s"word$i").mkString(" ")
    val m = gate(5L -> words)
    assert(m(5L) === ((false, "stop")))
  }

  test("symbol rejects >10% punctuation even when tokens stay alphabetic") {
    // Each token "abc!!" is 40% punctuation but still contains
    // letters, so alpha passes and `symbol` is the first failure.
    val noisy = (0 until 23).map(i => s"ab${('a' + i % 26).toChar}!!").mkString(" ")
    val m = gate(6L -> s"the a $noisy")
    assert(m(6L) === ((false, "symbol")))
  }

  test("rep rejects a >20% repeated token") {
    // 24 tokens, 6 of them "cat" (25%); everything else passes.
    val filler = (0 until 16).map(i => s"word${('a' + i).toChar}").mkString(" ")
    val m = gate(7L -> s"the a cat cat cat cat cat cat $filler")
    assert(m(7L) === ((false, "rep")))
  }

  test("token-free document still flows through the gate as 'short'") {
    val m = gate(8L -> "   ")
    assert(m(8L) === ((false, "short")))
  }

  test("funnel counts are independent per rule, pass counts the survivors") {
    val df = Seq(
      (0L, "en", clean),
      (1L, "en", "zz yy xx"), // short + stop + rep
      (2L, "fr", clean)).toDF("doc_id", "lang", "text")
    val gated = TextAnalysis.qualityGate(df)
    val en = gated.filter(col("lang") === "en")
      .agg(sum(col("f_short").cast("long")), sum(col("f_stop").cast("long")),
        sum(col("f_rep").cast("long")), sum(col("pass").cast("long")))
      .head()
    assert((en.getLong(0), en.getLong(1), en.getLong(2), en.getLong(3)) ===
      ((1L, 1L, 1L, 1L)))
  }

  test("token entropy: hand-computed even/collapsed cases; single-distinct norm is NULL") {
    // "a a b b": tf 2/2, dl 4, lp = floor(ln(0.5)*1e6) = -693148 each,
    // sum = 4*(-693148), entropy = 693148 = ln(2) e6-floored.
    // "a a a": one distinct token, lp = ln(1) = 0, entropy 0, norm NULL.
    val out = TextAnalysis.tokenEntropy(
        Seq((1L, "a a b b"), (2L, "a a a"), (3L, "x y z w")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("entropy_e6") === 693148L)
    assert(out(1L).getAs[Long]("n_distinct") === 2L)
    assert(out(1L).getAs[Long]("norm_entropy_e6") ===
      math.floor(693148.0 / math.log(2.0)).toLong)
    assert(out(2L).getAs[Long]("entropy_e6") === 0L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("norm_entropy_e6")))
    // All-distinct doc: entropy = e6-floored ln(4) per token,
    // normalized to ~1e6 (floor of the truncated/exact ratio; per-token lp floors to -1386295).
    assert(out(3L).getAs[Long]("entropy_e6") === 1386295L)
    assert(out(3L).getAs[Long]("norm_entropy_e6") ===
      math.floor(1386295.0 / math.log(4.0)).toLong)
  }
}
