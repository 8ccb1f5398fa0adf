package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Retrieval, TextAnalysis}

/** The MedallionContractSpec discipline extended to the EXTENSION
  * preludes (r10 verdict item #7): the five most-reused semantic
  * constants of the documents-table oracle surface — tokenizer, token
  * polyhash (base 31), shingle/band fold (base 131), the MinHash
  * permutation family, and the fingerprint normalization — each
  * pinned TWICE: once as text of the shipped oracle SQL
  * (SparkEntry.oracleSql), once as golden behavior of the Scala
  * operator on a hand-computed micro-case. Either side changing alone
  * fails here; a legitimate change must touch Scala + SQL + this spec
  * together.
  */
class ExtensionContractSpec extends SparkSpecBase {
  import spark.implicits._

  private val P = 1000000007L
  private val O = SparkEntry.oracleSql

  // ---------------------------------------------------------------
  // Side 1: the oracle SQL text carries each constant.
  // ---------------------------------------------------------------

  test("oracle text: tokenizer = lowercase whitespace split, empties dropped") {
    val frag = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '')"
    for (q <- Seq("d3_minhash_sigs", "t1_text_stats"))
      assert(O(q).contains(frag), s"$q lost the tokenizer fragment")
  }

  test("oracle text: token polyhash is base 31 mod 1000000007") {
    assert(O("d3_minhash_sigs").contains("(a * 31 + b) % 1000000007"),
      "d3 lost the base-31 token hash")
  }

  test("oracle text: shingle fold and band-key fold are base 131 mod 1000000007") {
    assert(O("d3_minhash_sigs").contains("* 131 + th["),
      "d3 lost the base-131 shingle fold")
    assert(O("d4_minhash_candidates").contains("(a * 131 + x) % 1000000007"),
      "d4 lost the base-131 band-key fold")
  }

  test("oracle text: MinHash family — 16 perms, Knuth multipliers, sentinel P") {
    val d3 = O("d3_minhash_sigs")
    for (frag <- Seq(
      "generate_series(1, 16)",
      "(2654435761 * p + 1) % 1000000007",
      "(40503 * p * p + 17) % 1000000007",
      "ELSE 1000000007"))
      assert(d3.contains(frag), s"d3 lost MinHash fragment: $frag")
    // 8 bands x 2 rows — the d4 LSH shape.
    assert(O("d4_minhash_candidates").contains("[0, 1, 2, 3, 4, 5, 6, 7]"),
      "d4 lost the 8-band unnest")
    assert(O("d4_minhash_candidates").contains("sig[b*2 + 1 : b*2 + 2]"),
      "d4 lost the 2-rows-per-band slice")
  }

  test("oracle text: fingerprint normalization = trim + lower + collapse whitespace") {
    assert(O("t3_fingerprints").contains(
      "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"),
      "t3 lost the normalization fragment")
  }

  // ---------------------------------------------------------------
  // Side 2: the Scala operators reproduce the same constants as
  // golden behavior on hand-computed micro-cases.
  // ---------------------------------------------------------------

  test("golden: tokenizer lowercases, splits on whitespace runs, drops empties") {
    val got = Seq("  Hello\tWorld\n  x  ").toDF("text")
      .select(Retrieval.tokens(col("text"))).collect()(0).getSeq[String](0)
    assert(got === Seq("hello", "world", "x"))
    // Dedup's token path agrees (same tokens, hashed).
    val n = Seq("  Hello\tWorld\n  x  ").toDF("text")
      .select(size(Dedup.tokenHashes(col("text")))).collect()(0).getInt(0)
    assert(n === 3)
  }

  test("golden: token polyhash h = fold(h*31 + codepoint) mod P") {
    def ref(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % P)
    val got = Seq("abc").toDF("t").select(Dedup.tokenHash(col("t"))).collect()(0).getLong(0)
    assert(got === ref("abc"))
    assert(got === ((((97L * 31) + 98) * 31 + 99) % P)) // fully hand-expanded
  }

  test("golden: shingle fold combines n consecutive token hashes base 131") {
    val th = Seq(5L, 10L, 20L)
    def sh2(a: Long, b: Long) = ((a % P) * 131 + b) % P
    val got = Seq(Tuple1(th)).toDF("th")
      .select(Dedup.shinglesFromTokenHashes(col("th"), 2)).collect()(0).getSeq[Long](0)
    assert(got.toSet === Set(sh2(5L, 10L), sh2(10L, 20L)))
  }

  test("golden: MinHash sig_p = min((x*a_p + b_p) mod P), a/b the pinned family, empty -> sentinel") {
    val shingles = Seq(5L, 10L, 999983L)
    def a(p: Int) = (2654435761L * p + 1L) % P
    def b(p: Int) = (40503L * p.toLong * p + 17L) % P
    val want = (1 to 16).map(p => shingles.map(x => (x * a(p) + b(p)) % P).min)
    val got = Seq(Tuple1(shingles)).toDF("sh")
      .select(Dedup.minhashSignature(col("sh"), 16)).collect()(0).getSeq[Long](0)
    assert(got === want)
    val empty = Seq(Tuple1(Seq.empty[Long])).toDF("sh")
      .select(Dedup.minhashSignature(col("sh"), 16)).collect()(0).getSeq[Long](0)
    assert(empty === Seq.fill(16)(P))
  }

  test("golden: band keys fold (band index, then rows) base 131 — 8 bands x 2 rows") {
    val sig = (1L to 16L).toSeq
    def key(b: Int): Long =
      (0 until 2).foldLeft(b.toLong)((acc, r) => (acc * 131 + sig(b * 2 + r)) % P)
    val got = Seq(Tuple1(sig)).toDF("sig")
      .select(Dedup.bandKeys(col("sig"), 8, 2)).collect()(0).getSeq[Long](0)
    assert(got === (0 until 8).map(key))
  }

  test("golden: fingerprint md5 over the normalized text") {
    val want = MessageDigest.getInstance("MD5")
      .digest("a b c".getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val got = Seq("  A  b\tC ").toDF("text")
      .select(TextAnalysis.fingerprintMd5(col("text"))).collect()(0).getString(0)
    assert(got === want)
  }
}
