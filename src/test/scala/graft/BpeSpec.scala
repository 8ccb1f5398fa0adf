package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  // The classic BPE teaching corpus (word -> frequency):
  //   hug×10  pug×5  pun×12  bun×4  hugs×5
  // Pair counts round 1: (u,g)=20 (h,u)=15 (p,u)=17 (u,n)=16 (b,u)=4 (g,s)=5
  // → merge 1 = "ug"; round 2 top = (u,n)=16 → "un"; round 3 top = (h,ug)=15.
  private def corpus = {
    def rep(w: String, n: Int) = Seq.fill(n)(w)
    Seq((0L, (rep("hug", 10) ++ rep("pug", 5) ++ rep("pun", 12) ++
      rep("bun", 4) ++ rep("hugs", 5)).mkString(" "))).toDF("doc_id", "text")
  }

  test("learnMerges reproduces the textbook merge sequence ug, un, h+ug") {
    val merges = Bpe.learnMerges(corpus, n = 3)
    assert(merges === Seq(("u", "g"), ("u", "n"), ("h", "ug")))
  }

  test("pairStats ranks (u,g) first with corpus-weighted counts and savings") {
    val out = Bpe.pairStats(corpus, topK = 3).collect()
      .map(r => r.getAs[String]("pair") ->
        (r.getAs[Long]("cnt"), r.getAs[Int]("rnk"),
          r.getAs[Boolean]("is_selected"), r.getAs[Long]("merge_savings"))).toMap
    assert(out("ug") === ((20L, 1, true, 20L)))
    assert(out("pu") === ((17L, 2, false, 17L)))
    assert(out("un") === ((16L, 3, false, 16L)))
  }

  test("overlapping adjacencies count for frequency, non-overlapping for savings") {
    // "aaa": pairs (a,a) at two positions → cnt 2; one replace pass
    // merges only the first occurrence → savings 1.
    val docs = Seq((0L, "aaa")).toDF("doc_id", "text")
    val r = Bpe.pairStats(docs, topK = 1).collect().head
    assert(r.getAs[String]("pair") === "aa")
    assert(r.getAs[Long]("cnt") === 2L)
    assert(r.getAs[Long]("merge_savings") === 1L)
  }

  test("greedy merge is left-to-right non-overlapping and does not cascade") {
    val words = Seq((Seq("a", "a", "a"), 1L)).toDF("syms", "wc")
    val merged = Bpe.applyMerge(words, "a", "a").collect().head.getSeq[String](0)
    assert(merged === Seq("aa", "a"))
    // A merged token does not immediately re-merge with the next
    // symbol: (a,b) on "a b b" → [ab, b], not [abb].
    val w2 = Seq((Seq("a", "b", "b"), 1L)).toDF("syms", "wc")
    assert(Bpe.applyMerge(w2, "a", "b").collect().head.getSeq[String](0)
      === Seq("ab", "b"))
  }

  test("merge loop operates on the word table, not the corpus") {
    // 1-char words produce no pairs; learnMerges must terminate
    // gracefully with no merges.
    val docs = Seq((0L, "a b c a b")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(docs, n = 2) === Seq.empty)
  }

  test("encodeStats: textbook merges give exact per-source token budgets") {
    val docs = Seq((0L, "hug hug pug", "s1"), (1L, "hugs", "s2"))
      .toDF("doc_id", "text", "source")
    val merges = Bpe.learnMerges(docs, n = 2)
    assert(merges === Seq(("u", "g"), ("h", "ug")))
    // hug -> [hug] (1 sym), pug -> [p, ug] (2), hugs -> [hug, s] (2).
    val r = Bpe.encodeStats(docs, merges).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r("s1") === ((3L, 9L, 4L, 2250000L)))
    assert(r("s2") === ((1L, 4L, 2L, 2000000L)))
  }

  test("encodeStats applies merges greedily left-to-right (aaaaa -> aa aa a)") {
    val docs = Seq((0L, "aaaaa", "s")).toDF("doc_id", "text", "source")
    val r = Bpe.encodeStats(docs, Seq(("a", "a"))).collect().head
    assert(r.getAs[Long]("n_bpe_tokens") === 3L)
    assert(r.getAs[Long]("n_chars") === 5L)
  }
}
