package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

class RetrievalSpec extends SparkSpecBase {
  import spark.implicits._

  // 4 docs, hand-countable term stats. "rare" appears only in doc 3;
  // "the" appears everywhere (idf = 0).
  private def corpus = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the dog sat"),
    (2L, "the cat and the dog"),
    (3L, "rare the")).toDF("doc_id", "text")

  test("termFreqs counts tf and dl per doc") {
    val m = Retrieval.termFreqs(corpus).collect()
      .map(r => (r.getLong(0), r.getString(2)) -> (r.getLong(3), r.getLong(1))).toMap
    assert(m((0L, "the")) === ((2L, 6L)))
    assert(m((3L, "rare")) === ((1L, 2L)))
    assert(!m.contains((1L, "cat")))
  }

  test("tfIdf ranks the distinctive term first and zeroes ubiquitous terms") {
    val rows = Retrieval.tfIdfTopK(corpus, topK = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getLong(5))).toMap
    // doc 3: "rare" (df=1, tf=1, dl=2) beats "the" (idf = ln(1) = 0).
    val (term, score) = rows((3L, 1))
    assert(term === "rare")
    assert(score === math.floor(0.5 * math.log(4.0) * 1e6).toLong)
    assert(rows((3L, 2))._1 === "the")
    assert(rows((3L, 2))._2 === 0L)
  }

  test("bm25 puts the only doc containing a query term first") {
    val top = Retrieval.bm25TopK(corpus, Seq("rare", "cat"), topK = 4).collect()
    assert(top.head.getLong(0) === 3L) // "rare" is rarest → highest idf
    // every returned doc matched at least one query term
    assert(top.map(_.getLong(0)).toSet === Set(0L, 2L, 3L))
  }

  test("invertedIndex caps postings and keeps full df/total_tf") {
    val byTerm = Retrieval.invertedIndex(corpus, maxPostings = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(byTerm("the") === ((4L, 6L, "0,1"))) // df=4 docs, Σtf=6, capped at 2 ids
    assert(byTerm("rare") === ((1L, 1L, "3")))
  }

  test("importanceWeights scores target-distinctive docs above raw-typical ones") {
    val scores = Retrieval
      .importanceWeights(corpus, targetPred = col("doc_id") === 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 3 IS the target slice: its tokens ("rare", "the") are
    // over-represented in target vs raw → positive importance; doc 0
    // shares no distinctive token mass → negative.
    assert(scores(3L) > 0L)
    assert(scores(0L) < 0L)
  }

  test("pmi is positive for always-co-occurring pair, lower for independent one") {
    val m = Retrieval.pmiPairs(corpus, minPairCount = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    // cat+mat co-occur in the only mat doc: pmi = ln(1·4/(2·1)) = ln 2.
    assert(m(("cat", "mat")) === math.floor(math.log(2.0) * 1e6).toLong)
    // the+cat: ln(2·4/(4·2)) = 0.
    assert(m(("cat", "the")) === 0L)
  }

  test("unigram quality terciles: typical docs head, singleton-token docs tail") {
    val tiers = (0L until 9L).map { i =>
      val text =
        if (i < 3) "the the the the"          // only the commonest token
        else if (i < 6) "the cat"             // one common + one mid token
        else s"z$i q$i w$i"                   // three corpus-singletons
      (i, text)
    }.toDF("doc_id", "text")
    val out = Retrieval.unigramQualityBuckets(tiers).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    (0L until 3L).foreach(i => assert(out(i) === "head", s"doc $i"))
    (3L until 6L).foreach(i => assert(out(i) === "middle", s"doc $i"))
    (6L until 9L).foreach(i => assert(out(i) === "tail", s"doc $i"))
  }

  test("bigram LM: add-one smoothed logprobs, hand-computed") {
    // Corpus: doc 0 "a b a b", doc 1 "a b".
    //   C(a,b)=3  C(b,a)=1  C(a·)=3  C(b·)=1  |V|=2
    //   lp(a,b) = ⌊ln(4/5)·1e6⌋ = −223144
    //   lp(b,a) = ⌊ln(2/3)·1e6⌋ = −405466
    // doc 0: Σ = 2·(−223144) + (−405466) = −851754, avg over 3 = −283918
    // doc 1: Σ = avg = −223144
    val docs = Seq((0L, "a b a b"), (1L, "a b")).toDF("doc_id", "text")
    val out = Retrieval.bigramLmScores(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("lp_sum_e6"),
          r.getAs[Long]("avg_lp_e6"))).toMap
    assert(out(0L) === ((3L, -851754L, -283918L)))
    assert(out(1L) === ((1L, -223144L, -223144L)))
  }

  test("bigram LM drops single-token docs and is partition-invariant") {
    val docs = Seq((0L, "a b a b"), (1L, "a b"), (2L, "lonely"))
      .toDF("doc_id", "text")
    def run(parts: Int) =
      Retrieval.bigramLmScores(docs.repartition(parts)).collect()
        .map(_.toSeq).sortBy(_.toString).toSeq
    val r1 = run(1)
    assert(r1.map(_.head) === Seq(0L, 1L)) // doc 2 has no bigrams
    assert(r1 === run(7))
  }

  test("held-out bigram LM: unseen bigrams and unseen contexts smooth correctly") {
    // Train: "a b a b" → bigrams (a,b),(b,a),(a,b):
    //   C(a,b)=2, C(b,a)=1, C(a·)=2, C(b·)=1, |V|=2.
    // Candidates:
    //   doc 10 "a b":  seen bigram  lp = ⌊ln((2+1)/(2+2))·1e6⌋ = ⌊ln(0.75)·1e6⌋
    //   doc 11 "b b":  unseen bigram, seen context b: ⌊ln((0+1)/(1+2))·1e6⌋
    //   doc 12 "c a":  unseen context c: ⌊ln((0+1)/(0+2))·1e6⌋
    val train = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val cand = Seq((10L, "a b"), (11L, "b b"), (12L, "c a")).toDF("doc_id", "text")
    val out = Retrieval.bigramLmHeldOut(train, cand).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("avg_lp_e6")).toMap
    def lp(num: Double, den: Double) = math.floor(math.log(num / den) * 1e6).toLong
    assert(out(10L) === lp(3, 4))
    assert(out(11L) === lp(1, 3))
    assert(out(12L) === lp(1, 2))
  }

  test("tfidf/bm25 selection is invariant to partitioning") {
    def run(parts: Int) = {
      val d = corpus.repartition(parts)
      (Retrieval.tfIdfTopK(d, topK = 2).collect().map(_.toSeq).sortBy(_.toString),
        Retrieval.bm25TopK(d, Seq("cat", "dog"), topK = 4).collect().map(_.toSeq).toSeq)
    }
    assert(run(1)._1 === run(7)._1)
    assert(run(1)._2 === run(7)._2)
  }

  test("textRank: hand-computed one-round ranks on the a-b-c path graph") {
    // 30 docs "a b", 30 docs "b c" -> undirected edges (a,b,30),
    // (b,c,30); n=3, r0 = 1e12/3 = 333333333333, wout(b)=60.
    // Round 1 (all divisions truncating):
    //   base = 150000*r0 // 1e6                      = 49999999999
    //   csum(a) = csum(c) = r0*30 // 60              = 166666666666
    //   csum(b) = 2 * (r0*30 // 30)                  = 666666666666
    //   r1(a) = r1(c) = base + 850000*csum(a) // 1e6 = 191666666665
    //   r1(b) = base + 850000*csum(b) // 1e6         = 616666666665
    val docsDf = ((0 until 30).map(i => (i.toLong, "a b")) ++
      (30 until 60).map(i => (i.toLong, "b c"))).toDF("doc_id", "text")
    val r = Retrieval.textRank(docsDf, minPairCount = 25, iters = 1).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r === Map("a" -> 191666666665L, "b" -> 616666666665L, "c" -> 191666666665L))
    // More rounds keep total mass bounded by 1e12 and the hub on top.
    val r3 = Retrieval.textRank(docsDf, minPairCount = 25, iters = 3).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r3.values.sum <= 1000000000000L)
    assert(r3("b") > r3("a") && r3("a") === r3("c"))
  }

  test("bm25MultiQuery agrees with per-query bm25TopK") {
    val queries = Seq(("q1", "rare"), ("q1", "cat"), ("q2", "dog"))
      .toDF("qid", "term")
    val multi = Retrieval.bm25MultiQuery(corpus, queries, topK = 4).collect()
      .map(r => (r.getString(0), r.getLong(2)) -> ((r.getLong(1), r.getLong(3), r.getLong(4))))
      .toMap
    for ((qid, terms) <- Seq("q1" -> Seq("rare", "cat"), "q2" -> Seq("dog"))) {
      val single = Retrieval.bm25TopK(corpus, terms, topK = 4).collect()
      single.zipWithIndex.foreach { case (r, i) =>
        assert(multi((qid, r.getLong(0))) ===
          (((i + 1).toLong, r.getLong(1), r.getLong(2))),
          s"qid=$qid doc=${r.getLong(0)}")
      }
      assert(multi.keys.count(_._1 == qid) === single.length)
    }
  }

  test("dcg discount table: literal values and prefix sums") {
    val d = Retrieval.dcgDiscountsE6(10)
    assert(d.head === 1000000L)        // 1/log2(2)
    assert(d(1) === 630929L)           // 1/log2(3)
    assert(d(2) === 500000L)           // 1/log2(4)
    assert(d === d.sorted.reverse)     // monotone decreasing
    assert(Retrieval.idcgPrefixE6(10)(2) === d.take(3).sum)
  }

  test("rankingMetrics: hand-computed recall/MRR/nDCG golden") {
    // q1: retrieved ranks 1,2,3 = docs 10,11,12; relevant {11,12,98,99}
    // -> hits at ranks 2 and 3.
    val results = Seq(("q1", 1L, 10L), ("q1", 2L, 11L), ("q1", 3L, 12L),
      ("q2", 1L, 20L)).toDF("qid", "rank", "doc_id")
    val relevant = Seq(("q1", 11L), ("q1", 12L), ("q1", 98L), ("q1", 99L),
      ("q2", 50L)).toDF("qid", "doc_id")
    val m = Retrieval.rankingMetrics(results, relevant, k = 10).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val disc = Retrieval.dcgDiscountsE6(10)
    val dcg = disc(1) + disc(2)                  // hits at ranks 2, 3
    val idcg = Retrieval.idcgPrefixE6(10)(3)     // min(n_rel=4, k)
    assert(m("q1") === Seq(4L, 2L, 500000L, 500000L, dcg,
      dcg * 1000000L / idcg))
    // q2: nothing relevant retrieved -> all-zero metrics, row present.
    assert(m("q2") === Seq(1L, 0L, 0L, 0L, 0L, 0L))
  }

  test("rankingMetrics ignores results beyond rank k") {
    val results = Seq(("q1", 1L, 10L), ("q1", 4L, 11L)).toDF("qid", "rank", "doc_id")
    val relevant = Seq(("q1", 11L)).toDF("qid", "doc_id")
    val m3 = Retrieval.rankingMetrics(results, relevant, k = 3).head()
    assert(m3.getLong(2) === 0L) // the rank-4 hit is outside the cutoff
    val m5 = Retrieval.rankingMetrics(results, relevant, k = 5).head()
    assert(m5.getLong(2) === 1L)
    assert(m5.getLong(4) === 1000000L / 4L) // mrr from rank 4
  }
}
