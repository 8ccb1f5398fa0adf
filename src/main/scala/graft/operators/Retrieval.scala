package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval / corpus-statistics operators for the training-data
  * pipeline: TF-IDF and BM25 relevance scoring, a capped inverted index,
  * DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"), and PMI co-occurrence.
  *
  * Oracle-parity posture (the same rules the rest of the repo follows):
  * every score that crosses an aggregation boundary is quantized to an
  * integer FIRST (floor(x * 1e6 / 1e9) as long), so Spark's
  * partition-order-dependent float summation can never change a result.
  * The only transcendental used is ln(), applied once per (row) to a
  * double built exclusively from correctly-rounded ops (+ - * / on
  * exact-integer-derived doubles); ln agrees bit-for-bit between the
  * JVM and DuckDB on this platform (verified over a 2300-point idf-ratio
  * grid), and the floor-quantized output is what gets hash-checked.
  *
  * Scale posture: everything is one explode + hash aggregates joined
  * back on `term`. Per-term statistic tables are broadcast ONLY when
  * pre-restricted to a query-term set (KBs); corpus-wide vocab tables
  * (docFreqs at web scale is 10⁷–10⁸ rows) flow through plain shuffle
  * joins that AQE may downgrade to broadcast when small. The only
  * windows are per-term (inverted-index postings cap) and per-doc
  * (top-k terms) — never global. Driver-side scalars are bounded
  * single-row aggregates (corpus size, total token count), the same
  * posture as KMeans seeds/IVF centroids.
  */
object Retrieval {

  /** Lowercased whitespace tokens, empties removed — the repo-standard
    * tokenizer (TextAnalysis.tokens + lower), DuckDB twin is toksSql.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** One row per (doc, distinct term): term frequency and doc length in
    * tokens. The whole term-stats layer derives from this single
    * explode + hash aggregate.
    */
  def termFreqs(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Document frequency per term, from the (doc, term) level. */
  def docFreqs(termFreqs: DataFrame): DataFrame =
    termFreqs.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Top-k TF-IDF terms per document. Score is the classic
    * (tf/dl)·ln(N/df), floor-quantized to e6 micro-units BEFORE the
    * per-doc rank, so term selection is integer-deterministic; ties
    * break on term text.
    *
    * Scale: the df table is the FULL corpus vocabulary (10⁷–10⁸ rows
    * at web scale), so it is deliberately NOT broadcast — the join on
    * `term` is a plain shuffle join both of whose sides are already
    * hashed on `term` by their own aggregates, and AQE is free to
    * downgrade it to broadcast when the vocab actually is small.
    */
  def tfIdfTopK(docs: DataFrame, topK: Int = 3, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val tfs = termFreqs(docs, idCol, textCol)
    val n = docs.count()
    val scored = tfs.join(docFreqs(tfs), "term")
      .withColumn("tfidf_e6",
        floor(col("tf").cast("double") / col("dl").cast("double") *
          log(lit(n.toDouble) / col("df").cast("double")) *
          lit(1000000.0)).cast("long"))
    val perDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf_e6").desc, col("term"))
    scored.withColumn("rank", row_number().over(perDoc))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        col("tfidf_e6"))
  }

  /** BM25 top-k retrieval for a fixed bag of query terms (Robertson/
    * Spärck Jones; the Lucene ln(1 + …) idf form, so idf ≥ 0 even for
    * terms in more than half the corpus). k1 = 1.2, b = 0.75 — written
    * as the standard literals on both engines (1 − b pre-folded to
    * 0.25; k1 + 1 pre-folded to 2.2) so no derived constant can round
    * differently. Per-(doc, term) partial scores are floor-quantized to
    * e9 before the per-doc sum, making the sum exact-integer; the final
    * top-k is a TakeOrderedAndProject on (score desc, doc_id).
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], topK: Int = 20,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val tfs = termFreqs(docs, idCol, textCol)
    // Corpus stats (N, Σdl) as an IN-PLAN one-row broadcast — the
    // same h15 posture bm25MultiQuery uses — instead of the former
    // driver-side .head(): the whole query is ONE job. The arithmetic
    // is unchanged: avgdl is still evaluated as s/n before the
    // per-row division, so every double matches the former
    // literal-avgdl form bit-for-bit (x27's hash is pinned).
    val stats = docs
      .select(size(tokens(col(textCol))).cast("long").as("dl"))
      .agg(sum(col("dl")).as("__sumdl"), count(lit(1)).as("__n"))
    val nD = col("__n").cast("double")
    val dfD = col("df").cast("double")
    val idf = log(lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
    val tfD = col("tf").cast("double")
    val den = tfD + lit(1.2) *
      (lit(0.25) + lit(0.75) *
        (col("dl").cast("double") / (col("__sumdl").cast("double") / nD)))
    // df stats restricted to the query terms BEFORE the broadcast
    // hint: docFreqs is vocab-sized (multi-GB at web scale) and
    // broadcasting it whole would OOM the driver; the isin pushes
    // through the aggregate's grouping key, so the build side is
    // |queryTerms| rows — KBs — while df values stay corpus-wide.
    val scored = tfs.filter(col("term").isin(queryTerms: _*))
      .join(broadcast(docFreqs(tfs).filter(col("term").isin(queryTerms: _*))), "term")
      .crossJoin(broadcast(stats))
      .withColumn("part_e9", floor(idf * (tfD * lit(2.2) / den) *
        lit(1000000000.0)).cast("long"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("part_e9")).as("bm25_e9"))
      .orderBy(col("bm25_e9").desc, col("doc_id"))
      .limit(topK)
  }

  /** Inverted index with a capped postings list: per term, df, total tf,
    * and the first `maxPostings` doc ids (ascending, comma-joined).
    * The cap is applied with a per-term window BEFORE collecting, so no
    * executor ever materializes an unbounded postings array — the
    * collect_list is at most `maxPostings` elements per term.
    */
  def invertedIndex(docs: DataFrame, maxPostings: Int = 15,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tfs = termFreqs(docs, idCol, textCol)
    val perTerm = Window.partitionBy(col("term")).orderBy(col("doc_id"))
    tfs.withColumn("rn", row_number().over(perTerm))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"),
        concat_ws(",", transform(
          array_sort(collect_list(when(col("rn") <= maxPostings, col("doc_id")))),
          x => x.cast("string"))).as("postings"))
  }

  /** DSIR-flavored importance weights: per-token log-likelihood ratio
    * of a target slice vs the raw corpus (add-one smoothed), quantized
    * to e6; per-doc importance = Σ tf·w_e6, an exact long sum. The
    * weight table is vocab-sized → broadcast; totals are one bounded
    * driver aggregate.
    */
  def importanceWeights(docs: DataFrame, targetPred: Column,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // Materialize the term-frequency base once: it feeds both the
    // count model and the final weighted join, and the driver-scalar
    // total in between forces a job boundary — without this the
    // tokenize+explode+aggregate tree runs twice end to end.
    val tfs = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
        targetPred.as("__tgt"))
      .select(col("doc_id"), col("__tgt"), tokens(col("text")).as("__toks"))
      .select(col("doc_id"), col("__tgt"),
        size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col("doc_id"), col("__tgt"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val counts = tfs.groupBy(col("term"))
      .agg(sum(when(col("__tgt"), col("tf")).otherwise(lit(0L))).as("ct"),
        sum(col("tf")).as("cr"))
    val t = counts.agg(sum(col("ct")), sum(col("cr")), count(lit(1))).head()
    val (tgtPlusV, rawPlusV) = (t.getLong(0) + t.getLong(2), t.getLong(1) + t.getLong(2))
    val weights = counts.withColumn("w_e6",
      floor(log(((col("ct") + lit(1L)) * lit(rawPlusV)).cast("double") /
          ((col("cr") + lit(1L)) * lit(tgtPlusV)).cast("double")) *
        lit(1000000.0)).cast("long"))
    tfs.join(broadcast(weights.select(col("term"), col("w_e6"))), "term")
      .groupBy(col("doc_id"), col("dl"))
      .agg(sum(col("tf") * col("w_e6")).as("importance_e6"))
      .select(col("doc_id"), col("dl").as("n_tokens"), col("importance_e6"))
  }

  /** CCNet-style unigram-LM quality scoring with corpus-relative
    * bucketing: each doc's mean token logprob under the corpus unigram
    * model (MLE — the model corpus IS the scored corpus, so nothing is
    * unseen), bucketed head/middle/tail at the corpus terciles. Higher
    * mean logprob = lower perplexity = more typical text = head, the
    * CCNet convention.
    *
    * Determinism/scale: per-token logprobs quantize to e6 BEFORE the
    * per-doc sum (exact longs); the mean uses truncating integer
    * division (Spark `div` ≡ DuckDB `//`); terciles come from the
    * COMPRESSED score distribution (cumulative counts over DISTINCT
    * e6 scores — the x23 posture: sort distinct values, never rows),
    * and the two thresholds broadcast back as a one-row frame.
    */
  def unigramQualityBuckets(docs: DataFrame, idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    // Two reused frames, each consumed across a driver-scalar job
    // boundary (total, then the tercile rank cutoffs): materialize
    // them once instead of re-running the tokenize/explode tree for
    // every consumer — same plan shape per stage, one corpus scan.
    val tfs = termFreqs(docs, idCol, textCol).localCheckpoint(true)
    val counts = tfs.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
    val total = counts.agg(sum(col("cnt"))).head().getLong(0)
    val lps = counts.withColumn("lp_e6",
      floor(log(col("cnt").cast("double") / lit(total.toDouble)) *
        lit(1000000.0)).cast("long"))
    val scored = tfs.join(broadcast(lps.select(col("term"), col("lp_e6"))), "term")
      .groupBy(col("doc_id"), col("dl"))
      .agg(sum(col("tf") * col("lp_e6")).as("lp_sum_e6"))
      .withColumn("avg_lp_e6", expr("lp_sum_e6 div dl"))
      .localCheckpoint(true)
    val n = scored.count()
    val (r1, r2) = ((n + 2) / 3, (2 * n + 2) / 3)
    val cum = scored.groupBy(col("avg_lp_e6").as("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("v"))))
    val th = cum.agg(
      min(when(col("cum") >= lit(r1), col("v"))).as("p33"),
      min(when(col("cum") >= lit(r2), col("v"))).as("p66"))
    scored.crossJoin(broadcast(th))
      .select(col("doc_id"), col("dl").as("n_tokens"), col("avg_lp_e6"),
        when(col("avg_lp_e6") > col("p66"), lit("head"))
          .when(col("avg_lp_e6") > col("p33"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** X34 — bigram-LM quality scoring: each doc's mean bigram logprob
    * under an add-one-smoothed corpus bigram model,
    * p(w₂|w₁) = (C(w₁w₂)+1)/(C(w₁·)+|V|) — the natural refinement of
    * x31's unigram scorer (a KenLM-style n-gram filter's first
    * nontrivial order: word order starts to matter, so shuffled or
    * boilerplate-heavy text scores low even when its unigrams are
    * typical).
    *
    * Exactness: per-bigram-type logprobs are ONE ln() of a
    * correctly-rounded quotient of exact-integer-derived doubles,
    * floor-quantized to e6 BEFORE the per-doc exact long Σ tf·lp; the
    * mean uses truncating integer division (`div` ≡ DuckDB `//`).
    *
    * Scale: bigrams come from one generator expression (slice +
    * transform — no self-join on position), then hash aggregates; the
    * model table is O(bigram TYPES) ≪ corpus tokens, equi-joined back
    * on (w₁,w₂) — a plain shuffle join keyed on the bigram (unlike
    * x31's vocab table it is NOT forced broadcast; AQE may still
    * choose to). |V| is one bounded driver scalar (the x31/KMeans
    * posture).
    */
  def bigramLmScores(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
    val bg = t
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(expr("transform(slice(toks, 1, greatest(size(toks)-1, 0)), " +
          "(w, i) -> struct(w AS w1, element_at(toks, i + 2) AS w2))")).as("pr"))
      .select(col("doc_id"), col("dl"), col("pr.w1"), col("pr.w2"))
      // Vacuously-true filter (w2 = element_at within slice bounds is
      // never null), placed here so every subtree BUILT FROM bg is
      // byte-canonically identical (r17 optimization round). Without
      // it the inner join btf⋈lp infers IsNotNull(w2) into the btf
      // and c12 legs but NOT the c1 leg (groupBy(w1) implies no w2
      // constraint), the three legs stop canonicalizing equal, and
      // AQE stage reuse misses the third — measured: the corpus was
      // scanned + bigram-exploded + exchanged 3× per run, and with
      // this filter 1× (executedPlan shows two ReusedExchange nodes;
      // plans/r17/x34_bigram_lm_{before,after}.txt).
      .filter(col("w2").isNotNull)
    // NOT checkpointed (measured): the final plan's btf subtrees share
    // one exchange via AQE stage reuse, so materializing either
    // btf or c12 eagerly ADDS a corpus scan instead of saving one
    // (btf: 1.30→1.50 s, c12: 1.30→2.2 s at sf0.1).
    val btf = bg.groupBy(col("doc_id"), col("dl"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    val c12 = btf.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val v = t.select(explode(col("toks")).as("term"))
      .agg(count_distinct(col("term"))).head().getLong(0)
    val lp = c12.join(c1, "w1").withColumn("lp_e6",
      floor(log((col("c12") + lit(1L)).cast("double") /
          (col("c1") + lit(v)).cast("double")) * lit(1000000.0)).cast("long"))
    btf.join(lp.select(col("w1"), col("w2"), col("lp_e6")), Seq("w1", "w2"))
      .groupBy(col("doc_id"), col("dl"))
      .agg(sum(col("tf") * col("lp_e6")).as("lp_sum_e6"))
      .select(col("doc_id"), (col("dl") - 1L).as("n_bigrams"), col("lp_sum_e6"),
        expr("lp_sum_e6 div (dl - 1)").as("avg_lp_e6"))
  }

  /** X42 — held-out bigram-LM scoring (the CCNet filter shape, Wenzek
    * et al. 2020): the add-one-smoothed bigram model is TRAINED on a
    * reference split and SCORES a disjoint candidate split — the
    * production quality-filter topology (web text scored under a
    * wiki-trained LM), where x34 self-scores one corpus. Unseen
    * candidate bigrams smooth to (0+1)/(C(w₁·)+|V|) and an entirely
    * unseen first word to 1/|V| — both fall out of LEFT joins with
    * coalesce(0), no special cases. Same exactness discipline as x34:
    * one ln() per candidate bigram type of a correctly-rounded
    * quotient of exact integers, e6-floored before the per-doc exact
    * long Σ tf·lp; truncating integer mean.
    *
    * Scale: the trained count tables join the candidate bigrams on
    * their natural (w₁, w₂)/(w₁) keys — shuffle hash joins, NEVER a
    * forced vocab-sized broadcast (the r10 retrieval lesson); |V| is
    * one driver scalar.
    */
  def bigramLmHeldOut(train: DataFrame, cand: DataFrame,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def bigrams(d: DataFrame) = d
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(expr("transform(slice(toks, 1, greatest(size(toks)-1, 0)), " +
          "(w, i) -> struct(w AS w1, element_at(toks, i + 2) AS w2))")).as("pr"))
      .select(col("doc_id"), col("dl"), col("pr.w1"), col("pr.w2"))
    val c12 = bigrams(train).groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val v = train.select(explode(tokens(col(textCol))).as("term"))
      .agg(count_distinct(col("term"))).head().getLong(0)
    val btf = bigrams(cand).groupBy(col("doc_id"), col("dl"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    btf
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .withColumn("lp_e6",
        floor(log((coalesce(col("c12"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c1"), lit(0L)) + lit(v)).cast("double")) *
          lit(1000000.0)).cast("long"))
      .groupBy(col("doc_id"), col("dl"))
      .agg(sum(col("tf") * col("lp_e6")).as("lp_sum_e6"))
      .select(col("doc_id"), (col("dl") - 1L).as("n_bigrams"), col("lp_sum_e6"),
        expr("lp_sum_e6 div (dl - 1)").as("avg_lp_e6"))
  }

  /** T14 — TextRank (Mihalcea & Tarau 2004): weighted PageRank over
    * the document-level term co-occurrence graph — corpus-scale
    * keyword/concept importance, the link-analysis member of the text
    * family. Edges are x30's co-occurrence pairs (count ≥
    * minPairCount, undirected → both directions); `iters` damped
    * rounds of r'(v) = (1-d)·r₀ + d·Σ_{u→v} r(u)·w(uv)/W(u).
    *
    * Exactness: ranks live in e12 integer units; every division is
    * truncating (`div` ≡ DuckDB `//`), total rank mass only shrinks
    * under truncation (so r ≤ 1e12 every round), and the r·w product
    * is staged through DECIMAL(38,0) unconditionally, so no edge
    * weight can overflow it (1e12·2⁶³ ≪ 1e38); 3 rounds replay
    * bit-for-bit in the unrolled oracle.
    *
    * Scale: edge counting is the corpus-heavy stage (same bound as
    * x30: pairs ≤ per-doc-vocab²/2); each round is then two equi-joins
    * + one aggregate over the EDGE table — node and edge tables are
    * vocab-shaped (≪ corpus), the same iterate-over-equi-joins posture
    * as the d11 connected-components loop, with the edge table
    * materialized once and reused across rounds.
    */
  def textRank(docs: DataFrame, minPairCount: Long = 25, iters: Int = 3,
               dampingE6: Long = 850000L,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dt = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(tokens(col(textCol)))).as("term"))
    val a = dt.select(col("doc_id"), col("term").as("term_a"))
    val b = dt.select(col("doc_id"), col("term").as("term_b"))
    val pairs = a.join(b, Seq("doc_id")).filter(col("term_a") < col("term_b"))
      .groupBy(col("term_a"), col("term_b"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minPairCount)
    val edges = pairs.select(col("term_a").as("src"), col("term_b").as("dst"), col("w"))
      .unionByName(pairs.select(col("term_b").as("src"), col("term_a").as("dst"), col("w")))
      .localCheckpoint(true)
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    // Every node of the undirected graph has outgoing weight; isolated
    // terms (no qualifying pair) are not graph nodes.
    val nodes = outW.select(col("src").as("term"))
    val n = outW.count()
    if (n == 0) {
      return nodes.select(col("term"), lit(0L).as("pr_e12")).limit(0)
    }
    val r0 = 1000000000000L / n
    val baseE12 = (1000000L - dampingE6) * r0 / 1000000L
    var ranks = nodes.select(col("term"), lit(r0).as("pr_e12"))
    for (_ <- 0 until iters) {
      val contrib = edges.join(outW, "src")
        .join(ranks.withColumnRenamed("term", "src"), "src")
        // pr_e12·w through decimal(38,0): the Long product overflows
        // once an edge weight passes ~9.2e6 co-occurrences, which a
        // 100 TB corpus reaches. decimal `div` still emits BIGINT and
        // truncates identically, and c ≤ pr_e12 (w ≤ wout) keeps the
        // downstream Long sum safe: Σc ≤ Σpr ≈ 1e12.
        .select(col("dst"),
          expr("(cast(pr_e12 as decimal(38,0)) * w) div wout").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("csum"))
      ranks = nodes.join(contrib.withColumnRenamed("dst", "term"), Seq("term"), "left")
        .select(col("term"),
          (lit(baseE12) +
            expr(s"($dampingE6 * coalesce(csum, 0L)) div 1000000")).as("pr_e12"))
    }
    ranks.select(col("term"), col("pr_e12"))
  }

  /** Document-level PMI for co-occurring term pairs (a < b), counted
    * over DISTINCT terms per doc. pmi_e6 = floor(ln(n_ab·N / (n_a·n_b))
    * ·1e6). The per-doc self-join is bounded by per-doc distinct vocab
    * (pairs ≤ v²/2 per doc), and term totals are broadcast.
    */
  def pmiPairs(docs: DataFrame, minPairCount: Long = 25,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dt = docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(tokens(col(textCol)))).as("term"))
    val n = docs.count()
    val tc = dt.groupBy(col("term")).agg(count(lit(1)).as("n_t"))
    val a = dt.select(col("doc_id"), col("term").as("term_a"))
    val b = dt.select(col("doc_id"), col("term").as("term_b"))
    a.join(b, Seq("doc_id")).filter(col("term_a") < col("term_b"))
      .groupBy(col("term_a"), col("term_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
      .join(broadcast(tc.select(col("term").as("term_a"), col("n_t").as("n_a"))), "term_a")
      .join(broadcast(tc.select(col("term").as("term_b"), col("n_t").as("n_b"))), "term_b")
      .withColumn("pmi_e6",
        floor(log((col("n_ab") * lit(n)).cast("double") /
            (col("n_a") * col("n_b")).cast("double")) * lit(1000000.0)).cast("long"))
      .select(col("term_a"), col("term_b"), col("n_a"), col("n_b"),
        col("n_ab"), col("pmi_e6"))
  }

  /** Batch multi-query BM25: score a whole TABLE of queries
    * (qid, term) against the corpus in ONE pass — the shape an eval
    * harness or hard-negative miner runs at scale, where looping
    * [[bm25TopK]] per query would re-scan the corpus |Q| times.
    * Same scoring formula/quantization as bm25TopK (x27's
    * cross-engine-pinned constants); the query table joins in as a
    * broadcast on `term`, so corpus work stays one explode + hash
    * aggregates regardless of |Q|, and the final top-k is a
    * per-query window (never a global sort).
    *
    * A term shared by several queries fans its (doc, term) rows out
    * |queries containing it| times — bounded by the query table, not
    * the corpus. The (qid, term) pairs are DISTINCT'd first, so a
    * query table carrying duplicate rows cannot double-count a term
    * (bm25TopK's isin is insensitive to duplicates; this keeps the
    * documented equivalence exact).
    *
    * Scale: docFreqs is vocab-sized, so it is semi-joined against the
    * broadcast query-term set BEFORE its own broadcast hint — the
    * build side is |query terms| rows (KBs), never the vocabulary.
    */
  def bm25MultiQuery(docs: DataFrame, queries: DataFrame, topK: Int = 10,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tfs = termFreqs(docs, idCol, textCol)
    // Corpus stats (N, Σdl) as an IN-PLAN one-row broadcast (the h15
    // posture) instead of a driver .head(): the whole query is one
    // job, and the arithmetic is unchanged — avgdl is still evaluated
    // as s/n before the per-row division, so every double matches the
    // former literal bit-for-bit.
    val stats = docs
      .select(size(tokens(col(textCol))).cast("long").as("dl"))
      .agg(sum(col("dl")).as("__sumdl"), count(lit(1)).as("__n"))
    val nD = col("__n").cast("double")
    val dfD = col("df").cast("double")
    val idf = log(lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
    val tfD = col("tf").cast("double")
    val den = tfD + lit(1.2) *
      (lit(0.25) + lit(0.75) *
        (col("dl").cast("double") / (col("__sumdl").cast("double") / nD)))
    val qterms = queries.select(col("qid"), col("term")).distinct()
    val qdf = docFreqs(tfs)
      .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"), "left_semi")
    val scored = tfs
      .join(broadcast(qterms), "term")
      .join(broadcast(qdf), "term")
      .crossJoin(broadcast(stats))
      .withColumn("part_e9", floor(idf * (tfD * lit(2.2) / den) *
        lit(1000000000.0)).cast("long"))
    val perDoc = scored.groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("part_e9")).as("bm25_e9"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("bm25_e9").desc, col("doc_id"))
    perDoc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("doc_id"),
        col("n_terms"), col("bm25_e9"))
  }

  /** DCG position discounts 1/log₂(i+1) for i = 1..k, floor-quantized
    * to e6 — computed ONCE here and injected verbatim into the DuckDB
    * oracle, so both engines share the identical literal table (no
    * cross-engine log₂ to trust).
    */
  def dcgDiscountsE6(k: Int): Seq[Long] =
    (1 to k).map(i =>
      math.floor(1000000.0 * math.log(2.0) / math.log(i + 1.0)).toLong)

  /** Ideal-DCG prefix sums: idcg(j) = Σ_{i≤j} disc(i), j = 1..k. */
  def idcgPrefixE6(k: Int): Seq[Long] =
    dcgDiscountsE6(k).scanLeft(0L)(_ + _).tail

  /** Offline retrieval evaluation: recall@k, MRR and nDCG@k per query
    * from a ranked result table (qid, rank, doc_id) and a binary
    * relevance-label table (qid, doc_id) — the metric layer every
    * retriever/embedding ablation is judged on. All three metrics are
    * exact integers: DCG sums the literal e6 discount table, ideal
    * DCG is its prefix sum at min(k, n_rel), and the final ratios use
    * truncating integer division.
    *
    * Scale: one equi-join of results against labels on (qid, doc_id),
    * then per-qid hash aggregates — both sides are |Q|·k / label-table
    * shaped, never corpus-shaped. Queries with zero retrieved-relevant
    * docs still emit a row (left join from the label-count frame).
    */
  def rankingMetrics(results: DataFrame, relevant: DataFrame,
                     k: Int = 10): DataFrame = {
    val disc = dcgDiscountsE6(k)
    val idcg = idcgPrefixE6(k)
    val nRel = relevant.groupBy(col("qid")).agg(count(lit(1)).as("n_rel"))
    val hits = results.filter(col("rank") <= k)
      .join(relevant.select(col("qid"), col("doc_id")), Seq("qid", "doc_id"))
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_hit"),
        min(col("rank")).as("__first"),
        sum(element_at(typedLit(disc), col("rank").cast("int"))).as("dcg_e6"))
    nRel.join(hits, Seq("qid"), "left")
      .select(col("qid"), col("n_rel"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        expr("coalesce(n_hit, 0L) * 1000000L div n_rel").as("recall_e6"),
        coalesce(expr("1000000L div `__first`"), lit(0L)).as("mrr_e6"),
        coalesce(col("dcg_e6"), lit(0L)).as("dcg_e6"),
        coalesce(
          expr(s"dcg_e6 * 1000000L div element_at(" +
            s"array(${idcg.mkString("L,")}L), cast(least(n_rel, $k) as int))"),
          lit(0L)).as("ndcg_e6"))
  }
}
