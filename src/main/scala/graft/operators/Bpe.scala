package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BPE tokenizer training primitives (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * corpus-scale inner loop of training a tokenizer, the step a
  * training-data pipeline runs BEFORE token counting can exist.
  *
  * The expensive part of BPE training is corpus-wide pair counting;
  * the merge loop itself runs over the WORD-FREQUENCY table (vocab-
  * sized, ≪ corpus — the standard trick: identical words share one
  * row with a count). Both live here:
  *
  *   - [[pairStats]]: one full pass — corpus-weighted adjacent-pair
  *     frequencies + the selected first merge + its compression gain.
  *     This is the oracle-checked t10 query (everything is hash
  *     aggregates over generator expressions; the only window runs on
  *     the top-K frame AFTER a TakeOrderedAndProject cap).
  *   - [[learnMerges]]: the full iterative trainer — k rounds of
  *     count→select→apply over the word table. Each round's top pair
  *     is one bounded driver scalar (the KMeans-centroid posture) and
  *     the merge application is a single left-to-right `aggregate`
  *     fold per word — greedy non-overlapping, exactly the reference
  *     BPE behavior ("aaa" + merge (a,a) → ["aa","a"], the merged
  *     token does NOT cascade within the same pass).
  *
  * Scale: the corpus is touched ONCE (word counting); all k merge
  * rounds iterate the vocab-sized word table. At web scale that table
  * is a few million rows — executor-trivial; the driver sees one
  * 2-string row per round.
  */
object Bpe {

  /** Adjacent character pairs of a word, with multiplicity
    * (overlapping positions count — "aaa" yields (a,a) twice, the BPE
    * adjacency count). Words shorter than 2 chars yield none.
    */
  private def charPairs(word: Column): Column =
    when(length(word) < 2, array().cast("array<string>"))
      .otherwise(expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))

  /** T10 — the first BPE training step over a document corpus: the
    * top-K corpus-weighted adjacent-pair frequencies, which pair the
    * trainer would merge first (rank 1 by count desc, pair asc), and
    * each pair's compression gain (`merge_savings` = how many symbols
    * one merge pass would remove = non-overlapping left-to-right
    * occurrence count × word frequency, summed — counted via
    * `replace`, whose left-to-right non-overlap semantics the two
    * engines share).
    */
  def pairStats(docs: DataFrame, topK: Int = 10,
                textCol: String = "text"): DataFrame = {
    val wc = docs.select(explode(Retrieval.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
    val pc = wc.select(col("wc"), explode(charPairs(col("word"))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("cnt"))
    // Top-K via TakeOrderedAndProject (total order: pair is unique);
    // the rank window runs on the ≤K-row result, not the corpus.
    val topk = pc.orderBy(col("cnt").desc, col("pair").asc).limit(topK)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("cnt").desc, col("pair").asc)))
    val savings = topk.select(col("pair")).crossJoin(wc)
      .select(col("pair"),
        (expr("(length(word) - length(replace(word, pair, ''))) div 2")
          * col("wc")).as("occ_w"))
      .groupBy(col("pair")).agg(sum(col("occ_w")).as("merge_savings"))
    topk.join(savings, Seq("pair"))
      .select(col("pair"), col("cnt"), col("rnk"),
        (col("rnk") === 1).as("is_selected"), col("merge_savings"))
  }

  /** Full iterative BPE training: `n` rounds of pair-count → select
    * (count desc, (s1, s2) asc) → greedy left-to-right merge over the
    * word-frequency table. Returns the learned merge list in order.
    * Each round is one vocab-sized aggregate plus a 1-row collect;
    * the word table re-derives per round via a fold expression (plan
    * depth grows linearly in n — localCheckpoint if n is large).
    */
  def learnMerges(docs: DataFrame, n: Int,
                  textCol: String = "text"): Seq[(String, String)] = {
    var words = docs.select(explode(Retrieval.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .select(expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        .as("syms"), col("wc"))
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    for (_ <- 0 until n) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("s1").asc, col("s2").asc).limit(1)
        .collect()
      if (top.nonEmpty) {
        val (s1, s2) = (top.head.getString(0), top.head.getString(1))
        merges += ((s1, s2))
        words = applyMerge(words, s1, s2)
        // Bound plan depth across rounds (each round nests a fold).
        words = words.localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** Corpus-weighted adjacent SYMBOL pair counts over the word table
    * (s1, s2, cnt).
    */
  private[graft] def pairCounts(words: DataFrame): DataFrame =
    words.select(col("wc"),
        explode(expr("transform(slice(syms, 1, greatest(size(syms) - 1, 0)), " +
          "(s, i) -> struct(s AS s1, element_at(syms, i + 2) AS s2))")).as("pr"))
      .groupBy(col("pr.s1").as("s1"), col("pr.s2").as("s2"))
      .agg(sum(col("wc")).as("cnt"))

  /** One greedy left-to-right merge pass over a symbol array: fold,
    * joining a (s1, s2) adjacency into one token; the merged token is
    * not re-considered against the following symbol within this pass.
    */
  private[graft] def mergeSyms(syms: Column, s1: String, s2: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(s1) && x === lit(s2),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(s1 + s2))))
        .otherwise(concat(acc, array(x))))

  private[graft] def applyMerge(words: DataFrame, s1: String, s2: String): DataFrame =
    words.select(mergeSyms(col("syms"), s1, s2).as("syms"), col("wc"))

  /** Tokenizer APPLICATION — encode the corpus with a learned merge
    * list and report per-source compression. The encode runs over the
    * DISTINCT-WORD table (vocab-sized, the same trick the trainer
    * uses: identical words share one encode), then joins back to the
    * per-(source, word) counts — the corpus text is scanned once for
    * tokenization and never again. compression_e6 is chars-per-token
    * in exact integer micro-units.
    */
  def encodeStats(docs: DataFrame, merges: Seq[(String, String)],
                  textCol: String = "text"): DataFrame = {
    val toks = docs.select(col("source"),
      explode(Retrieval.tokens(col(textCol))).as("word"))
    val swc = toks.groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("cnt"))
    var wenc = swc.select(col("word")).distinct()
      .withColumn("syms",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
    merges.foreach { case (s1, s2) =>
      wenc = wenc.select(col("word"), mergeSyms(col("syms"), s1, s2).as("syms"))
    }
    val wsym = wenc.select(col("word"), size(col("syms")).cast("long").as("n_sym"))
    swc.join(wsym, Seq("word"))
      .groupBy(col("source"))
      .agg(
        sum(col("cnt")).as("n_words"),
        sum(length(col("word")).cast("long") * col("cnt")).as("n_chars"),
        sum(col("n_sym") * col("cnt")).as("n_bpe_tokens"))
      .select(col("source"), col("n_words"), col("n_chars"), col("n_bpe_tokens"),
        expr("n_chars * 1000000 div n_bpe_tokens").as("compression_e6"))
  }
}
