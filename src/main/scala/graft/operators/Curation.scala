package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end curation pipeline a training-data run actually
  * executes, composed from the library's verified operators in their
  * canonical order:
  *
  *   quality gate → exact dedup → near dedup (LSH → verify → CC
  *   survivors) → benchmark decontamination → per-source caps →
  *   token-budget shard packing
  *
  * Each stage is individually oracle-checked (t1/d1/d7/d11/d13/x7/
  * x10); this composition exists so the LIBRARY-level contract is
  * tested too: the whole chain is deterministic under any
  * partitioning (CurationSpec re-runs it at different parallelism and
  * requires identical shard assignments), stages only ever shrink the
  * doc set, and nothing in the chain introduces a driver-side
  * collect or a corpus-wide quadratic step beyond what the stage
  * operators already bound (LSH buckets, broadcast bench windows).
  */
object Curation {

  /** Tuning knobs, defaulted to the canonical small-corpus values
    * used in specs. At production scale the same fields apply — only
    * magnitudes change.
    */
  case class Config(
      minTokens: Long = 5,
      maxDupTokenFracE6: Long = 700000L,
      minJaccardE6: Long = 500000L,
      benchWindowK: Int = 8,
      maxContamFracE6: Long = 200000L,
      perSourceCap: Int = Int.MaxValue,
      shardTokenBudget: Long = 5000L,
      dropLmTail: Boolean = false)

  /** Runs the pipeline over `docs` (doc_id, text, source, ...);
    * `benchPred` marks the held-out eval slice to decontaminate
    * against (those rows are excluded from the output corpus) and
    * must reference only (doc_id, text, source) — the columns every
    * internal stage carries; a predicate over other input columns
    * fails resolution at the decontamination stage.
    * Returns (doc_id, source, n_tokens, shard_id).
    */
  def curate(docs: DataFrame, benchPred: Column,
             cfg: Config = Config()): DataFrame = {
    // 1. Quality gate — scan-side projections only.
    val featured = TextAnalysis.repetitionStats(docs.filter(!benchPred))
      .join(docs.select(col("doc_id"), col("text"), col("source")), Seq("doc_id"))
      .filter(col("n_tokens") >= cfg.minTokens &&
        col("dup_token_frac_e6") <= cfg.maxDupTokenFracE6)
      .select(col("doc_id"), col("text"), col("source"), col("n_tokens"))

    // 1b. Optional corpus-relative LM-quality gate (x31): drop the
    // bottom tercile by mean unigram logprob under the corpus's own
    // unigram model — the CCNet-style perplexity filter. The tail set
    // is corpus/3-sized, so this is a plain shuffle anti-join, NOT a
    // broadcast (unlike the contamination set below).
    val gated =
      if (!cfg.dropLmTail) featured
      else featured.join(
        Retrieval.unigramQualityBuckets(featured)
          .filter(col("bucket") === "tail").select(col("doc_id")),
        Seq("doc_id"), "left_anti")

    // 2. Exact dedup, then transitive-correct near dedup. The
    // survivor frame feeds TWO plan branches (decontamination input
    // and the final anti-join); an eager localCheckpoint materializes
    // it once so the gate scan + tokenization + dedup subtree does
    // not execute twice per action (ReuseExchange only dedupes from
    // the first shuffle down — the Dedup.scala:196 rationale).
    val exact = Dedup.exactDedup(gated)
    val near = Dedup.nearDedupCC(exact, minJaccardE6 = cfg.minJaccardE6)
      .localCheckpoint(true)

    // 3. Window-level decontamination vs the benchmark slice — run
    // over the SURVIVORS plus the bench rows, not the raw corpus:
    // tokenizing and window-exploding documents the gate or dedup
    // already dropped would be a full wasted pass in the normal
    // regime where those stages remove a large fraction. benchPred
    // sees (doc_id, text, source) here, the documented input schema.
    val decontamInput = near.select(col("doc_id"), col("text"), col("source"))
      .unionByName(docs.filter(benchPred)
        .select(col("doc_id"), col("text"), col("source")))
    val contaminated = Dedup.windowDecontamination(
        decontamInput, benchPred, k = cfg.benchWindowK)
      .filter(col("contam_frac_e6") > cfg.maxContamFracE6)
      .select(col("doc_id"))
    val clean = near.join(broadcast(contaminated), Seq("doc_id"), "left_anti")

    // 4. Per-source caps (deterministic smallest-hash-k per stratum).
    val capped =
      if (cfg.perSourceCap == Int.MaxValue) clean
      else Sampling.stratifiedSample(clean, "source", "doc_id", cfg.perSourceCap)

    // 5. Token-budget shard packing.
    Sampling.packByTokenBudget(
        capped.select(col("doc_id"), col("source"), col("n_tokens")),
        "doc_id", "n_tokens", budget = cfg.shardTokenBudget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("shard_id"))
  }
}
