package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline
  * (north-star extensions, SURVEY.md §7.6): token counting, quality
  * scoring, language identification, document fingerprinting.
  *
  * Everything here is a per-row projection built from codegen'd
  * `functions._` / higher-order array functions — no UDFs, no shuffle,
  * so the operators run at scan speed and scale embarrassingly to any
  * number of executors. Scores that feed cross-engine checks are
  * computed in integer micro-units (deterministic; float division
  * rounding is engine-specific).
  */
object TextAnalysis {

  /** Whitespace tokens with empties removed (split keeps a trailing
    * empty string when the text ends in whitespace).
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** BPE-ish subword proxy: alpha runs, single digits, single
    * punctuation marks — the shape of a GPT-2-style pre-tokenizer.
    */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Count of non-alphanumeric, non-space characters. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[^A-Za-z0-9 \\t\\n]", ""))

  /** Per-language stopword marker lists for the n-gram/stopword
    * language-ID heuristic.
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "un", "est", "ne"),
    "es" -> Seq("el", "los", "las", "y", "es", "no", "por"))

  /** Stopword-hit primitive: a native codegen'd set-membership count
    * (one HashSet probe per token), replacing the interpreted
    * `size(filter(toks, isin))` HOF — see
    * [[graft.functions.CountInSet]] for the measured rationale.
    */
  private def hits(toks: Column, words: Seq[String]): Column =
    graft.functions.ArrayFunctions.countInSet(toks, words)

  /** Language-ID: CJK characters dominate, otherwise the language with
    * the most stopword hits wins (fixed precedence en > de > fr > es
    * on ties; "und" = undetermined when nothing matches).
    */
  def langId(text: Column): Column =
    langIdFromToks(tokens(lower(text)), text)

  /** Language-ID decision over an ALREADY-TOKENIZED array column —
    * the staged form corpus-scale callers use: the four stopword
    * filters are interpreted HOFs, so embedding `tokens(lower(text))`
    * in each (as the naive single expression does) re-splits the text
    * four times per row. Staging the token array as its own projection
    * column runs the split once (CollapseProject keeps the stage:
    * the producer expression is non-cheap and referenced four times).
    * CJK detection via regexp_count — counts matches without
    * materializing a match array.
    */
  def langIdFromToks(toks: Column, text: Column): Column =
    langIdFromHits(regexp_count(text, lit("[\\u4e00-\\u9fff]")),
      hits(toks, Stopwords("en")), hits(toks, Stopwords("de")),
      hits(toks, Stopwords("fr")), hits(toks, Stopwords("es")))

  /** Per-language stopword hit count over a token array column —
    * corpus-scale callers stage these as projection columns so each
    * (interpreted) HOF filter pass runs once per row.
    */
  def stopwordHits(toks: Column, lang: String): Column = hits(toks, Stopwords(lang))

  /** The language decision alone, over pre-computed feature columns.
    * The when-chain references `en`/`de`/`fr`/`es` up to four times
    * each: inlined hit-count expressions would be re-EVALUATED at
    * every reference (no subexpression elimination outside codegen —
    * ~15 passes per row in the old HOF form), so hot paths must pass
    * ATTRIBUTES staged by a previous projection (CollapseProject
    * keeps the stage: the producers are non-cheap and multiply
    * referenced). Staging + the native CountInSet hit counter took
    * t2 from 0.70 s to 0.28 s warm at sf0.1 (2.5×).
    */
  def langIdFromHits(cjk: Column, en: Column, de: Column,
                     fr: Column, es: Column): Column =
    when(cjk > 0, "zh")
      .when(en > 0 && en >= de && en >= fr && en >= es, "en")
      .when(de > 0 && de >= fr && de >= es, "de")
      .when(fr > 0 && fr >= es, "fr")
      .when(es > 0, "es")
      .otherwise("und")

  /** Quality score in integer micro-units (0..1e6): mean of
    *  - length component: min(1, n_tokens/50)
    *  - cleanliness: 1 - punct_ratio
    *  - stopword component: stopword_hits / n_tokens
    * Exact integer arithmetic end-to-end.
    */
  def qualityE6(text: Column): Column = {
    val toks = tokens(lower(text))
    val nTok = size(toks).cast("long")
    val nChars = length(text).cast("long")
    val punct = punctCount(text).cast("long")
    val stop = hits(toks, Stopwords.values.flatten.toSeq).cast("long")
    // Integer floor division; quotients here are never within double
    // rounding error of an integer boundary (denominators <= 1e6), so
    // divide-then-truncate equals exact floor.
    val lenC = least(lit(1000000L), nTok * 20000L)
    val cleanC = when(nChars > 0, ((nChars - punct) * 1000000L / nChars).cast("long")).otherwise(0L)
    val stopC = when(nTok > 0, (stop * 1000000L / nTok).cast("long")).otherwise(0L)
    ((lenC + cleanC + stopC) / 3).cast("long")
  }

  /** Canonical normalized form: lowercase, whitespace collapsed. */
  def normalized(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Content fingerprint: md5 of the normalized text (portable across
    * engines, collision-negligible at corpus scale).
    */
  def fingerprintMd5(text: Column): Column = md5(normalized(text).cast("binary"))

  /** Rolling polynomial hash over the normalized characters
    * (h = h*31 + codepoint mod 1e9+7) — the classic Rabin-Karp shape,
    * kept in portable integer arithmetic so any engine reproduces it.
    */
  def fingerprintPoly(text: Column): Column =
    graft.functions.PolyHashFunctions.polyHash(normalized(text), 31L, 1000000007L)

  /** Repetition (Gopher-style quality) stats per document: duplicate
    * token fraction and most-frequent-bigram fraction, in exact e6
    * integer fractions, plus a combined `repetitive` flag.
    *
    * Shape at scale: the per-doc features are a scan-side projection;
    * the top-bigram count is explode -> two hash aggregations keyed by
    * (doc_id, bigram) then doc_id — shuffle volume O(total bigrams),
    * fully parallel, no global state. (The bigram list is built with
    * the interpreted HOF form rather than a native expression: unlike
    * the shingle path it keeps duplicates, runs once per doc, and is
    * nowhere near any hot loop.)
    */
  def repetitionStats(docs: DataFrame, textCol: String = "text",
                      dupTokenThresholdE6: Long = 700000L,
                      topBigramThresholdE6: Long = 200000L): DataFrame = {
    val P = Dedup.P
    // Stage the token-hash array through a projection (HOF lambdas
    // re-evaluate inlined trees per reference).
    val staged = docs.select(col("doc_id"), Dedup.tokenHashes(col(textCol)).as("__th"))
    val feat = staged.select(
      col("doc_id"),
      size(col("__th")).cast("long").as("n_tokens"),
      size(array_distinct(col("__th"))).cast("long").as("n_distinct_tokens"),
      when(size(col("__th")) >= 2,
        transform(sequence(lit(0), size(col("__th")) - 2),
          i => pmod(element_at(col("__th"), i + 1) * 131L + element_at(col("__th"), i + 2), lit(P))))
        .otherwise(array().cast("array<bigint>")).as("bg"))
    val top = feat.select(col("doc_id"), explode(col("bg")).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"))
    feat.join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
        when(col("n_tokens") > 0,
          expr("((n_tokens - n_distinct_tokens) * 1000000) div n_tokens"))
          .otherwise(0L).as("dup_token_frac_e6"),
        when(col("n_tokens") >= 2 && col("top_c").isNotNull,
          expr("(top_c * 1000000) div (n_tokens - 1)"))
          .otherwise(0L).as("top_bigram_frac_e6"))
      .withColumn("repetitive",
        when(col("dup_token_frac_e6") > dupTokenThresholdE6 ||
          col("top_bigram_frac_e6") > topBigramThresholdE6, 1L).otherwise(0L))
  }

  /** Token-window chunking — the training-prep step that turns
    * documents into fixed-budget model inputs: windows of
    * `chunkTokens` whitespace tokens, advancing by
    * `chunkTokens - overlap`, so consecutive chunks share `overlap`
    * tokens of context. Pure projection + generator: the token array
    * is staged once, starts come from `sequence`, and each chunk is a
    * `slice` — no shuffle, no UDF; chunk cardinality is
    * ceil(tokens/step) per doc regardless of corpus size.
    *
    * Emits (id, chunk_idx, start_tok, n_tok, chunk_md5) — the md5 of
    * the space-joined window pins the exact chunk text without
    * shipping it. Docs with no tokens produce no chunks.
    */
  def chunkByTokens(docs: DataFrame, chunkTokens: Int = 128, overlap: Int = 32,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(overlap >= 0 && chunkTokens > overlap,
      s"need chunkTokens > overlap >= 0, got chunkTokens=$chunkTokens overlap=$overlap")
    val step = chunkTokens - overlap
    docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .withColumn("__starts",
        when(col("__n") > 0, sequence(lit(0), col("__n") - 1, lit(step)))
          .otherwise(array().cast("array<int>")))
      .select(col(idCol), col("__toks"),
        posexplode(col("__starts")).as(Seq("chunk_idx", "start_tok")))
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        slice(col("__toks"), col("start_tok") + 1, lit(chunkTokens)).as("__chunk"))
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        size(col("__chunk")).cast("long").as("n_tok"),
        md5(array_join(col("__chunk"), " ").cast("binary")).as("chunk_md5"))
  }

  /** Corpus vocabulary head: top-k tokens by total frequency, with
    * document frequency. explode → one hash aggregate keyed by token
    * (map-side partials make shuffle volume O(distinct tokens per
    * partition), not O(token instances)), then a TakeOrderedAndProject
    * top-k — per-partition heads merge on the driver, no global sort.
    * Ties break on the token string so the cut is deterministic.
    */
  def vocabTopK(docs: DataFrame, k: Int = 50, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col(idCol)).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(k)

  /** PII patterns — deliberately simple expressions that parse and
    * match identically under Java regex (Spark) and RE2 (DuckDB,
    * re2/Go): plain character classes and counted repetition only, no
    * lookarounds, no backreferences.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val SsnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val PhonePattern = "\\+[0-9]{2} [0-9]{3} [0-9]{3} [0-9]{4}"

  /** Per-document PII scan: match counts per category plus an md5 of
    * the redacted text (emails → [EMAIL], IPs → [IP], SSNs → [ID],
    * phones → [PHONE], applied in that fixed order). A pure scan-side
    * projection — no shuffle, no UDF; the regexes run inside codegen —
    * so the scan cost is the only cost at any corpus size.
    */
  def piiStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailPattern, "[EMAIL]"),
            Ipv4Pattern, "[IP]"),
          SsnPattern, "[ID]"),
        PhonePattern, "[PHONE]")
    docs
      .withColumn("n_email", regexp_count(t, lit(EmailPattern)).cast("long"))
      .withColumn("n_ipv4", regexp_count(t, lit(Ipv4Pattern)).cast("long"))
      .withColumn("n_ssn", regexp_count(t, lit(SsnPattern)).cast("long"))
      .withColumn("n_phone", regexp_count(t, lit(PhonePattern)).cast("long"))
      .withColumn("pii_total",
        col("n_email") + col("n_ipv4") + col("n_ssn") + col("n_phone"))
      .withColumn("redacted_md5", md5(redacted.cast("binary")))
  }

  /** T9 — character-class composition stats, the C4/Gopher-style
    * quality gates (alphabetic ratio, digit/uppercase load, non-ASCII
    * share) expressed as exact integer counts + e6 fractions. Pure
    * scan-side projection like piiStats: the per-char regex counts run
    * inside codegen, no shuffle, no UDF — scan cost is the only cost
    * at any corpus size. Character classes are restricted to forms
    * Java regex and RE2 interpret identically (explicit ranges, no
    * POSIX classes, no properties).
    */
  def charsetStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    def cnt(pattern: String) = regexp_count(t, lit(pattern)).cast("long")
    docs
      .withColumn("n_cp", length(t).cast("long"))
      .withColumn("n_alpha", cnt("[A-Za-z]"))
      .withColumn("n_digit", cnt("[0-9]"))
      .withColumn("n_upper", cnt("[A-Z]"))
      .withColumn("n_space", cnt("[ \\t\\n\\r]"))
      .withColumn("n_non_ascii", cnt("[^\\x00-\\x7f]"))
      .withColumn("alpha_frac_e6",
        expr("CASE WHEN n_cp = 0 THEN 0L ELSE n_alpha * 1000000L div n_cp END"))
      .withColumn("non_ascii_frac_e6",
        expr("CASE WHEN n_cp = 0 THEN 0L ELSE n_non_ascii * 1000000L div n_cp END"))
  }

  /** T15 — readability scoring (Flesch reading ease + Flesch-Kincaid
    * grade), the classic curation signal for filtering too-simple or
    * machine-garbled text. Syllables are approximated as maximal
    * vowel runs — the standard cheap heuristic; what matters for a
    * 100 TB filter is that it is a single codegen'd regex count, not
    * a dictionary lookup. All three counts are exact integers and
    * both scores are exact truncating e3 fixed-point (206.835 −
    * 1.015·w/s − 84.6·y/w and 0.39·w/s + 11.8·y/w − 15.59, each
    * rational term truncated independently via `div` — mirrored
    * literally by the oracle's `//`), so results are bit-identical
    * across engines and partitionings. Documents with no words or no
    * sentence terminators get NULL scores, not a division blow-up.
    * Character classes avoid lower()/case-folding and POSIX classes —
    * only explicit ranges, which Java regex and RE2 read identically.
    * Pure scan-side projection: no shuffle, no UDF.
    */
  def readability(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    docs.select(
      col(idCol),
      regexp_count(t, lit("[A-Za-z0-9]+")).cast("long").as("n_words"),
      regexp_count(t, lit("[.!?]+")).cast("long").as("n_sentences"),
      regexp_count(t, lit("[AEIOUYaeiouy]+")).cast("long").as("n_syllables"))
      .withColumn("fre_e3",
        expr("""CASE WHEN n_words = 0 OR n_sentences = 0 THEN NULL
                ELSE 206835L - (1015L * n_words) div n_sentences
                            - (84600L * n_syllables) div n_words END"""))
      .withColumn("fk_grade_e3",
        expr("""CASE WHEN n_words = 0 OR n_sentences = 0 THEN NULL
                ELSE (390L * n_words) div n_sentences
                     + (11800L * n_syllables) div n_words - 15590L END"""))
  }

  /** T11 — hashed-n-gram linear classifier inference: the
    * fastText-style quality scorer of CCNet/LLaMA-era curation
    * pipelines, run at corpus scale. The hashing trick maps token
    * uni+bigrams into `nBuckets` feature buckets via the codegen'd
    * PolyHash; the model is one weight per bucket; the score is the
    * weight sum. Weights here are a deterministic pseudo-random
    * stand-in (integer milli-units derived from the bucket id by a
    * Knuth-multiplicative mix) — a trained model swaps in a broadcast
    * weight array without touching the featurization. What the
    * operator pins is the scale shape: inference is a pure scan-side
    * projection (tokenize -> hash -> weight -> exact integer fold), no
    * shuffle, no UDF, no model server, bit-identical on any partition
    * count.
    */
  /** The uni+bigram feature expansion of a text column — shared by the
    * batch scorer and the streaming admission gate.
    */
  def ngramFeatures(text: Column): Column =
    ngramFeaturesFromToks(tokens(lower(text)))

  /** The same expansion over an ALREADY-TOKENIZED array column — the
    * staged form hot paths use (the langIdFromToks discipline): the
    * expansion references its token input SIX times (concat + size +
    * two slices with their own size bounds), and higher-order
    * functions are interpreted with no codegen CSE, so an inlined
    * `tokens(lower(text))` re-splits the text six times per row.
    * Callers stage the token array as a projection attribute and pay
    * one split.
    */
  def ngramFeaturesFromToks(toks: Column): Column =
    concat(toks,
      when(size(toks) < 2, array().cast("array<string>"))
        .otherwise(zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => concat(a, lit(" "), b))))

  /** The classifier score as a pure column expression over a grams
    * array (hash → weight → exact integer fold) — usable in any batch
    * or streaming projection.
    */
  def ngramScoreMilli(grams: Column, nBuckets: Int = 4096): Column = {
    val P = 1000000007L
    def weight(b: Column): Column =
      pmod(b * lit(2654435761L) + lit(12345L), lit(P)) % 2001L - 1000L
    val buckets = transform(grams, g =>
      pmod(graft.functions.PolyHashFunctions.polyHash(g, 31L, P), lit(nBuckets.toLong)))
    aggregate(buckets, lit(0L), (acc, b) => acc + weight(b))
  }

  def hashedNgramScore(docs: DataFrame, nBuckets: Int = 4096,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // NULL text scores like empty text (0 grams, score 0, 'drop') —
    // without the coalesce, size(null grams) = -1 leaks a sentinel
    // into n_grams and the label turns on null comparison semantics.
    val staged = docs
      .withColumn("__grams", ngramFeatures(coalesce(col(textCol), lit(""))))
      .withColumn("score_milli", ngramScoreMilli(col("__grams"), nBuckets))
    staged.select(
      col(idCol),
      size(col("__grams")).cast("long").as("n_grams"),
      col("score_milli"),
      when(col("score_milli") > 0, lit("keep")).otherwise(lit("drop")).as("label"))
  }

  /** Gopher/C4-style hard quality gate (Rae et al. 2021 §A1.1; Raffel
    * et al. 2020 §2.2): per-document boolean fail flags for seven
    * threshold rules plus the pass verdict and a first-fail
    * `reject_reason` (rules checked in declaration order — the funnel
    * convention quality dashboards use). The continuous scorers (t11
    * hashed-n-gram, qualityE6) rank documents; this is the hard
    * *filter* stage that decides keep/drop with an attributable
    * reason per drop.
    *
    * Rules (all exact integer comparisons — thresholds are rational,
    * so `a/b < t` is written `a*denom < b*num` and no division ever
    * runs):
    *   short    n_tok < 20            long    n_tok > 1000
    *   wordlen  mean token length outside [2, 12] (non-space chars
    *            per token — multi-space runs don't distort it)
    *   alpha    < 70% of tokens contain an ASCII letter
    *   stop     < 2 stopword hits (any language list)
    *   symbol   > 10% punctuation characters
    *   rep      most frequent token > 20% of tokens
    *
    * Scale: every feature except `rep` is a scan-side codegen'd
    * projection; `rep` is one explode → two hash aggregates keyed by
    * (doc, token) then doc (the t5 posture — shuffle O(total tokens),
    * no global state), joined back on doc_id.
    */
  /** T18 — per-document token (unigram) Shannon entropy in exact e6
    * integers: H = −Σ (tf/n)·ln(tf/n), the low-entropy signal that
    * flags machine-generated / template / keyword-stuffed text whose
    * REPETITION fraction (t5) can still look normal — a handful of
    * distinct tokens cycled evenly has zero max-gram repetition but
    * collapsed entropy. Exactness discipline = x31/x34: one ln() per
    * (doc, distinct token) of a correctly-rounded exact-integer
    * quotient, e6-floored BEFORE the exact long Σ tf·lp, truncating
    * final division — so the score hash-matches the oracle. Also
    * emits the normalized form H/ln(n_distinct)·e6 (1e6 = perfectly
    * even usage; NULL when a doc has a single distinct token and the
    * ratio is 0/0).
    *
    * Shape at scale: one explode + one (doc, token) hash aggregate +
    * one per-doc aggregate — the t5/t17 shuffle, O(total tokens) with
    * map-side partials, output O(docs).
    */
  def tokenEntropy(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val tf = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    tf.withColumn("lp_e6",
        floor(log(col("tf").cast("double") / col("dl").cast("double")) *
          lit(1000000.0)).cast("long"))
      .groupBy(col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(col("tf") * col("lp_e6")).as("__s"))
      .select(col("doc_id"), col("dl").as("n_tokens"), col("n_distinct"),
        (-col("__s")).as("__neg"))
      .withColumn("entropy_e6", expr("__neg div n_tokens"))
      .withColumn("norm_entropy_e6",
        when(col("n_distinct") === 1, lit(null).cast("long"))
          .otherwise(floor(col("entropy_e6").cast("double") /
            log(col("n_distinct").cast("double"))).cast("long")))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("entropy_e6"), col("norm_entropy_e6"))
  }

  def qualityGate(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(lower(t))
    val base = docs
      .withColumn("n_tok", size(toks).cast("long"))
      .withColumn("nonspace", length(regexp_replace(t, "\\s", "")).cast("long"))
      .withColumn("alpha_toks",
        size(filter(toks, x => x.rlike("[a-z]"))).cast("long"))
      .withColumn("stop_hits",
        hits(toks, Stopwords.values.flatten.toSeq).cast("long"))
      .withColumn("punct", punctCount(t).cast("long"))
      .withColumn("n_chars_g", length(t).cast("long"))
    val topTok = docs
      .select(col(idCol), explode(tokens(lower(t))).as("__tok"))
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(max(col("__c")).as("top_tok_cnt"))
    // Left join + coalesce: a token-free document has no topTok row
    // but must still flow through the gate (and fail `short`).
    val flagged = base.join(topTok, Seq(idCol), "left")
      .withColumn("top_tok_cnt", coalesce(col("top_tok_cnt"), lit(0L)))
      .withColumn("f_short", col("n_tok") < 20L)
      .withColumn("f_long", col("n_tok") > 1000L)
      .withColumn("f_wordlen",
        col("nonspace") < col("n_tok") * 2L || col("nonspace") > col("n_tok") * 12L)
      .withColumn("f_alpha", col("alpha_toks") * 10L < col("n_tok") * 7L)
      .withColumn("f_stop", col("stop_hits") < 2L)
      .withColumn("f_symbol", col("punct") * 10L > col("n_chars_g"))
      .withColumn("f_rep", col("top_tok_cnt") * 5L > col("n_tok"))
    flagged
      .withColumn("pass",
        !(col("f_short") || col("f_long") || col("f_wordlen") || col("f_alpha") ||
          col("f_stop") || col("f_symbol") || col("f_rep")))
      .withColumn("reject_reason",
        when(col("f_short"), "short").when(col("f_long"), "long")
          .when(col("f_wordlen"), "wordlen").when(col("f_alpha"), "alpha")
          .when(col("f_stop"), "stop").when(col("f_symbol"), "symbol")
          .when(col("f_rep"), "rep").otherwise("pass"))
  }

  /** Full per-document feature projection. */
  def features(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_chars_m", length(t).cast("long"))
      .withColumn("n_tokens", size(tokens(t)).cast("long"))
      .withColumn("n_bpe_tokens", bpeTokenCount(t).cast("long"))
      .withColumn("punct_chars", punctCount(t).cast("long"))
      .withColumn("quality_e6", qualityE6(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fp_md5", fingerprintMd5(t))
      .withColumn("fp_poly", fingerprintPoly(t))
  }
}
