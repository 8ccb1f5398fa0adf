package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling + distribution statistics for training-data
  * curation. Spark's `df.sample` is seed-dependent on partitioning, so
  * at cluster scale two runs of the "same" sample differ; these
  * operators key the sampling decision on a content hash of the id —
  * stable under any partitioning, any cluster size, and reproducible
  * by other engines (the point of an auditable data pipeline).
  */
object Sampling {

  private val P = 1000000007L

  /** Portable per-id hash bucket in [0, 10000). `id` is reduced mod P
    * BEFORE the multiply: `id * 2654435761` overflows Long for ids
    * above ~3.4e9 — an ANSI arithmetic error, or silent divergence
    * from a 128-bit oracle (found in review). After reduction the
    * product is < P * 2654435761 < 2^62.
    */
  def hashBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(pmod(pmod(id, lit(P)) * 2654435761L, lit(P)) * 40503L, lit(P)) % 10000L

  /** Keep ~permille/10000 of rows, decided by id hash — deterministic
    * Bernoulli sampling.
    */
  def deterministicSample(df: DataFrame, idCol: String, perMyriad: Int): DataFrame =
    df.filter(hashBucket(col(idCol)) < perMyriad)

  /** The n rows with the smallest (id-hash, id) — a deterministic
    * sample of the data distribution. Both quantizer trainers (Ivf
    * centroid pick, Pq codebook pick) and their DuckDB oracle replays
    * rely on this recipe being IDENTICAL everywhere; it lives here so
    * the invariant is expressed once.
    */
  def smallestByHash(df: DataFrame, n: Int, idCol: String): DataFrame =
    df.withColumn("__h", hashBucket(col(idCol)))
      .orderBy(col("__h"), col(idCol))
      .limit(n)
      .drop("__h")

  /** Exactly-n-per-stratum sample: each stratum keeps its n rows with
    * the smallest (id hash, id). Selection goes through the two-phase
    * boundary-bucket path — a row_number over whole strata serializes
    * each stratum through one task when strata are few and huge (the
    * regime this operator targets). Quotas come from the histogram's
    * own group set, so this is ONE scan plus the boundary pass; null
    * strata are kept as their own stratum (matching the windowed
    * form and the SQL PARTITION BY semantics).
    *
    * Driver memory holds the (stratum, occupied-bucket) histogram —
    * fine up to ~10⁵ strata. For ultra-high-cardinality strata with
    * small groups use [[stratifiedSampleWindowed]]: with strata ≫
    * cores the per-stratum sort is already partition-parallel and
    * needs no driver state.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       nPerStratum: Int): DataFrame =
    selectSmallestK(df, strataCol, idCol, None,
      totals => totals.keys.map(_ -> nPerStratum.toLong).toMap)

  /** The window formulation of [[stratifiedSample]] — any stratum
    * type, no driver state; right for many small strata, wrong for few
    * huge ones. Identical output.
    */
  def stratifiedSampleWindowed(df: DataFrame, strataCol: String, idCol: String,
                               nPerStratum: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashBucket(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nPerStratum)
      .drop("__rn")
  }

  /** Two-phase smallest-(hashBucket, id) selection per group, one
    * scan: a (group, bucket) hash aggregate (≤ groups × 10000 rows)
    * collected to the driver locates each group's cutoff bucket;
    * rows strictly below it pass by a null-safe broadcast-joined
    * filter, and only the cutoff bucket's sliver (~1/10000 of the
    * group) is ranked for the residual. `quotas` receives per-group
    * totals FROM THE SAME histogram scan (no second pass, no two-scan
    * consistency window) and returns each group's quota — groups it
    * omits keep nothing; null groups are real strata. `restrictTo`,
    * when set, drops groups outside it before the histogram. Group
    * column must be string-typed (the driver-side cut table is
    * rebuilt as literals).
    */
  private[graft] def selectSmallestK(df: DataFrame, groupCol: String,
                                     idCol: String,
                                     restrictTo: Option[Set[String]],
                                     quotas: Map[Option[String], Long] => Map[Option[String], Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(df.schema(groupCol).dataType == org.apache.spark.sql.types.StringType,
      s"selectSmallestK needs a string group column, got ${df.schema(groupCol).dataType}")
    val restricted = restrictTo match {
      case Some(keys) => df.filter(col(groupCol).isin(keys.toSeq: _*))
      case None => df
    }
    val bucketed = restricted.withColumn("__hb", hashBucket(col(idCol)))
    val hist = bucketed.groupBy(col(groupCol), col("__hb")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    val byGroup = hist.groupBy(_._1).map { case (g, rows) =>
      g -> rows.map(r => (r._2, r._3)).sortBy(_._1)
    }
    val q = quotas(byGroup.map { case (g, b) => g -> b.map(_._2).sum })
    val cuts: Seq[(String, Long, Long)] = byGroup.toSeq.map { case (g, buckets) =>
      val k = q.getOrElse(g, 0L)
      val total = buckets.map(_._2).sum
      val (bStar, resid) =
        if (k <= 0) (-1L, 0L)       // keep nothing
        else if (total <= k) (10000L, 0L) // quota covers the group: keep all
        else {
          // total > k guarantees the walk lands on a cutoff bucket.
          var remaining = k
          var b = -1L
          var r = 0L
          val it = buckets.iterator
          while (b < 0 && it.hasNext) {
            val (bkt, c) = it.next()
            if (c >= remaining) { b = bkt; r = remaining }
            else remaining -= c
          }
          (b, r)
        }
      (g.orNull, bStar, resid)
    }
    val cutDf = cuts.toDF("__grp", "__bstar", "__m")
    // Null-safe join: a null group is a real stratum, not a dropped row.
    val joined = bucketed.join(broadcast(cutDf), col(groupCol) <=> col("__grp"))
    val below = joined.filter(col("__hb") < col("__bstar"))
    val wB = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    val boundary = joined.filter(col("__hb") === col("__bstar"))
      .withColumn("__rn", row_number().over(wB))
      .filter(col("__rn") <= col("__m"))
      .drop("__rn")
    below.unionByName(boundary).drop("__hb", "__grp", "__bstar", "__m")
  }

  /** Deterministic train/val/test split: the id hash partitions the
    * corpus into labeled fractions (e4 proportions). Pure projection —
    * the split is a property of the row, not of a shuffle or RNG, so
    * it is stable across runs, partitionings, and cluster sizes, and
    * a document keeps its split when the corpus around it grows (the
    * property that prevents silent train/test leakage across dataset
    * versions).
    */
  def labeledSplit(df: DataFrame, idCol: String,
                   splitsE4: Seq[(String, Long)]): DataFrame = {
    require(splitsE4.nonEmpty && splitsE4.forall(_._2 > 0) && splitsE4.map(_._2).sum == 10000L,
      s"split fractions must be positive e4 values summing to 10000, got $splitsE4")
    val bounds = splitsE4.scanLeft(0L)(_ + _._2).tail
    val hb = hashBucket(col(idCol))
    val label = splitsE4.zip(bounds).foldRight(lit(splitsE4.last._1): org.apache.spark.sql.Column) {
      case (((name, _), hi), rest) => when(hb < hi, lit(name)).otherwise(rest)
    }
    df.withColumn("split", label)
  }

  /** Purged walk-forward folds for time-series cross-validation: the
    * event-time range is cut into `nFolds` equal spans; for each fold
    * taken as the test window, every row is labeled `test` (inside the
    * window), `embargo` (outside it but within `embargoMs` of its
    * edges — the leakage zone where features computed from windows
    * that OVERLAP the test range would let the model peek), or
    * `train`. A plain random split leaks mercilessly on financial
    * series (any rolling indicator spans the cut); the purge/embargo
    * discipline is the standard fix.
    *
    * Emits one row per (input row × test fold) — the exploded form a
    * CV harness consumes directly. All boundary arithmetic is exact
    * integer epoch-ms (fold f covers
    * [tmin + ⌈f·span/n⌉, tmin + ⌈(f+1)·span/n⌉ − 1]; a row's own fold
    * is ((t − tmin)·n) div span, the same cut expressed without
    * division rounding drift), so fold assignment is bit-identical
    * at any parallelism and in the DuckDB oracle. The min/max time
    * bounds are the only driver-side materialization — two longs.
    */
  def purgedFolds(df: DataFrame, timeCol: String, nFolds: Int,
                  embargoMs: Long): DataFrame = {
    require(nFolds >= 2, s"need nFolds >= 2, got $nFolds")
    require(embargoMs >= 0, s"need embargoMs >= 0, got $embargoMs")
    val clash = Seq("test_fold", "role", "__pf_t", "__pf_fold", "__pf_lo", "__pf_hi")
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"purgedFolds writes columns ${clash.mkString(", ")} — rename them in the input first")
    val tMs = unix_millis(col(timeCol))
    val bounds = df.agg(min(tMs).as("lo"), max(tMs).as("hi"),
      count(lit(1)).as("n")).head()
    if (bounds.getLong(2) == 0) return df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      df.schema.add("test_fold", "int").add("role", "string"))
    // A null time cannot be fold-assigned, and silently labeling it
    // 'train' in every fold is precisely the leakage this operator
    // exists to prevent — fail loudly instead, both when every row is
    // undated (bounds are null) and per row in the main plan.
    require(!bounds.isNullAt(0),
      s"purgedFolds: $timeCol is null on every row — nothing to fold-assign")
    val tmin = bounds.getLong(0)
    val span = bounds.getLong(1) - tmin + 1
    df.filter(assert_true(tMs.isNotNull,
        lit(s"purgedFolds: null $timeCol — undated rows cannot be fold-assigned")).isNull)
      .withColumn("__pf_t", tMs)
      .withColumn("__pf_fold",
        least(expr(s"(__pf_t - ${tmin}L) * $nFolds div ${span}L"), lit(nFolds - 1)))
      .withColumn("test_fold", explode(sequence(lit(0), lit(nFolds - 1))))
      .withColumn("__pf_lo",
        expr(s"${tmin}L + (test_fold * ${span}L + ${nFolds - 1}) div $nFolds"))
      .withColumn("__pf_hi",
        expr(s"${tmin}L + ((test_fold + 1) * ${span}L + ${nFolds - 1}) div $nFolds - 1"))
      .withColumn("role",
        when(col("__pf_fold") === col("test_fold"), lit("test"))
          .when(col("__pf_t") >= col("__pf_lo") - embargoMs &&
            col("__pf_t") <= col("__pf_hi") + embargoMs, lit("embargo"))
          .otherwise(lit("train")))
      .drop("__pf_t", "__pf_fold", "__pf_lo", "__pf_hi")
  }

  /** Mixture resampling: the largest corpus achievable at EXACTLY the
    * target source proportions. Weights are e4 integers summing to
    * 10000 (exact arithmetic end to end); the achievable total is
    * T = min_s floor(n_s · 10000 / w_s), and each source keeps its
    * k_s = w_s · T div 10000 rows with the smallest (hashBucket, id) —
    * a deterministic, partition-invariant selection.
    *
    * Exact-k selection WITHOUT a per-source global sort (a row_number
    * over a whole source serializes that source through one task at
    * corpus scale — the x10 anti-pattern): two-phase boundary-bucket
    * selection instead.
    *   1. One hash aggregate keyed by (source, bucket) — at most
    *      sources × 10000 rows — collected to the driver, where the
    *      cumulative histogram locates each source's cutoff bucket b*
    *      and the residual m_s rows needed from it.
    *   2. Rows strictly below b* pass by a broadcast-joined filter;
    *      only the boundary bucket's rows (~n_s/10000 of the source)
    *      are ranked by id to take the residual m_s.
    * The kept set equals "the k_s smallest by (bucket, id)" — which is
    * what the oracle's row_number formulation states directly.
    */
  /** Temperature-scaled (α = 0.5) mixture weights — the multilingual
    * sampling recipe (Conneau & Lample 2019 §3.1; mT5 uses the same
    * form at α = 0.3): source share ∝ n^α, flattening the natural
    * distribution so head sources shrink and tail sources grow.
    * α = 0.5 is the one exponent with an EXACTLY portable power
    * function — IEEE 754 requires sqrt to be correctly rounded, so
    * Spark and DuckDB compute bit-identical doubles and the floored
    * e6 quantization matches everywhere (any other α goes through
    * pow/exp, whose libm rounding is engine-specific).
    *
    * Output per group: natural share, temperature share, and the
    * resampled target count at unchanged corpus size — all exact
    * integer arithmetic from the one floored sqrt. Shapes: one count
    * aggregate (groups-shaped), a one-row total broadcast back — the
    * x31 posture; nothing corpus-shaped moves twice.
    */
  def temperatureWeights(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("sqrt_e6",
        floor(sqrt(col("n_docs").cast("double")) * lit(1000000.0)).cast("long"))
    val tot = counts.agg(sum(col("n_docs")).as("n_total"),
      sum(col("sqrt_e6")).as("sqrt_tot"))
    counts.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_docs"),
        expr("n_docs * 1000000L div n_total").as("nat_share_e6"),
        expr("sqrt_e6 * 1000000L div sqrt_tot").as("temp_share_e6"),
        expr("(sqrt_e6 * 1000000L div sqrt_tot) * n_total div 1000000")
          .as("target_docs"))
  }

  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
                    weightsE4: Map[String, Long]): DataFrame = {
    require(weightsE4.nonEmpty && weightsE4.values.forall(_ > 0),
      "every mixture weight must be positive")
    require(weightsE4.values.sum == 10000L,
      s"weights must sum to 10000 (e4 proportions), got ${weightsE4.values.sum}")
    selectSmallestK(df, groupCol, idCol, Some(weightsE4.keySet), { observed =>
      val totals = observed.collect { case (Some(s), n) => s -> n }
      require(weightsE4.keySet.subsetOf(totals.keySet),
        s"sources absent from the data: ${weightsE4.keySet -- totals.keySet}")
      // Largest total hitting the exact mixture, then per-source
      // quotas — all from the one histogram scan. t is rounded DOWN
      // to a multiple of 10000/gcd(weights) so every quota w_s*t/1e4
      // is exact — otherwise floor() quotas drift off the stated
      // proportions for counts that aren't well-aligned (e.g. counts
      // (26,19,13,7) at 4:3:2:1 would give 25/61 ≈ 41%).
      @annotation.tailrec
      def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
      val unit = 10000L / weightsE4.values.foldLeft(10000L)(gcd)
      val tRaw = weightsE4.map { case (s, w) => totals(s) * 10000L / w }.min
      val t = tRaw - tRaw % unit
      weightsE4.map { case (s, w) => (Some(s): Option[String]) -> w * t / 10000L }
    })
  }

  /** Pack rows into training shards under a token budget: rows are
    * laid out in a deterministic order (id hash, then id) and cut into
    * shards whenever the running token count would exceed `budget`.
    * shard_id = floor((cumulative_tokens - tokens) / budget) — the
    * standard prefix-sum formulation, deterministic on any cluster.
    *
    * Distributed two-pass prefix sum — no global single-partition
    * window stage:
    *   1. Rows are hash-range partitioned by a PURE function of the
    *      row (`hashBucket` is ~uniform in [0, 10000), so partition
    *      `hb * nPart div 10000` both balances load and agrees with
    *      the global (hb, id) sort order). No RangePartitioner
    *      sampling, so the side branches below see identical
    *      partition assignments by construction.
    *   2. An in-partition window computes the local running sum —
    *      parallel across nPart partitions.
    *   3. Per-partition token subtotals (one row per partition,
    *      O(nPart) total) are collapsed into a single sorted array
    *      and turned into exclusive-prefix offsets with an array
    *      fold — never a no-partition window, so no stage ever holds
    *      more than nPart tiny rows on one task.
    *   4. Offsets broadcast-join back on the partition id; global
    *      cumsum = local cumsum + partition offset. Shard ids are
    *      bit-identical to the single-window formulation.
    */
  def packByTokenBudget(df: DataFrame, idCol: String, tokensCol: String,
                        budget: Long, numPartitions: Int = 0): DataFrame = {
    val nPart =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val hb = hashBucket(col(idCol))
    val keyed = df
      .withColumn("__hb", hb)
      .withColumn("__part", ((col("__hb") * nPart) / 10000L).cast("int"))

    val wLocal = Window.partitionBy(col("__part"))
      .orderBy(col("__hb"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = keyed.withColumn("__cum_local", sum(col(tokensCol)).over(wLocal))

    // Exclusive prefix offsets over the (tiny) per-partition subtotals:
    // sort_array orders the structs by __part; offset(i) = sum of
    // subtotals strictly before i, computed by an array fold (O(nPart²)
    // on ≤ a few thousand elements — negligible, and WindowExec-free).
    val offsets = keyed
      .groupBy(col("__part"))
      .agg(sum(col(tokensCol)).as("__ptotal"))
      .agg(sort_array(collect_list(struct(col("__part"), col("__ptotal")))).as("ps"))
      .select(col("ps"), posexplode(col("ps")))
      .select(
        col("col.__part").as("__part"),
        aggregate(slice(col("ps"), lit(1), col("pos")), lit(0L),
          (acc, x) => acc + x.getField("__ptotal")).as("__offset"))

    local
      .join(broadcast(offsets), Seq("__part"))
      .withColumn("__cum", col("__cum_local") + col("__offset"))
      // SQL `div` = exact integral division: the `/`-as-Double route
      // loses whole shard ids once the cumulative token count passes
      // 2^53 — reachable in a 100 TB corpus.
      .withColumn("shard_id", expr(s"(__cum - $tokensCol) div ${budget}L"))
      .drop("__part", "__hb", "__cum_local", "__offset", "__cum")
  }

  /** T16 — GPT-style concat-and-chunk sequence packing: the corpus is
    * one virtual token stream in doc_id order, cut into fixed
    * `seqLen`-token training sequences; each document reports the
    * first/last sequence it lands in and how many it spans (docs
    * straddle boundaries — that IS the concat-and-chunk recipe, no
    * padding, no packing bins). The per-doc span histogram is what a
    * data engineer sizes context length against.
    *
    * Scale shape: the global prefix sum deliberately does NOT use a
    * single-partition window (the classic scale-killer). Same
    * two-pass layout as [[packByTokenBudget]]: contiguous doc_id
    * blocks partition the local cumulative windows, and the exclusive
    * block offsets come from a broadcast fold over the O(blocks)
    * subtotal table — every stage parallel, cum in exact longs
    * (`div`, not double `/`, so sequence ids stay exact past 2⁵³
    * cumulative tokens).
    */
  def packSequences(docs: DataFrame, seqLen: Long = 256, blockIds: Long = 100000L,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val nTok = when(col(textCol).isNull, 0L)
      .otherwise(size(TextAnalysis.tokens(col(textCol))).cast("long"))
    val keyed = docs.select(col(idCol), nTok.as("n_tok"))
      .withColumn("__part", expr(s"$idCol div ${blockIds}L"))
    val wLocal = Window.partitionBy(col("__part")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = keyed.withColumn("__cum_local", sum(col("n_tok")).over(wLocal))
    val offsets = keyed.groupBy(col("__part")).agg(sum(col("n_tok")).as("__ptotal"))
      .agg(sort_array(collect_list(struct(col("__part"), col("__ptotal")))).as("ps"))
      .select(col("ps"), posexplode(col("ps")))
      .select(col("col.__part").as("__part"),
        aggregate(slice(col("ps"), lit(1), col("pos")), lit(0L),
          (acc, x) => acc + x.getField("__ptotal")).as("__offset"))
    local.join(broadcast(offsets), Seq("__part"))
      .withColumn("cum_prev", col("__cum_local") + col("__offset") - col("n_tok"))
      .select(col(idCol), col("n_tok"),
        when(col("n_tok") > 0, expr(s"cum_prev div ${seqLen}L")).as("first_seq"),
        when(col("n_tok") > 0,
          expr(s"(cum_prev + n_tok - 1) div ${seqLen}L")).as("last_seq"))
      .withColumn("n_seqs",
        when(col("n_tok") > 0, col("last_seq") - col("first_seq") + 1)
          .otherwise(0L))
  }

  /** Fixed-width histogram over [lo, hi): bin 0 = underflow,
    * bin nBins+1 = overflow, deterministic bin arithmetic.
    */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                nBins: Int): DataFrame = {
    val x = col(valueCol)
    val bin = when(x < lo, 0)
      .when(x >= hi, nBins + 1)
      .otherwise(floor((x - lo) / (hi - lo) * nBins).cast("int") + 1)
    df.withColumn("bin", bin)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(x), 4).as("min_value"),
        round(max(x), 4).as("max_value"))
  }

  /** X23 — EXACT per-key quantiles via distribution compression: one
    * hash aggregate collapses rows to (key, value, count), then a
    * cumulative walk over the compressed distribution picks each
    * requested rank. The scale path for order statistics on
    * repetitive domains (prices live on a tick grid, token counts on
    * small integers): the per-key sort is O(distinct values), not
    * O(rows) — a hot symbol with 10⁹ trades over 10⁴ ticks sorts 10⁴
    * rows — while the answer stays EXACT, unlike a quantile sketch.
    *
    * Rank rule is explicit and integer-only: quantile q (per-myriad)
    * picks the smallest value whose cumulative count reaches
    * ⌈n·q/10000⌉ — the lower discrete percentile, with no float in
    * the rank arithmetic (portable: both engines' integer division
    * truncates the same way on these non-negative operands). Output
    * values are copied from the data, never computed, so they are
    * bit-identical anywhere.
    */
  def distQuantiles(df: DataFrame, keyCol: String, valueCol: String,
                    qsPerMyriad: Seq[Int]): DataFrame = {
    require(qsPerMyriad.nonEmpty && qsPerMyriad.forall(q => q > 0 && q <= 10000),
      s"quantiles must be per-myriad in (0, 10000], got $qsPerMyriad")
    // NULLs are excluded from the distribution outright: the engines
    // disagree on NULL sort position (Spark NULLS FIRST ascending,
    // DuckDB NULLS LAST), which would shift every cumulative count.
    val hist = df.select(col(keyCol), col(valueCol).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col(keyCol), col("__v")).agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col(keyCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col(keyCol))))
    val picks = qsPerMyriad.map { q =>
      min(when(col("__cum") >= expr(s"(__n * $q + 9999L) div 10000L"), col("__v")))
        .as(s"p${q}")
    }
    cum.groupBy(col(keyCol))
      .agg(picks.head, picks.tail :+ max(col("__n")).as("n"): _*)
  }

  /** Per-domain quota cap: keep at most `cap` documents per domain,
    * ranked by a caller-supplied quality column descending with the
    * id as the deterministic tie-break — the curation rule that stops
    * one mega-domain from dominating a training mixture while keeping
    * its best pages.
    *
    * Shape at scale: one hash partition on the domain plus a
    * per-domain sort — parallelism = domain count (web corpora have
    * millions). For the degenerate few-huge-domains regime the
    * boundary-bucket two-phase trick of [[stratifiedSample]] applies
    * (histogram quality into buckets, cut, rank only the boundary
    * sliver); this window form is the right default.
    */
  def capPerDomain(df: DataFrame, domainCol: String, idCol: String,
                   qualityCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(qualityCol).desc, col(idCol))
    df.withColumn("rank_in_domain", row_number().over(w).cast("long"))
      .filter(col("rank_in_domain") <= cap)
  }

  /** Deterministic training shards: every document lands in shard
    * `fp mod nShards` of its content fingerprint, positioned within
    * the shard by (fp, id). Content-hash sharding IS the "global
    * shuffle" a training run wants — it decorrelates crawl/source
    * order by construction, is stable under re-partitioning and
    * re-crawl re-ids (same bytes → same shard), and any engine can
    * reproduce the assignment.
    *
    * Shape at scale: the fingerprint is a scan-side projection; the
    * only shuffle is the hash partition on `shard`, whose per-shard
    * sort is O(N/nShards) and fully parallel. A 100 TB writer runs
    * exactly this plan into `partitionBy(shard)` +
    * `sortWithinPartitions(fp, id)` parquet.
    */
  def trainShards(docs: DataFrame, nShards: Int,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    docs
      .select(col(idCol), TextAnalysis.fingerprintPoly(col(textCol)).as("fp_poly"))
      .withColumn("shard", pmod(col("fp_poly"), lit(nShards.toLong)))
      .withColumn("pos",
        (row_number().over(Window.partitionBy(col("shard"))
          .orderBy(col("fp_poly"), col(idCol))) - 1).cast("long"))
  }
}
