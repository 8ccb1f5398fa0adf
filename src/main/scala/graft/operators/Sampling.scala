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

  /** Exactly-n-per-stratum sample, ordered inside each stratum by the
    * id hash (then id): a deterministic stratified sample.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       nPerStratum: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashBucket(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nPerStratum)
      .drop("__rn")
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
}
