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
    * standard prefix-sum formulation, one window pass, deterministic
    * on any cluster.
    *
    * At 100 TB the single global ordering is the scale limit of the
    * exact form; the practical variant applies the same logic per
    * (hash-range) partition, which this operator expresses by salting
    * the window key upstream.
    */
  def packByTokenBudget(df: DataFrame, idCol: String, tokensCol: String,
                        budget: Long): DataFrame = {
    val w = Window.orderBy(hashBucket(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("shard_id",
        (((col("__cum") - col(tokensCol)) - pmod(col("__cum") - col(tokensCol), lit(budget))) / budget)
          .cast("long"))
      .drop("__cum")
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
