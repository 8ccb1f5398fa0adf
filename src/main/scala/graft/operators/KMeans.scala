package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over embedding columns, built to be
  * DETERMINISTIC UNDER PARALLELISM — the property float k-means never
  * has: per-cluster means are floating sums whose order depends on
  * partitioning, so two runs of the same job can emit different
  * clusters. Here every step is exact integer arithmetic:
  *
  *  - vectors land in e6 micro-units (floor, exact at this scale:
  *    |x| < ~1 → |x_e6| < ~1e6, per-dim squared diffs < ~4.5e12,
  *    64-dim distances < ~3e14 — well inside long);
  *  - integer sums are order-free, so the shuffle's reduction order
  *    cannot change a centroid;
  *  - means are floor division (computed on the driver over the
  *    collected k×dim sum/count table — KBs, the same bounded-sketch
  *    posture as the IVF quantizer);
  *  - assignment ties break on the lowest cluster index, seed order is
  *    the k lowest ids.
  *
  * Each iteration costs one scan (assignment is a pure projection
  * against the centroid literal — no join, no window) plus one
  * shuffle of (cluster, dim) partial sums whose key space is k×dim
  * regardless of corpus size. Empty clusters keep their previous
  * centroid. The same recurrence unrolls into the c1 oracle SQL, so
  * the full iterative fit is hash-checked, not just smoke-tested.
  */
object KMeans {

  /** Micro-unit vectors keyed by id. */
  private def microVecs(vecs: DataFrame, idCol: String, vecCol: String): DataFrame =
    vecs.select(col(idCol).as("id"),
      transform(col(vecCol), x => floor(x.cast("double") * 1000000.0)).as("v"))

  /** (dist², idx) struct array against the centroid literal — a pure
    * projection over the scan.
    */
  private def scoredCol(cents: IndexedSeq[IndexedSeq[Long]]): Column = {
    val k = cents.length
    val cArr = typedLit(cents.map(_.toSeq).toSeq)
    zip_with(
      transform(cArr, cv =>
        aggregate(zip_with(col("v"), cv, (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x)),
      sequence(lit(0), lit(k - 1)),
      (d, i) => struct(d.as("d"), i.as("i")))
  }

  /** Run the Lloyd loop; returns the final centroids. */
  private def fitCents(v: DataFrame, k: Int, iters: Int): IndexedSeq[IndexedSeq[Long]] = {
    val seedRows = v.orderBy(col("id")).limit(k).select(col("v")).collect()
    require(seedRows.length >= k, s"need at least $k vectors, got ${seedRows.length}")
    var cents: IndexedSeq[IndexedSeq[Long]] =
      seedRows.toIndexedSeq.map(_.getSeq[Long](0).toIndexedSeq)
    for (_ <- 1 until iters) {
      val sums = v.withColumn("__best", array_min(scoredCol(cents)))
        .select(col("__best")("i").as("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = Array.tabulate(k)(c => cents(c).toArray)
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = Math.floorDiv(r.getLong(2), r.getLong(3))
      }
      cents = next.toIndexedSeq.map(_.toIndexedSeq)
    }
    cents
  }

  /** Cluster assignment after `iters` Lloyd iterations: returns
    * (idCol, cluster, dist2_e12) — dist2 in squared micro-units.
    */
  def assignments(vecs: DataFrame, k: Int = 8, iters: Int = 3,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && iters > 0, s"k=$k and iters=$iters must be positive")
    val v = microVecs(vecs, idCol, vecCol)
    val cents = fitCents(v, k, iters)
    // array_min on (d, i) structs: lexicographic → min distance,
    // ties to the lowest cluster index.
    v.withColumn("__best", array_min(scoredCol(cents)))
      .select(col("id").as(idCol),
        col("__best")("i").as("cluster"), col("__best")("d").as("dist2_e12"))
  }

  /** C3 — cluster-quality metrics over the same fit (the s7/d19
    * posture: the evaluation harness is itself an oracle-checked
    * operator). Per point, d²_own (its centroid) and d²_next (the
    * nearest OTHER centroid) come from one sorted top-2 over the
    * scored projection; `ratio_e6 = d²_own·1e6 div d²_next` is the
    * centroid-based silhouette proxy — 0 = ideally separated,
    * 1e6 = the point sits on the decision boundary (d²_next = 0, both
    * distances zero, is pinned to 1e6: perfectly ambiguous).
    * Aggregated per cluster: size, mean own-distance (compactness),
    * mean/max ratio (separation). The d²·1e6 product tops long for
    * distances above ~9e12, so it runs in decimal/HUGEINT with
    * truncating integral division on both engines.
    *
    * Scale: identical to assignments — the top-2 sort is over the
    * k-element scored array inside the projection, then one
    * k-row-output hash aggregate.
    */
  def clusterQuality(vecs: DataFrame, k: Int = 8, iters: Int = 3,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 2, s"cluster quality needs k >= 2, got $k")
    require(iters > 0, s"iters=$iters must be positive")
    val v = microVecs(vecs, idCol, vecCol)
    val cents = fitCents(v, k, iters)
    val perPoint = v.withColumn("__top2", slice(sort_array(scoredCol(cents)), 1, 2))
      .select(
        element_at(col("__top2"), 1)("i").as("cluster"),
        element_at(col("__top2"), 1)("d").as("d_own"),
        element_at(col("__top2"), 2)("d").as("d_next"))
      .withColumn("ratio_e6",
        when(col("d_next") === 0, lit(1000000L))
          .otherwise(expr("CAST(d_own AS DECIMAL(38,0)) * 1000000 div d_next")))
    perPoint.groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("d_own").cast("decimal(38,0)")).as("__sum_d"),
        sum(col("ratio_e6")).as("__sum_r"),
        max(col("ratio_e6")).as("max_ratio_e6"))
      .select(col("cluster"), col("n_points"),
        expr("__sum_d div n_points").as("mean_dist2_e12"),
        expr("__sum_r div n_points").as("mean_ratio_e6"),
        col("max_ratio_e6"))
  }

  /** C4 — prototype pruning (the SemDeDup / D4 "beyond neural scaling
    * laws" curation move): within each cluster of the SAME
    * deterministic fit, rank points by own-centroid d² ascending —
    * most prototypical first — and mark the closest `prunePct`% for
    * removal. Near-centroid mass is semantically redundant (it is what
    * the cluster already "says"); the kept tail is the diverse
    * remainder a curated training mix wants. Deterministic end to end:
    * integer d², (d², id) rank order, and an exact integer threshold
    * (rk·100 ≤ n_c·prunePct ⟺ rk ≤ ⌊n_c·pct/100⌋ — no float
    * percentile).
    *
    * Shape at scale: the c1 assignment scan plus ONE window pass keyed
    * by cluster — k partitions. For k ≪ cores, re-key the window by
    * (cluster, salt) and threshold on the per-cluster counts joined
    * back, the d12 skew posture; at k = thousands of clusters
    * (the SemDeDup regime) the plain window is already balanced.
    */
  def prototypePrune(vecs: DataFrame, k: Int = 8, iters: Int = 3,
                     prunePct: Int = 25,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(prunePct >= 0 && prunePct <= 100, s"prunePct=$prunePct out of [0,100]")
    val asg = assignments(vecs, k, iters, idCol, vecCol)
    val w = Window.partitionBy(col("cluster")).orderBy(col("dist2_e12"), col(idCol))
    val wc = Window.partitionBy(col("cluster"))
    asg.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n_in_cluster", count(lit(1)).over(wc))
      .withColumn("pruned", col("rk") * 100 <= col("n_in_cluster") * prunePct)
  }
}
