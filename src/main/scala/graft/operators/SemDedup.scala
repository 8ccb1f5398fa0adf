package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023): k-means
  * partitions the embedding space, then cosine-similar pairs are found
  * ONLY within clusters, and every vector with a lower-id neighbor at
  * cos ≥ τ in its cluster is marked a duplicate of the lowest such id
  * (greedy keep-first — the paper's keep-one-per-group policy, without
  * transitive closure).
  *
  * Scale posture: the cluster count k grows with the corpus
  * (k = ⌈n / targetClusterSize⌉, floored at kMin), which is the whole
  * point of the method — intra-cluster pairwise work stays
  * O(n · targetClusterSize) instead of O(n²), and the per-cluster join
  * is an ordinary shuffle on the cluster key. The k-means fit itself is
  * the deterministic exact-integer Lloyd of [[KMeans]] (e6-quantized
  * vectors, order-free integer sums), so the WHOLE pipeline — fit,
  * assignment, pair generation, cosine verdicts — is reproducible under
  * any partitioning and hash-checkable against an unrolled SQL oracle.
  *
  * Cosine is exact-integer derived: dot and norms are exact long sums
  * over the e6-quantized vectors (≤ 64·1e12, well inside long), and the
  * comparison (dot/√n2a)/√n2b ≥ τ uses only correctly-rounded double
  * ops on those exact integers, so both engines see identical bits.
  */
object SemDedup {

  /** Returns (idCol, cluster, dup_of) for every input vector; dup_of is
    * the lowest same-cluster id with cos ≥ minCos, or −1 if the vector
    * is kept.
    */
  def dedup(vecs: DataFrame, targetClusterSize: Int = 64, kMin: Int = 8,
            iters: Int = 3, minCos: Double = 0.9,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(targetClusterSize > 0, "targetClusterSize must be positive")
    val n = vecs.count()
    val k = math.max(kMin.toLong, (n + targetClusterSize - 1) / targetClusterSize).toInt
    val assign = KMeans.assignments(vecs, k, iters, idCol, vecCol)
      .select(col(idCol).as("vid"), col("cluster"))
    val q = vecs.select(col(idCol).as("vid"),
      transform(col(vecCol), x => floor(x.cast("double") * 1000000.0)).as("v"))
    val member = q.join(assign, "vid")
      .withColumn("n2", aggregate(col("v"), lit(0L), (acc, x) => acc + x * x))
    val left = member.select(col("cluster"), col("vid").as("id_a"),
      col("v").as("v_a"), col("n2").as("n2_a"))
    val right = member.select(col("cluster"), col("vid").as("id_b"),
      col("v").as("v_b"), col("n2").as("n2_b"))
    val dupOf = left.join(right, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dot", aggregate(zip_with(col("v_a"), col("v_b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x))
      .filter(col("dot") > 0 &&
        col("dot").cast("double") / sqrt(col("n2_a").cast("double")) /
          sqrt(col("n2_b").cast("double")) >= lit(minCos))
      .groupBy(col("id_b").as("vid"))
      .agg(min(col("id_a")).as("dup_of"))
    member.select(col("vid"), col("cluster"))
      .join(dupOf, Seq("vid"), "left")
      .select(col("vid").as(idCol), col("cluster"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"))
  }
}
