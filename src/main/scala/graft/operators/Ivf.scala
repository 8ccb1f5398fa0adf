package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbor: a coarse quantizer assigns
  * every candidate to its nearest centroid; a query probes only the
  * `nProbe` centroid cells nearest to it. The complement of the
  * sign-LSH path (Similarity.lshTopK): LSH wins on arbitrary-scale
  * streaming ingest (stateless keys), IVF wins when the corpus is
  * clustered and you want cell-level pruning.
  *
  * Everything is deterministic and fully distributed — no RNG, no
  * driver-side k-means: centroids are the `nCentroids` candidate
  * vectors with the smallest id-hash (a deterministic sample of the
  * data distribution), and every assignment is a broadcast join +
  * rank. At 100 TB the candidate side is scanned once for assignment
  * (nCentroids cheap native-cosine evaluations per row) and then
  * shuffled by cell; queries touch nProbe/nCentroids of the data.
  */
object Ivf {

  private def assign(df: DataFrame, centroids: DataFrame, topN: Int,
                     idCol: String, vecCol: String): DataFrame = {
    val scored = df.crossJoin(broadcast(centroids))
      .select(col(idCol), col(vecCol),
        col("centroid_id"),
        round(Similarity.cosine(col(vecCol), col("cv")), 6).as("cscore"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("cscore").desc, col("centroid_id"))
    scored.withColumn("crank", row_number().over(w))
      .filter(col("crank") <= topN)
      .drop("cscore", "crank")
  }

  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Deterministic centroid pick: smallest id-hash candidates.
    val centroids = candidates
      .withColumn("__h", Sampling.hashBucket(col(idCol)))
      .orderBy(col("__h"), col(idCol))
      .limit(nCentroids)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("cv"))

    val cAssigned = assign(candidates.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("nv")), centroids, 1, "neighbor_id", "nv")
    val qAssigned = assign(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")), centroids, nProbe, "query_id", "qv")

    val scored = cAssigned.join(broadcast(qAssigned), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("qv"), col("nv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
