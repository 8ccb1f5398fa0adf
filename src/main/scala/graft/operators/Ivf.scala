package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbor: a coarse quantizer assigns
  * every candidate to its nearest centroid; a query probes only the
  * `nProbe` centroid cells nearest to it. The complement of the
  * sign-LSH path (Similarity.lshTopK): LSH wins on arbitrary-scale
  * streaming ingest (stateless keys), IVF wins when the corpus is
  * clustered and you want cell-level pruning.
  *
  * Deterministic and scale-shaped: centroids are the `nCentroids`
  * candidate vectors with the smallest id-hash (a deterministic
  * sample of the data distribution). The quantizer itself —
  * nCentroids×dim doubles, KBs — is collected to the driver and
  * shipped as a broadcast literal, the standard IVF arrangement (the
  * corpus is never collected). Cell assignment is then a PURE
  * PROJECTION over the scan: no crossJoin row blow-up, no per-row
  * window, no post-join dedup. At 100 TB the candidate side is
  * scanned once (nCentroids native-cosine evaluations per row inside
  * the projection) and joined to the broadcast probe set; each
  * (query, candidate) pair arises at most once by construction, since
  * a candidate lives in exactly one cell and a query's probe cells
  * are distinct.
  */
object Ivf {

  /** The deterministic centroid pick, exposed so compositions (IVF-PQ)
    * train against the SAME quantizer: (ids, vectors) of the
    * nCentroids smallest-(id-hash, id) candidates, in id order.
    */
  private[operators] def sampleCentroids(candidates: DataFrame, nCentroids: Int,
                                         idCol: String, vecCol: String): (Seq[Any], Seq[Seq[Double]]) = {
    val centRows = Sampling.smallestByHash(candidates, nCentroids, idCol)
      .select(col(idCol), col(vecCol))
      .sort(col(idCol))
      .collect()
    val vecs: Seq[Seq[Double]] = centRows.toIndexedSeq.map(_.getSeq[Any](1).map {
      case f: Float => f.toDouble
      case d: Double => d
      case other => throw new IllegalArgumentException(s"non-numeric vector element $other")
    }.toSeq)
    (centRows.toIndexedSeq.map(_.get(0)), vecs)
  }

  /** Top-n probe cells of `vecC` against the centroid literal, as a
    * `__cells` array column of (score, -idx, idx) structs — shared by
    * ivfTopK and the IVF-PQ composition.
    */
  private[operators] def withCells(df: DataFrame, vecC: String, n: Int,
                                   centVecs: Seq[Seq[Double]]): DataFrame = {
    val nC = centVecs.length
    val cArr = typedLit(centVecs)
    df.withColumn("__scored",
        zip_with(
          transform(cArr, cv => round(Similarity.cosine(col(vecC), cv), 6)),
          sequence(lit(0), lit(nC - 1)),
          (s, i) => struct(s.as("s"), (-i).as("ni"), i.as("i"))))
      .withColumn("__cells", slice(sort_array(col("__scored"), asc = false), 1, n))
  }

  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Deterministic centroid pick (sampleCentroids): smallest id-hash
    // candidates in id order, so ties in scoring break toward the
    // smallest centroid id. Cell assignment (withCells) is a staged
    // projection — (rounded cosine desc, centroid index asc) struct
    // sort; the interpreted HOFs evaluate once per row.
    val (centIds, centVecs) = sampleCentroids(candidates, nCentroids, idCol, vecCol)
    if (centVecs.isEmpty) {
      return queries.select(col(idCol).as("query_id"), col(idCol).as("neighbor_id"),
        lit(0.0).as("cos_sim"), lit(0).as("rank")).limit(0)
    }
    val nC = centVecs.length
    val idsArr = array(centIds.map(lit): _*)

    val cAssigned = withCells(
        candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv")), "nv", 1, centVecs)
      .withColumn("centroid_id",
        element_at(idsArr, element_at(col("__cells"), 1)("i") + 1))
      .select("neighbor_id", "nv", "centroid_id")
    val qAssigned = withCells(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv", math.min(nProbe, nC), centVecs)
      .withColumn("centroid_id",
        explode(transform(col("__cells"), c => element_at(idsArr, c("i") + 1))))
      .select("query_id", "qv", "centroid_id")

    val scored = cAssigned.join(broadcast(qAssigned), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("qv"), col("nv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
