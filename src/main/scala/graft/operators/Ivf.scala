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

  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Deterministic centroid pick: smallest id-hash candidates,
    // ordered by id so ties in scoring break toward the smallest
    // centroid id (same contract as the previous window form).
    // The final `.sort(idCol)` runs IN Spark so id ordering follows
    // the column's own type semantics — ids stay generic (long, int,
    // string, ...) rather than assuming getLong.
    val centRows = candidates
      .withColumn("__h", Sampling.hashBucket(col(idCol)))
      .orderBy(col("__h"), col(idCol))
      .limit(nCentroids)
      .select(col(idCol), col(vecCol))
      .sort(col(idCol))
      .collect()
    if (centRows.isEmpty) {
      return queries.select(col(idCol).as("query_id"), col(idCol).as("neighbor_id"),
        lit(0.0).as("cos_sim"), lit(0).as("rank")).limit(0)
    }
    val centVecs: Seq[Seq[Double]] = centRows.map(_.getSeq[Any](1).map {
      case f: Float => f.toDouble
      case d: Double => d
      case other => throw new IllegalArgumentException(s"non-numeric vector element $other")
    }.toSeq).toSeq
    val nC = centRows.length
    val cArr = typedLit(centVecs)
    val idsArr = array(centRows.toIndexedSeq.map(r => lit(r.get(0))): _*)

    // Top-n cells by (rounded cosine desc, centroid index asc), as a
    // projection: score the centroid literal, sort the (score, index)
    // structs descending (negated index makes ties resolve to the
    // smallest centroid id). Staged through withColumn projections so
    // the interpreted HOFs evaluate once per row (CollapseProject
    // keeps multiply-referenced aliases materialized).
    def withCells(df: DataFrame, vecC: String, n: Int): DataFrame =
      df.withColumn("__scored",
          zip_with(
            transform(cArr, cv => round(Similarity.cosine(col(vecC), cv), 6)),
            sequence(lit(0), lit(nC - 1)),
            (s, i) => struct(s.as("s"), (-i).as("ni"), i.as("i"))))
        .withColumn("__cells", slice(sort_array(col("__scored"), asc = false), 1, n))

    val cAssigned = withCells(
        candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv")), "nv", 1)
      .withColumn("centroid_id",
        element_at(idsArr, element_at(col("__cells"), 1)("i") + 1))
      .select("neighbor_id", "nv", "centroid_id")
    val qAssigned = withCells(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv", math.min(nProbe, nC))
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
