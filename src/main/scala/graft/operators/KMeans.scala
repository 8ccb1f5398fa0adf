package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Cluster assignment after `iters` Lloyd iterations: returns
    * (idCol, cluster, dist2_e12) — dist2 in squared micro-units.
    */
  def assignments(vecs: DataFrame, k: Int = 8, iters: Int = 3,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && iters > 0, s"k=$k and iters=$iters must be positive")
    val v = vecs.select(col(idCol).as("id"),
      transform(col(vecCol), x => floor(x.cast("double") * 1000000.0)).as("v"))

    // Seeds: the k lowest ids, cluster index = ascending-id order.
    val seedRows = v.orderBy(col("id")).limit(k).select(col("v")).collect()
    require(seedRows.length >= k, s"need at least $k vectors, got ${seedRows.length}")
    var cents: IndexedSeq[IndexedSeq[Long]] =
      seedRows.toIndexedSeq.map(_.getSeq[Long](0).toIndexedSeq)
    val dim = cents.head.length

    def assign(): DataFrame = {
      val cArr = typedLit(cents.map(_.toSeq).toSeq)
      v.withColumn("__scored",
          zip_with(
            transform(cArr, cv =>
              aggregate(zip_with(col("v"), cv, (a, b) => (a - b) * (a - b)),
                lit(0L), (acc, x) => acc + x)),
            sequence(lit(0), lit(k - 1)),
            (d, i) => struct(d.as("d"), i.as("i"))))
        // array_min on (d, i) structs: lexicographic → min distance,
        // ties to the lowest cluster index.
        .withColumn("__best", array_min(col("__scored")))
        .select(col("id"), col("v"),
          col("__best")("i").as("cluster"), col("__best")("d").as("dist2_e12"))
    }

    // iters-1 update rounds, then the final assignment is the result.
    for (_ <- 1 until iters) {
      val sums = assign()
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = Array.tabulate(k)(c => cents(c).toArray)
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = Math.floorDiv(r.getLong(2), r.getLong(3))
      }
      cents = next.toIndexedSeq.map(_.toIndexedSeq)
    }
    assign().select(col("id").as(idCol), col("cluster"), col("dist2_e12"))
  }
}
