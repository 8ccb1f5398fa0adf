package graft

import graft.operators.KMeans

class KMeansSpec extends SparkSpecBase {
  import spark.implicits._

  private def vecsDf(rows: Seq[(Long, Seq[Double])]) =
    rows.map { case (id, v) => (id, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "embedding")

  test("well-separated groups land in distinct clusters") {
    // Two tight groups far apart in 4-dim space; k=2, seeds are ids 1
    // and 2 (one from each group by construction).
    val a = Seq(0.9, 0.9, 0.0, 0.0)
    val b = Seq(-0.9, -0.9, 0.0, 0.0)
    def jitter(v: Seq[Double], eps: Double) = v.map(_ + eps)
    val df = vecsDf(Seq(
      1L -> a, 2L -> b,
      3L -> jitter(a, 0.01), 4L -> jitter(a, -0.02),
      5L -> jitter(b, 0.015), 6L -> jitter(b, -0.01)))
    val out = KMeans.assignments(df, k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(1L, 3L, 4L).map(out) === Set(0))
    assert(Set(2L, 5L, 6L).map(out) === Set(1))
  }

  test("assignments are bit-identical across partitionings") {
    // 40 vectors, 3 latent groups; the integer arithmetic must make
    // the fit invariant to how the shuffle reduces the sums.
    val rows = (0L until 40L).map { i =>
      val g = (i % 3).toInt
      val base = Seq.tabulate(8)(d => if (d % 3 == g) 0.8 else -0.2)
      i -> jitterDet(base, i)
    }
    val df = vecsDf(rows)
    def run(parts: Int) = KMeans.assignments(df.repartition(parts), k = 3, iters = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(run(1) === run(13))
  }

  private def jitterDet(v: Seq[Double], seed: Long): Seq[Double] =
    v.zipWithIndex.map { case (x, d) => x + ((seed * 31 + d) % 7 - 3) * 0.004 }

  test("a cluster that loses all members keeps its previous centroid") {
    // Seeds are ids 1..3; vectors 2 and 3 sit on top of vector 1's
    // group, so clusters 1 and 2 empty out after the first assign —
    // the fit must still converge and keep emitting k-consistent ids.
    val base = Seq(0.5, 0.5)
    val df = vecsDf(Seq(
      1L -> base, 2L -> Seq(0.5001, 0.5), 3L -> Seq(0.4999, 0.5),
      4L -> Seq(0.5, 0.5002), 5L -> Seq(0.5, 0.4998)))
    val out = KMeans.assignments(df, k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.size === 5)
    // Each vector's cluster is the seed nearest it: ids 2 and 3 stay
    // on their own seeds (distance 0 beats everything).
    assert(out(2L) === 1)
    assert(out(3L) === 2)
  }

  test("cluster quality: tight far-apart groups score near-zero ratio, sizes match") {
    val a = Seq(0.9, 0.9, 0.0, 0.0)
    val b = Seq(-0.9, -0.9, 0.0, 0.0)
    def j(v: Seq[Double], eps: Double) = v.map(_ + eps)
    val df = vecsDf(Seq(
      1L -> a, 2L -> b,
      3L -> j(a, 0.01), 4L -> j(a, -0.02),
      5L -> j(b, 0.015), 6L -> j(b, -0.01)))
    val q = KMeans.clusterQuality(df, k = 2, iters = 3).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(q.keySet === Set(0, 1))
    assert(q(0).getAs[Long]("n_points") === 3L)
    assert(q(1).getAs[Long]("n_points") === 3L)
    // Intra-group spread ~0.02 vs inter-group gap ~2.5: the
    // own/next-distance-squared ratio must be far below the 1e6
    // boundary value.
    assert(q.values.forall(_.getAs[Long]("max_ratio_e6") < 10000L))
  }

  test("prototype prune: closest-to-centroid quarter is marked, per cluster, determinately") {
    // Two clusters of 8: per cluster exactly floor(8*25/100) = 2
    // pruned, and they are the 2 smallest (d2, id) ranks.
    val a = Seq(1.0, 0.0, 0.0, 0.0)
    val b = Seq(-1.0, 0.0, 0.0, 0.0)
    def spread(base: Seq[Double], ids: Range) = ids.map { i =>
      i.toLong -> base.map(_ + (i % 8) * 0.01)
    }
    val df = vecsDf(spread(a, 1 to 8) ++ spread(b, 9 to 16))
    val rows = KMeans.prototypePrune(df, k = 2, iters = 3, prunePct = 25).collect()
    assert(rows.length === 16)
    rows.groupBy(_.getAs[Int]("cluster")).foreach { case (c, rs) =>
      assert(rs.length === 8, s"cluster $c size")
      val pruned = rs.filter(_.getAs[Boolean]("pruned"))
      assert(pruned.length === 2, s"cluster $c pruned count")
      // The pruned rows are exactly ranks 1..2.
      assert(pruned.map(_.getAs[Long]("rk")).sorted.toSeq === Seq(1L, 2L))
      // Rank order follows (d2, id).
      val byRank = rs.sortBy(_.getAs[Long]("rk"))
      val d2s = byRank.map(_.getAs[Long]("dist2_e12"))
      assert(d2s === d2s.sorted)
    }
  }

  test("prototype prune: prunePct 0 keeps everything, 100 prunes everything") {
    val df = vecsDf((1L to 6L).map(i => i -> Seq(i * 0.1, 0.0, 0.0, 0.0)))
    val none = KMeans.prototypePrune(df, k = 2, iters = 2, prunePct = 0).collect()
    assert(none.forall(!_.getAs[Boolean]("pruned")))
    val all = KMeans.prototypePrune(df, k = 2, iters = 2, prunePct = 100).collect()
    assert(all.forall(_.getAs[Boolean]("pruned")))
  }

  test("cluster quality: a centroid-coincident point in a k=2 fit scores ratio by the gap") {
    // Two exact duplicate pairs as seeds: every point sits ON its
    // centroid (d_own = 0) -> ratio 0; mean_dist2 = 0.
    val df = vecsDf(Seq(
      1L -> Seq(0.5, 0.5), 2L -> Seq(-0.5, -0.5),
      3L -> Seq(0.5, 0.5), 4L -> Seq(-0.5, -0.5)))
    val q = KMeans.clusterQuality(df, k = 2, iters = 2).collect()
    assert(q.forall(_.getAs[Long]("mean_dist2_e12") === 0L))
    assert(q.forall(_.getAs[Long]("max_ratio_e6") === 0L))
  }
}
