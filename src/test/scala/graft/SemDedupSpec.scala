package graft

import graft.operators.SemDedup

class SemDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def vecsDf(rows: Seq[(Long, Seq[Double])]) =
    rows.map { case (id, v) => (id, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "embedding")

  // Two well-separated directions; ids 2 and 3 are near-copies of id 0.
  private val a = Seq(0.9, 0.8, 0.0, 0.1)
  private val b = Seq(-0.9, 0.1, 0.8, -0.2)
  private def corpus = vecsDf(Seq(
    0L -> a, 1L -> b,
    2L -> a.map(_ * 1.01),          // same direction → cos ≈ 1
    3L -> a.map(_ * 0.98),
    4L -> b.map(x => -x)))          // opposite direction → cos ≈ −1, kept

  test("near-copies collapse onto the lowest id, distinct directions survive") {
    val out = SemDedup.dedup(corpus, targetClusterSize = 64, kMin = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(0L) === -1L)
    assert(out(2L) === 0L)
    assert(out(3L) === 0L)
    assert(out(1L) === -1L) // different direction
    assert(out(4L) === -1L) // no positive-cosine near-copy anywhere
  }

  test("dup groups resolve within each k-means cluster independently") {
    val out = SemDedup.dedup(vecsDf(Seq(
        0L -> a, 1L -> b,
        2L -> a.map(_ * 1.01), 3L -> a.map(_ * 0.98),
        4L -> b.map(_ * 1.02))),
      targetClusterSize = 64, kMin = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out(2L)._2 === 0L)
    assert(out(3L)._2 === 0L)
    assert(out(4L)._2 === 1L)       // b-family dup stays in the b cluster
    assert(out(0L)._2 === -1L)
    assert(out(1L)._2 === -1L)
    assert(out(4L)._1 === out(1L)._1)
    assert(out(4L)._1 !== out(0L)._1)
  }

  test("verdicts are invariant to partitioning") {
    def run(parts: Int) =
      SemDedup.dedup(corpus.repartition(parts), kMin = 2, iters = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(run(1) === run(5))
  }
}
