package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters
import graft.streaming.HeavyHitterStream

class HeavyHitterStreamSpec extends SparkSpecBase {
  import spark.implicits._

  // Zipf-ish corpus: "hot0"/"hot1" together ~28% of traffic, a long
  // tail of singletons. φ = 10% ⇒ true heavy hitters = the two hots.
  private val items: Seq[String] = {
    val hot = Seq.fill(90)("hot0") ++ Seq.fill(50)("hot1")
    val warm = (0 until 10).flatMap(i => Seq.fill(8)(s"warm$i"))
    val tail = (0 until 270).map(i => s"tail$i")
    // Deterministic interleave (no RNG): round-robin by index mix.
    (hot ++ warm ++ tail).zipWithIndex
      .sortBy { case (_, i) => (i * 37) % 500 }.map(_._1)
  }
  private val phiE6 = 100000L // 10%
  private val k = (2000000L / phiE6 + 1).toInt // 21, the batch default

  private def runSliced(slices: Seq[Seq[String]]): Seq[HeavyHitterStream.HHCandidate] =
    withRocksDbState {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[String]
      val name = s"hh_out_${slices.length}_${slices.head.length}"
      val q = HeavyHitterStream.candidates(spark, mem.toDS(), k = k, numGroups = 8)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[HeavyHitterStream.HHCandidate].collect().toSeq
    }

  private def exactVerified(candidates: Set[String]): Seq[(String, Long)] = {
    val n = items.length.toLong
    val minTf = (n * phiE6 + 999999) / 1000000
    items.toDF("item").filter(col("item").isInCollection(candidates.toSeq))
      .groupBy("item").agg(count(lit(1)).as("tf"))
      .filter(col("tf") >= minTf)
      .orderBy(col("tf").desc, col("item"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  test("no false negatives: every true φ-heavy item survives any slicing") {
    val slicings = Seq(
      Seq(items),                                  // one batch
      items.grouped(23).toSeq,                     // many small batches
      Seq(items.take(1), items.slice(1, 400), items.drop(400)))
    for (s <- slicings) {
      val cands = HeavyHitterStream.latestCandidates(runSliced(s))
      assert(cands.contains("hot0") && cands.contains("hot1"),
        s"missed a true heavy hitter with ${s.length} slices")
      // exact verification equals the batch operator, slicing-independent
      val streamed = exactVerified(cands)
      val batch = HeavyHitters.exactHeavyHitters(items.toDF("item"), "item", phiE6)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(streamed === batch, s"exact-verified mismatch with ${s.length} slices")
    }
  }

  test("state stays bounded at k counters per group") {
    val rows = runSliced(items.grouped(50).toSeq)
    val latest = rows.groupBy(_.group).map { case (_, rs) =>
      val top = rs.maxBy(_.snapshot_seq).snapshot_seq
      rs.count(_.snapshot_seq == top)
    }
    assert(latest.forall(_ <= k), s"a group tracked more than k=$k counters")
    // group totals over the newest snapshots must account for every item
    val totals = rows.groupBy(_.group).map { case (_, rs) =>
      rs.maxBy(_.snapshot_seq).group_total
    }
    assert(totals.sum === items.length.toLong)
  }
}
