package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Indicators
import graft.streaming.{OrderFlowStream, VpinStream}
import graft.streaming.OrderFlowStream.Tick
import graft.streaming.VpinStream.BucketRow

/** Pins the streaming fixed-bucket volume clock (VpinStream, chained
  * after the OrderFlowStream classifier in ONE streaming query — two
  * transformWithState operators back to back) to the batch
  * b21 operator (Indicators.vpinRolling) under arbitrary micro-batch
  * slicings. The stream emits a bucket when a later trade lands past
  * it, so the comparison excludes each symbol's final (still-filling)
  * bucket; single-day data per the OrderFlowStream equivalence scope.
  */
class VpinStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private val BucketVol = 30L
  private val Win = 2

  // Volumes chosen to exercise: exact boundary fills, a bucket-jumping
  // oversize trade (vol 70 > 2 buckets), and unclassified first ticks.
  private val trades = Map(
    "AAA" -> Seq((10.0, 10L), (11.0, 15L), (11.0, 5L), (10.0, 20L), (12.0, 70L),
      (11.0, 10L), (13.0, 25L), (13.0, 10L)),
    "BBB" -> Seq((5.0, 12L), (6.0, 30L), (4.0, 18L), (5.0, 40L)))

  private val baseTs = 1705312800000L

  private def silverDf: DataFrame =
    trades.toSeq.flatMap { case (sym, ps) =>
      ps.zipWithIndex.map { case ((p, v), i) =>
        (sym.hashCode.toLong * 1000 + i, sym, p, v,
          new java.sql.Timestamp(baseTs + i * 60000L),
          java.sql.Date.valueOf("2024-01-15"))
      }
    }.toDF("event_id", "symbol", "price", "volume", "event_time", "trade_date")

  private def ticks: Seq[Tick] =
    trades.toSeq.flatMap { case (sym, ps) =>
      ps.zipWithIndex.map { case ((p, v), i) =>
        Tick(sym, (BigDecimal(p) * 10000).toLongExact, v,
          baseTs + i * 60000L, sym.hashCode.toLong * 1000 + i)
      }
    }.sortBy(t => (t.ts, t.symbol))

  private def runSliced(slices: Seq[Seq[Tick]], name: String): Seq[BucketRow] =
    withRocksDbState {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Tick]
      val chained = VpinStream.buckets(spark,
        OrderFlowStream.verdicts(spark, mem.toDS()), BucketVol, Win)
      val q = chained.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[BucketRow].collect().toSeq
    }

  /** Batch b21 rows minus each symbol's final (still-filling) bucket. */
  private def batchCompleted: Set[BucketRow] = {
    val rows = Indicators.vpinRolling(silverDf, BucketVol, Win).collect()
      .map(r => BucketRow(r.getAs[String]("symbol"), r.getAs[Long]("bucket"),
        r.getAs[Long]("buy"), r.getAs[Long]("sell"), r.getAs[Long]("vol"),
        r.getAs[Long]("n_in_window"), r.getAs[Long]("vpin_roll_e6")))
    val lastBucket = rows.groupBy(_.symbol).view.mapValues(_.map(_.bucket).max).toMap
    rows.filterNot(r => r.bucket == lastBucket(r.symbol)).toSet
  }

  test("chained classify->bucket stream equals batch b21 on completed buckets, any slicing") {
    val want = batchCompleted
    assert(want.nonEmpty, "fixture must complete at least one bucket per symbol")
    val all = ticks
    val slicings = Seq(
      ("one", Seq(all)),
      ("tiny", all.grouped(3).toSeq),
      ("skew", Seq(all.take(2), all.slice(2, 9), all.drop(9))))
    for ((tag, s) <- slicings)
      assert(runSliced(s, s"vpin_$tag").toSet === want, s"slicing $tag")
  }

  test("replaying every batch emits no duplicate buckets") {
    val all = ticks
    val vs = runSliced(Seq(all, all) ++ all.grouped(3).toSeq, "vpin_replay")
    assert(vs.size === vs.toSet.size)
    assert(vs.toSet === batchCompleted)
  }

  test("day-keyed classification chain equals batch b21 on MULTI-day data (sr4's recipe)") {
    // Two days: the batch classifier resets at the day boundary (the
    // per-(symbol, trade_date) window frame), so day 2's first tick is
    // unclassified even though day 1 ended on a known price. Keying
    // the streamed classifier by "symbol|day" reproduces that reset;
    // the volume clock stays symbol-keyed (continuous across days in
    // batch too).
    val dayMs = 86400000L
    val twoDay: DataFrame =
      trades.toSeq.flatMap { case (sym, ps) =>
        (0 until 2).flatMap { d =>
          ps.zipWithIndex.map { case ((p, v), i) =>
            (sym.hashCode.toLong * 10000 + d * 1000 + i, sym, p + d, v,
              new java.sql.Timestamp(baseTs + d * dayMs + i * 60000L),
              java.sql.Date.valueOf(if (d == 0) "2024-01-15" else "2024-01-16"))
          }
        }
      }.toDF("event_id", "symbol", "price", "volume", "event_time", "trade_date")
    val rows = Indicators.vpinRolling(twoDay, BucketVol, Win).collect()
      .map(r => BucketRow(r.getAs[String]("symbol"), r.getAs[Long]("bucket"),
        r.getAs[Long]("buy"), r.getAs[Long]("sell"), r.getAs[Long]("vol"),
        r.getAs[Long]("n_in_window"), r.getAs[Long]("vpin_roll_e6")))
    val lastBucket = rows.groupBy(_.symbol).view.mapValues(_.map(_.bucket).max).toMap
    val want = rows.filterNot(r => r.bucket == lastBucket(r.symbol)).toSet
    assert(want.nonEmpty)

    val keyedTicks: Seq[(String, Tick)] =
      trades.toSeq.flatMap { case (sym, ps) =>
        (0 until 2).flatMap { d =>
          ps.zipWithIndex.map { case ((p, v), i) =>
            (s"$sym|$d", Tick(sym, (BigDecimal(p + d) * 10000).toLongExact, v,
              baseTs + d * dayMs + i * 60000L,
              sym.hashCode.toLong * 10000 + d * 1000 + i))
          }
        }
      }.sortBy(t => (t._2.ts, t._2.symbol))
    val got = withRocksDbState {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(String, Tick)]
      val grouped = mem.toDS().groupByKey(_._1).mapValues(_._2)
      val chained = VpinStream.buckets(spark,
        OrderFlowStream.verdictsGrouped(spark, grouped), BucketVol, Win)
      val q = chained.writeStream.format("memory").queryName("vpin_daykey")
        .outputMode("append").start()
      keyedTicks.grouped(5).foreach { s => mem.addData(s: _*); q.processAllAvailable() }
      q.stop()
      spark.table("vpin_daykey").as[BucketRow].collect().toSeq
    }
    assert(got.toSet === want)
    assert(got.size === got.toSet.size)
  }

  test("step: oversize trade jumps buckets without emitting empties; state stays O(window)") {
    import graft.streaming.OrderFlowStream.Verdict
    var st = VpinStream.empty
    val out = Seq.newBuilder[BucketRow]
    val vs = Seq(
      Verdict("X", 1L, 1L, 0, 10L),   // bucket 0 fills 10/30
      Verdict("X", 2L, 2L, 1, 100L),  // still bucket 0 (cum_prev 10): vol 110
      Verdict("X", 3L, 3L, -1, 5L),   // cum_prev 110 -> bucket 3: closes bucket 0
      Verdict("X", 4L, 4L, 1, 40L))   // cum_prev 115 -> still bucket 3
    vs.foreach { v =>
      val (n, r) = VpinStream.step(st, v, 30L, 2); st = n; r.foreach(out += _)
    }
    val rows = out.result()
    assert(rows.map(_.bucket) === Seq(0L)) // buckets 1-2 never existed
    assert(rows.head.vol === 110L && rows.head.buy === 100L && rows.head.sell === 0L)
    assert(rows.head.n_in_window === 1L)
    assert(rows.head.vpin_roll_e6 === 100L * 1000000L / 110L)
    assert(st.recentVol.size <= 1) // window-1 completed buckets retained
    assert(st.curBucket === 3L && st.vol === 45L)
  }
}
