package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Indicators
import graft.streaming.OrderFlowStream
import graft.streaming.OrderFlowStream.{Tick, Verdict}

/** Pins the streaming tick-rule classifier (per-symbol ValueState) to
  * the batch b16 operator under arbitrary micro-batch slicings and
  * replays. Single-day data: the batch frame resets tick state at day
  * boundaries while the live stream carries it across (documented in
  * OrderFlowStream).
  */
class OrderFlowStreamSpec extends SparkSpecBase {
  import spark.implicits._

  // Two symbols, single day, hand-mixed up/down/zero ticks.
  private val prices = Map(
    "AAA" -> Seq(10.0, 10.0, 11.0, 11.0, 10.0, 10.0, 12.0),
    "BBB" -> Seq(5.0, 6.0, 6.0, 4.0))

  private val baseTs = 1705312800000L

  private def silverDf: DataFrame =
    prices.toSeq.flatMap { case (sym, ps) =>
      ps.zipWithIndex.map { case (p, i) =>
        (sym.hashCode.toLong * 1000 + i, sym, p, 10L,
          new java.sql.Timestamp(baseTs + i * 60000L),
          java.sql.Date.valueOf("2024-01-15"))
      }
    }.toDF("event_id", "symbol", "price", "volume", "event_time", "trade_date")

  private def ticks: Seq[Tick] =
    prices.toSeq.flatMap { case (sym, ps) =>
      ps.zipWithIndex.map { case (p, i) =>
        Tick(sym, (BigDecimal(p) * 10000).toLongExact, 10L,
          baseTs + i * 60000L, sym.hashCode.toLong * 1000 + i)
      }
    }.sortBy(t => (t.ts, t.symbol))

  private def runSliced(slices: Seq[Seq[Tick]], name: String): Seq[Verdict] =
    withRocksDbState {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Tick]
      val q = OrderFlowStream.verdicts(spark, mem.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[Verdict].collect().toSeq
    }

  /** Aggregate streamed verdicts the way b16 aggregates signs. */
  private def flows(vs: Seq[Verdict]): Map[String, (Long, Long, Long, Long, Long)] =
    vs.groupBy(_.symbol).view.mapValues { g =>
      (g.count(_.sign == 1).toLong, g.count(_.sign == -1).toLong,
        g.count(_.sign == 0).toLong,
        g.filter(_.sign == 1).map(_.volume).sum,
        g.filter(_.sign == -1).map(_.volume).sum)
    }.toMap

  private def batchFlows: Map[String, (Long, Long, Long, Long, Long)] =
    Indicators.orderFlow(silverDf).collect().map { r =>
      r.getAs[String]("symbol") -> ((r.getAs[Long]("n_buy"), r.getAs[Long]("n_sell"),
        r.getAs[Long]("n_unclassified"), r.getAs[Long]("buy_vol"), r.getAs[Long]("sell_vol")))
    }.toMap

  test("streamed verdict aggregates equal batch b16 under any slicing") {
    val want = batchFlows
    assert(want.nonEmpty)
    val all = ticks
    val slicings = Seq(
      ("one", Seq(all)),
      ("tiny", all.grouped(3).toSeq),
      ("skew", Seq(all.take(2), all.slice(2, 8), all.drop(8))))
    for ((tag, s) <- slicings) {
      assert(flows(runSliced(s, s"flow_$tag")) === want, s"slicing $tag")
    }
  }

  test("replaying a batch emits no duplicate verdicts") {
    val all = ticks
    val vs = runSliced(Seq(all, all), "flow_replay")
    assert(vs.size === all.size)
    assert(flows(vs) === batchFlows)
  }

  test("distinct same-timestamp trades are classified; exact replays dropped") {
    // Two trades share ts but differ in eventId, split across
    // micro-batches: the (ts, eventId) high-water mark classifies
    // both (an uptick then a zero-tick carrying the last sign); a
    // full replay emits nothing new.
    val b1 = Seq(Tick("CCC", 100000L, 5L, baseTs, 1L),
      Tick("CCC", 110000L, 7L, baseTs + 1, 2L))
    val b2 = Seq(Tick("CCC", 110000L, 9L, baseTs + 1, 3L))
    val vs = runSliced(Seq(b1, b2, b1 ++ b2), "flow_same_ts")
    assert(vs.sortBy(_.eventId).map(v => (v.eventId, v.sign)) ===
      Seq((1L, 0), (2L, 1), (3L, 1)))
  }
}
