package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Indicators

class IndicatorsSpec extends SparkSpecBase {
  import spark.implicits._

  /** A tiny silver-shaped frame: one symbol, strictly increasing
    * event times, hand-pickable prices.
    */
  private def feed(prices: Seq[Double], symbol: String = "AAPL"): DataFrame =
    prices.zipWithIndex.map { case (p, i) =>
      (i.toLong, symbol, p, 10L,
        new java.sql.Timestamp(1705312800000L + i * 60000L),
        java.sql.Date.valueOf("2024-01-15"))
    }.toDF("event_id", "symbol", "price", "volume", "event_time", "trade_date")

  test("SMA of a constant series is the constant; variance numerator is zero") {
    val out = Indicators.smaBollinger(feed(Seq.fill(30)(42.5)), n = 20).collect()
    assert(out.length === 30)
    assert(out.forall(_.getAs[Long]("sma_e6") === 42500000L))
    assert(out.forall(_.getAs[Long]("var_num") === 0L))
    assert(out.forall(r => r.getAs[Double]("bb_upper") === 42.5 &&
      r.getAs[Double]("bb_lower") === 42.5))
  }

  test("SMA window covers exactly the trailing n rows") {
    // Prices 1..25: at row i (0-based, i>=19) the 20-row mean is
    // (i-18 + ... + i+1)/20 = i - 8.5.
    val out = Indicators.smaBollinger(feed((1 to 25).map(_.toDouble)), n = 20)
      .orderBy(col("ts_ms")).collect()
    assert(out(19).getAs[Long]("cnt") === 20L)
    assert(out(19).getAs[Double]("sma") === 10.5)
    assert(out(24).getAs[Double]("sma") === 15.5)
    // Warm-up rows average what they have.
    assert(out(0).getAs[Long]("cnt") === 1L)
    assert(out(0).getAs[Double]("sma") === 1.0)
  }

  test("RSI is 100*gain/(gain+loss) over the trailing 14 changes, flat window null") {
    // 14 changes: +1 eleven times, -1 three times -> RSI = 11/14.
    val prices = Seq(10.0) ++
      (1 to 11).map(i => 10.0 + i) ++ Seq(20.0, 19.0, 18.0)
    val out = Indicators.rsi(feed(prices), n = 14).orderBy(col("ts_ms")).collect()
    assert(out.length === 1) // only the last row has 14 diffs
    assert(out.head.getAs[Long]("rsi_e4") === 1000000L * 11 / 14)
    val flat = Indicators.rsi(feed(Seq.fill(20)(50.0)), n = 14).collect()
    assert(flat.nonEmpty && flat.forall(_.isNullAt(flat.head.fieldIndex("rsi_e4"))))
  }

  test("spike counts flag a planted outlier and only the outlier") {
    // 39 quiet prices around 100 with a jitter, one 10x spike.
    val quiet = (0 until 39).map(i => 100.0 + (i % 5) * 0.01)
    val out = Indicators.spikeCounts(feed(quiet :+ 1000.0), n = 20, z = 3).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_spikes") === 1L)
    assert(out.head.getAs[Long]("n_windows") === 21L) // rows 19..39
  }

  test("top movers ranks by |return| with deterministic tie-break") {
    val a = feed(Seq(100.0, 101.0, 101.0), "A") // +1%, 0%
    val b = feed(Seq(100.0, 150.0, 75.0), "B")  // +50%, -50%
    val out = Indicators.topMovers(a.unionByName(b), k = 2)
      .orderBy(col("rnk")).collect()
    assert(out.length === 2)
    assert(out(0).getAs[String]("symbol") === "B")
    assert(math.abs(out(0).getAs[Double]("ret") - 0.5) < 1e-12)
    assert(out(1).getAs[String]("symbol") === "B")
    assert(out(1).getAs[Double]("ret") === -0.5)
  }

  test("crypto-scale prices survive the variance path (no Long overflow)") {
    // BTC-scale ticks: px ~ 1e9 e4-units, so (Σpx)² ~ 4e20 — past 2⁶³.
    // The decimal intermediates must absorb that; the final var_num
    // (a difference of near-equal moments) still fits a Long.
    val prices = (0 until 25).map(i => 97000.0 + (i % 7) * 13.37)
    val out = Indicators.smaBollinger(feed(prices), n = 20)
      .orderBy(col("ts_ms")).collect()
    assert(out.length === 25)
    assert(out.forall(_.getAs[Long]("var_num") >= 0L))
    assert(out.forall(r => r.getAs[Double]("bb_upper") >= r.getAs[Double]("bb_lower")))
    val spikes = Indicators.spikeCounts(
      feed((0 until 39).map(i => 97000.0 + (i % 5) * 0.5) :+ 150000.0), n = 20, z = 3)
      .collect()
    assert(spikes.head.getAs[Long]("n_spikes") === 1L)
  }

  test("plans contain no partition-less window") {
    val silver = SparkEntry.silverDf(spark, Sf)
    Seq(Indicators.smaBollinger(silver), Indicators.rsi(silver),
      Indicators.topMovers(silver), Indicators.spikeCounts(silver)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      // Every Window operator must carry a partition spec: a global
      // window would serialize the whole feed through one task.
      plan.split('\n').filter(_.contains("Window")).foreach { line =>
        assert(!line.contains("windowspecdefinition()"),
          s"partition-less window in:\n$line")
      }
    }
  }
}
