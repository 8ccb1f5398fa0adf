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

  /** Two-day, two-symbol silver-shaped frame for the daily operators. */
  private def twoDayFeed: DataFrame = Seq(
    (1L, "A", 10.0, 10L, ts("2024-01-15 10:00:00"), d("2024-01-15")),
    (2L, "A", 12.0, 10L, ts("2024-01-15 11:00:00"), d("2024-01-15")),
    (3L, "A", 8.0, 10L, ts("2024-01-16 10:00:00"), d("2024-01-16")),
    (4L, "A", 11.0, 10L, ts("2024-01-16 11:00:00"), d("2024-01-16")),
    (5L, "B", 50.0, 10L, ts("2024-01-15 10:00:00"), d("2024-01-15"))
  ).toDF("event_id", "symbol", "price", "volume", "event_time", "trade_date")
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def d(s: String) = java.sql.Date.valueOf(s)

  test("drawdown: running-peak dips and cumulative return, exact e6") {
    val out = Indicators.drawdown(twoDayFeed).collect()
      .map(r => (r.getAs[String]("symbol"), r.getAs[java.sql.Date]("trade_date").toString) -> r)
      .toMap
    val d1 = out(("A", "2024-01-15"))
    assert(d1.getAs[Long]("max_drawdown_e6") === 0L) // 10 then 12: never below peak... except first row dd=0
    assert(d1.getAs[Long]("close_px") === 120000L)
    assert(d1.getAs[Long]("cum_ret_e6") === 200000L) // 12/10 - 1
    val d2 = out(("A", "2024-01-16"))
    // Peak stays 12 from day 1; trough 8 -> (120000-80000)*1e6 div 120000.
    assert(d2.getAs[Long]("max_drawdown_e6") === 333333L)
    assert(d2.getAs[Long]("peak_px") === 120000L)
    assert(d2.getAs[Long]("cum_ret_e6") === 100000L) // 11/10 - 1
    assert(out(("B", "2024-01-15")).getAs[Long]("max_drawdown_e6") === 0L)
  }

  test("MACD fold: seeds from first close, steps with the exact IEEE recurrence") {
    val out = Indicators.macdDaily(twoDayFeed).collect()
      .map(r => r.getAs[String]("symbol") -> r).toMap
    // B has one day: both EMAs = close, macd = signal = histogram = 0.
    val b = out("B")
    assert(b.getAs[Long]("n_days") === 1L)
    assert(b.getAs[Double]("ema12") === 50.0 && b.getAs[Double]("ema26") === 50.0)
    assert(b.getAs[Double]("macd") === 0.0 && b.getAs[Double]("signal") === 0.0)
    // A: closes 12 (day1), 11 (day2) — replicate the recurrence in
    // the same operation order and require bit equality.
    val (c1, c2) = (12.0, 11.0)
    val e12 = (2d / 13d) * c2 + (1d - 2d / 13d) * c1
    val e26 = (2d / 27d) * c2 + (1d - 2d / 27d) * c1
    val sig = (2d / 10d) * (e12 - e26) + (1d - 2d / 10d) * 0.0
    val a = out("A")
    assert(a.getAs[Long]("n_days") === 2L)
    assert(a.getAs[Double]("ema12") === e12)
    assert(a.getAs[Double]("ema26") === e26)
    assert(a.getAs[Double]("macd") === e12 - e26)
    assert(a.getAs[Double]("signal") === sig)
    assert(a.getAs[Double]("histogram") === e12 - e26 - sig)
  }

  test("return covariance: proportional series correlate to ~1, exact moments") {
    // Y = 2X tick-for-tick: both return series are identical integers
    // (ratios survive the scaling), so cov_num == var_a_num ==
    // var_b_num and corr ~ 1.
    val rows = Seq(10.0, 11.0, 12.0).zipWithIndex.flatMap { case (p, i) =>
      Seq((i * 2 + 1L, "X", p, 1L, ts(s"2024-01-1${i + 5} 10:00:00"), d(s"2024-01-1${i + 5}")),
          (i * 2 + 2L, "Y", p * 2, 1L, ts(s"2024-01-1${i + 5} 10:00:00"), d(s"2024-01-1${i + 5}")))
    }.toDF("event_id", "symbol", "price", "volume", "event_time", "trade_date")
    val out = Indicators.returnCovariance(rows).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getAs[String]("sym_a"), r.getAs[String]("sym_b")) === (("X", "Y")))
    assert(r.getAs[Long]("n_days") === 2L)
    // Numerators ship as exact integer STRINGS (decimal inside, text
    // at the boundary — the r5 fix: a decimal output column can never
    // hash-match the comparer above 2^53).
    assert(r.getAs[String]("cov_num") === r.getAs[String]("var_a_num"))
    assert(r.getAs[String]("var_a_num") === r.getAs[String]("var_b_num"))
    assert(BigInt(r.getAs[String]("var_a_num")).signum === 1)
    assert(math.abs(r.getAs[Double]("corr") - 1.0) < 1e-12)
  }

  test("market beta: proportional symbols have beta exactly 1") {
    // Y = 2X tick-for-tick: identical e6 return series (the *2 cancels
    // in the ratio before truncation), so the equal-weight market mean
    // IS each series — (r + r) div 2 = r exactly, negatives included —
    // and beta = cov/var = 1.0 with cov_num == var_m_num.
    val rows = Seq(10.0, 11.0, 9.0, 12.0).zipWithIndex.flatMap { case (p, i) =>
      Seq((i * 2 + 1L, "X", p, 1L, ts(s"2024-01-1${i + 3} 10:00:00"), d(s"2024-01-1${i + 3}")),
          (i * 2 + 2L, "Y", p * 2, 1L, ts(s"2024-01-1${i + 3} 10:00:00"), d(s"2024-01-1${i + 3}")))
    }.toDF("event_id", "symbol", "price", "volume", "event_time", "trade_date")
    val out = Indicators.marketBeta(rows).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_days") === 3L)
      assert(r.getAs[String]("cov_num") ===
        r.getAs[String]("var_m_num"), r.getAs[String]("symbol"))
      assert(r.getAs[Double]("beta") === 1.0)
    }
  }

  test("return covariance: >2^53 numerators stay exact (the r4 1-ulp class)") {
    // Volatile integer prices over ~300 days push the n·Σxy − Σx·Σy
    // numerators past 2^53 — the regime where a DOUBLE output column
    // no longer represents the exact integer and engines' int→double
    // casts can legally disagree (found live in round 4: DuckDB's
    // HUGEINT→DOUBLE double-rounds negatives). The operator must emit
    // the numerators EXACTLY; this replays its arithmetic in BigInt
    // and requires decimal equality, not closeness.
    // Y tracks 2X with a small perturbation: the return series stay
    // strongly correlated, so cov_num grows like the variances
    // (independent series would cancel toward zero and never cross
    // the boundary this fixture exists to exercise). Run at two sizes
    // so the outputs land in BOTH regimes with live breakpoints:
    // n=300 puts all numerators in (2^53, 1e17) — float64 loses
    // integer exactness; n=450 pushes them past 1e17 — pandas' %g
    // additionally switches to scientific TEXT. A regression in
    // either regime fails here before it fails a driver round.
    def pxX(i: Int): Long = 100000L + ((i.toLong * 7919L) % 9973L) * 37L
    def pxY(i: Int): Long = 2L * pxX(i) + ((i.toLong * 104729L) % 977L)
    def numerators(n: Int): Seq[BigInt] = {
      val rows = (0 until n).flatMap { i =>
        val day = java.sql.Date.valueOf(java.time.LocalDate.of(2023, 1, 1).plusDays(i))
        val t = new java.sql.Timestamp(1672531200000L + i * 86400000L)
        Seq((i * 2 + 1L, "X", pxX(i).toDouble, 1L, t, day),
            (i * 2 + 2L, "Y", pxY(i).toDouble, 1L, t, day))
      }.toDF("event_id", "symbol", "price", "volume", "event_time", "trade_date")
      val r = Indicators.returnCovariance(rows).collect().head
      // Replay: ticks are e4, returns truncate toward zero (Long /).
      def rets(px: Int => Long): Seq[Long] = (1 until n).map { i =>
        val (prev, cur) = (px(i - 1) * 10000L, px(i) * 10000L)
        (cur - prev) * 1000000L / prev
      }
      val (ra, rb) = (rets(pxX), rets(pxY))
      val days = BigInt(n - 1)
      def num(u: Seq[Long], v: Seq[Long]): BigInt =
        days * u.zip(v).map { case (x, y) => BigInt(x) * BigInt(y) }.sum -
          u.map(BigInt(_)).sum * v.map(BigInt(_)).sum
      Seq("cov_num" -> num(ra, rb), "var_a_num" -> num(ra, ra),
        "var_b_num" -> num(rb, rb)).map { case (c, exp) =>
        val s = r.getAs[String](c)
        // The boundary is TEXT now (r5): exact plain digits, never
        // scientific notation or a trailing ".0" — both live failure
        // modes of the float64 collapse this encoding exists to dodge.
        assert(!s.exists(ch => ch == 'e' || ch == 'E' || ch == '.'),
          s"$c not plain digits at n=$n: $s")
        assert(BigInt(s) === exp, s"$c at n=$n")
        exp
      }
    }
    val mid = numerators(300)
    assert(mid.forall(v => v.abs > BigInt(2).pow(53) &&
      v.abs < BigInt("100000000000000000")),
      s"n=300 numerators must sit in (2^53, 1e17), got $mid")
    val big = numerators(450)
    assert(big.forall(_.abs > BigInt("100000000000000000")),
      s"n=450 numerators must exceed 1e17, got $big")
  }

  /** Multi-day feed: per day a list of (price, volume) trades, in
    * event-time order within the day.
    */
  private def feedDays(days: Seq[(String, Seq[(Double, Long)])],
                       symbol: String = "AAPL"): DataFrame =
    days.zipWithIndex.flatMap { case ((d, trades), di) =>
      trades.zipWithIndex.map { case ((p, v), ti) =>
        ((di * 100 + ti).toLong, symbol, p, v,
          new java.sql.Timestamp(java.sql.Date.valueOf(d).getTime + 36000000L + ti * 60000L),
          java.sql.Date.valueOf(d))
      }
    }.toDF("event_id", "symbol", "price", "volume", "event_time", "trade_date")

  test("OBV signs each day's volume by close direction, flat and first days zero") {
    val out = Indicators.obv(feedDays(Seq(
      "2024-01-01" -> Seq((10.0, 5L)),
      "2024-01-02" -> Seq((12.0, 7L)),
      "2024-01-03" -> Seq((11.0, 3L), (12.0, 11L)), // close 12 — flat day
      "2024-01-04" -> Seq((9.0, 13L))))).orderBy(col("trade_date")).collect()
    assert(out.map(_.getAs[Long]("signed_vol")).toSeq === Seq(0L, 7L, 0L, -13L))
    assert(out.map(_.getAs[Long]("obv")).toSeq === Seq(0L, 7L, 7L, -6L))
    assert(out(2).getAs[Long]("day_volume") === 14L) // 3 + 11
  }

  test("ATR: first day is high-low, later days the Wilder max against prev close") {
    val out = Indicators.atr(feedDays(Seq(
      "2024-01-01" -> Seq((10.0, 1L), (20.0, 1L)), // hi 20 lo 10 close 20
      "2024-01-02" -> Seq((5.0, 1L), (6.0, 1L)))), n = 14) // hi 6 lo 5, prev close 20
      .orderBy(col("trade_date")).collect()
    // e4 ticks: day1 TR = 100000; day2 TR = max(10000, 140000, 150000).
    assert(out.map(_.getAs[Long]("tr")).toSeq === Seq(100000L, 150000L))
    assert(out(1).getAs[Long]("tr_sum") === 250000L)
    assert(out(1).getAs[Double]("atr") === 125000.0)
  }

  test("stochastic: %K is 100 at a window high, null on flat windows; %D needs 3 days") {
    val rising = feedDays((1 to 5).map(i => f"2024-01-0$i" -> Seq((i.toDouble, 1L))))
    val out = Indicators.stochastic(rising, n = 14).orderBy(col("trade_date")).collect()
    // Day 1: den 0 -> null; later days close == rolling high -> 100.
    assert(out(0).isNullAt(out(0).fieldIndex("pct_k")))
    assert((1 to 4).forall(i => out(i).getAs[Double]("pct_k") === 100.0))
    // %D: null until two prior %K values exist (day-1 %K is null too).
    assert((0 to 2).forall(i => out(i).isNullAt(out(i).fieldIndex("pct_d"))))
    assert(out(4).getAs[Double]("pct_d") === 100.0)
    val flat = Indicators.stochastic(feedDays(
      (1 to 3).map(i => f"2024-01-0$i" -> Seq((7.0, 1L)))), n = 14).collect()
    assert(flat.forall(r => r.isNullAt(r.fieldIndex("pct_k"))))
  }

  test("plans contain no partition-less window") {
    val silver = SparkEntry.silverDf(spark, Sf)
    Seq(Indicators.smaBollinger(silver), Indicators.rsi(silver),
      Indicators.topMovers(silver), Indicators.spikeCounts(silver),
      Indicators.drawdown(silver), Indicators.obv(silver),
      Indicators.atr(silver), Indicators.stochastic(silver),
      Indicators.realizedVol(silver), Indicators.rangeVol(silver)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      // Every Window operator must carry a partition spec: a global
      // window would serialize the whole feed through one task.
      plan.split('\n').filter(_.contains("Window")).foreach { line =>
        assert(!line.contains("windowspecdefinition()"),
          s"partition-less window in:\n$line")
      }
    }
  }

  test("TWAP weights each price by its live interval; last trade carries to day end") {
    // Day start 10:00: price 10 lives 30 min, price 20 lives until
    // midnight (13.5 h). span = 14 h. Hand value:
    //   num = 100000*1800000 + 200000*48600000 e4·ms
    //   twap_e6 = num*100 / 50400000 = 19642857 (floored)
    val t0 = 1705312800000L // 2024-01-15 10:00:00 UTC
    val rows = Seq(
      (1L, "AAPL", 10.0, 1L, new java.sql.Timestamp(t0), java.sql.Date.valueOf("2024-01-15")),
      (2L, "AAPL", 20.0, 1L, new java.sql.Timestamp(t0 + 1800000L), java.sql.Date.valueOf("2024-01-15")))
      .toDF("event_id", "symbol", "price", "volume", "event_time", "trade_date")
    val out = Indicators.twap(rows).collect().head
    assert(out.getAs[Long]("n_trades") === 2L)
    assert(out.getAs[Long]("span_ms") === 50400000L)
    val expect = (BigInt(100000L) * 1800000L + BigInt(200000L) * 48600000L) * 100 / 50400000L
    assert(out.getAs[Long]("twap_e6") === expect.toLong)
    // A volume-heavy print does not dominate: TWAP weighs TIME only —
    // same result with volume 1 or 1e6 on either row (by construction:
    // volume never enters the formula; asserted by schema absence).
    assert(!Indicators.twap(rows).columns.contains("volume"))
  }

  test("realized vol sums squared e6 log returns of 5m closes within the day") {
    // Minutes 0..9 → two 5m bars; closes = prices at minutes 4 and 9.
    // One return ln(110/100): r_e6 = ⌊ln(1.1)·1e6⌋ = 95310,
    // rv_e12 = 95310² = 9083996100, day_vol_e6 = ⌊√rv⌋ = 95310.
    val prices = Seq(100.0, 101.0, 102.0, 103.0, 100.0,
                     105.0, 106.0, 107.0, 108.0, 110.0)
    val out = Indicators.realizedVol(feed(prices)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_bars") === 2L)
    assert(r.getAs[Long]("n_returns") === 1L)
    assert(r.getAs[Long]("rv_e12") === 9083996100L)
    assert(r.getAs[Long]("day_vol_e6") === 95310L)
  }

  test("realized vol: single-bar day has zero returns and NULL rv") {
    val out = Indicators.realizedVol(feed(Seq(100.0, 101.0))).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_returns") === 0L)
    assert(out.head.isNullAt(out.head.fieldIndex("rv_e12")))
    assert(out.head.isNullAt(out.head.fieldIndex("day_vol_e6")))
  }

  test("range vol: Parkinson/Garman-Klass from the daily OHLC, hand-computed") {
    // O=100, H=120, L=90, C=105 (ticks 1e6, 1.2e6, 9e5, 1.05e6):
    //   lhl = ln(4/3)  → lhl_e9 = 287682072
    //   lco = ln(1.05) → lco_e9 = 48790164
    //   park_e9 = ⌊lhl²·(1/(4ln2))·1e9⌋ = 29849711
    //   gk_e9   = ⌊(0.5·lhl² − (2ln2−1)·lco²)·1e9⌋ = 40460921
    val out = Indicators.rangeVol(feed(Seq(100.0, 120.0, 90.0, 105.0))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("open") === 1000000L)
    assert(r.getAs[Long]("high") === 1200000L)
    assert(r.getAs[Long]("low") === 900000L)
    assert(r.getAs[Long]("close") === 1050000L)
    assert(r.getAs[Long]("lhl_e9") === 287682072L)
    assert(r.getAs[Long]("lco_e9") === 48790164L)
    assert(r.getAs[Long]("park_e9") === 29849711L)
    assert(r.getAs[Long]("gk_e9") === 40460921L)
  }

  test("range vol: flat day (one trade) gives zero estimators") {
    val out = Indicators.rangeVol(feed(Seq(42.0))).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("lhl_e9") === 0L)
    assert(out.head.getAs[Long]("park_e9") === 0L)
    assert(out.head.getAs[Long]("gk_e9") === 0L)
  }

  test("order flow: tick test with zero-tick inheritance, hand-classified") {
    // prices: 10, 10, 11, 11, 10, 10, 12
    // signs:   ?,  ?, +1, +1(zero-tick inherit), -1, -1(inherit), +1
    // -> n_buy=3, n_sell=2, n_unclassified=2 (leading flat run),
    //    volumes 10 each: buy 30, sell 20, imbalance (10*1e6)/50=200000.
    val out = Indicators.orderFlow(
      feed(Seq(10.0, 10.0, 11.0, 11.0, 10.0, 10.0, 12.0))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_buy") === 3L)
    assert(r.getAs[Long]("n_sell") === 2L)
    assert(r.getAs[Long]("n_unclassified") === 2L)
    assert(r.getAs[Long]("buy_vol") === 30L)
    assert(r.getAs[Long]("sell_vol") === 20L)
    assert(r.getAs[Long]("flow_imbalance_e6") === 200000L)
  }

  test("kyle lambda: exact OLS slope over hand-built 5m bins") {
    // 15 trades at 1-min spacing (feed's epoch is 5m-aligned) = three
    // 5m bins of 5 trades, volume 10 each.
    //   bin0 px 10..14: row0 unclassified, 4 upticks  -> q=+40, dp=+40000
    //   bin1 px 14..10: zero-tick inherits +1, then 4 downticks
    //                                             -> q=-30, dp=-40000
    //   bin2 px 10..14: zero-tick inherits -1, then 4 upticks
    //                                             -> q=+30, dp=+40000
    // n=3 sx=40 sy=40000 sxy=4e6 sxx=3400
    //   num = 3*4e6 - 40*40000 = 10_400_000
    //   den = 3*3400 - 1600    = 8_600
    //   lambda_e9 = 10_400_000 * 1e9 div 8600 = 1_209_302_325_581
    //   (= 1209.302... e4-ticks-per-share, truncated at e9)
    val prices = Seq(10.0, 11.0, 12.0, 13.0, 14.0,
                     14.0, 13.0, 12.0, 11.0, 10.0,
                     10.0, 11.0, 12.0, 13.0, 14.0)
    val out = Indicators.kyleLambda(feed(prices)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_bins") === 3L)
    assert(r.getAs[Long]("net_flow") === 40L)
    assert(r.getAs[Long]("lambda_e9") === 1209302325581L)
  }

  test("kyle lambda: zero flow variance gives NULL, not a blow-up") {
    // Constant prices: every sign is null, every bin q = 0 -> den = 0.
    val flat = Indicators.kyleLambda(feed(Seq.fill(12)(42.0))).collect().head
    assert(flat.isNullAt(flat.fieldIndex("lambda_e9")))
    // A single bin: den = 1*q^2 - q^2 = 0 regardless of q.
    val one = Indicators.kyleLambda(feed(Seq(10.0, 11.0, 12.0))).collect().head
    assert(one.getAs[Long]("n_bins") === 1L)
    assert(one.isNullAt(one.fieldIndex("lambda_e9")))
  }

  test("amihud: |daily ret| per dollar volume, exact truncating e12") {
    // Day 1 close 100.0 (pv irrelevant: no prior day), day 2 close
    // 110.0 with one 10-share trade: ret_e6 = 100000,
    // pv_ticks = 1100000*10, illiq_e12 = 1e17 div 1.1e7 = 9090909090.
    val df = Seq(
      (1L, "A", 100.0, 5L, new java.sql.Timestamp(1705312800000L),
        java.sql.Date.valueOf("2024-01-15")),
      (2L, "A", 110.0, 10L, new java.sql.Timestamp(1705399200000L),
        java.sql.Date.valueOf("2024-01-16"))
    ).toDF("event_id", "symbol", "price", "volume", "event_time", "trade_date")
    val out = Indicators.amihudIlliquidity(df).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_days") === 1L)
    assert(out.head.getAs[Long]("avg_illiq_e12") === 9090909090L)
  }

  test("roll spread: alternating bounce gives the closed-form negative cov") {
    // px deltas +100,-100,+100,-100 -> 3 pairs, s_dd=-30000, s_d=100,
    // s_dn=-100 -> cov_num = 3*(-30000) - 100*(-100) = -80000;
    // spread = 2*sqrt(80000/9), the identical IEEE chain.
    val out = Indicators.rollSpread(feed(Seq(10.0, 10.01, 10.0, 10.01, 10.0)))
      .collect().head
    assert(out.getAs[Long]("n_pairs") === 3L)
    assert(out.getAs[String]("cov_num") === "-80000")
    assert(out.getAs[Double]("roll_spread_ticks") ===
      2.0 * math.sqrt(-(-80000.0) / (3.0 * 3.0)))
    // No bounce (monotone prices): cov positive -> NULL spread.
    val up = Indicators.rollSpread(feed(Seq(10.0, 10.01, 10.02, 10.03))).collect().head
    assert(up.getAs[String]("cov_num").toLong >= 0)
    assert(up.isNullAt(up.fieldIndex("roll_spread_ticks")))
  }

  test("vpin: equal-volume buckets over the tick-test signs, hand-built") {
    // 4 trades, 10 shares each, nBuckets=4 -> vbucket=10, one trade
    // per bucket. Signs: null, +1 (uptick), +1 (zero-tick inherits),
    // -1 (downtick). |buy-sell| per bucket: 0,10,10,10 ->
    // vpin_e6 = 30*1e6 div 40 = 750000.
    val out = Indicators.vpin(feed(Seq(10.0, 11.0, 11.0, 9.0)), nBuckets = 4)
      .collect().head
    assert(out.getAs[Long]("n_buckets") === 4L)
    assert(out.getAs[Long]("vpin_e6") === 750000L)
    // One bucket (nBuckets=1) degenerates to |net flow| / volume.
    val one = Indicators.vpin(feed(Seq(10.0, 11.0, 11.0, 9.0)), nBuckets = 1)
      .collect().head
    assert(one.getAs[Long]("n_buckets") === 1L)
    assert(one.getAs[Long]("vpin_e6") === 1000000L * 10 / 40) // |20-10|/40
  }

  test("order flow: negative imbalance truncates toward zero like the oracle's //") {
    // 10, 9, 9, 9: one downtick then two zero-tick inherits -> 3 sells,
    // 0 buys; imbalance = -30*1e6 div 30 = -1000000 exactly. A second
    // shape with mixed volume checks the toward-zero truncation:
    // buy 10, sell 20 -> -10*1e6 div 30 = -333333 (not -333334).
    val a = Indicators.orderFlow(feed(Seq(10.0, 9.0, 9.0, 9.0))).collect().head
    assert(a.getAs[Long]("flow_imbalance_e6") === -1000000L)
    val b = Indicators.orderFlow(feed(Seq(10.0, 11.0, 10.0, 9.0))).collect().head
    assert(b.getAs[Long]("n_buy") === 1L && b.getAs[Long]("n_sell") === 2L)
    assert(b.getAs[Long]("flow_imbalance_e6") === -333333L)
  }

  test("intraday profile: hour bucketing by epoch micros; day-keyed lag drops the open") {
    // Two days, two hours each. Day boundary: each day's FIRST trade
    // has no return (overnight gap excluded); within-day returns land
    // in the hour of the LATER trade. 1705312800000 ms = 10:00 UTC.
    val h = 3600000L
    val df = Seq(
      // day 1: 10:00 @100.0, 10:30 @101.0 (ret in hour 10), 11:00 @101.0 (ret 0, hour 11)
      (1L, "A", 100.0, 5L, 0L), (2L, "A", 101.0, 5L, 1800000L), (3L, "A", 101.0, 5L, h),
      // day 2: 10:00 @200.0 (no ret), 10:10 @202.0 (ret in hour 10)
      (4L, "A", 200.0, 5L, 86400000L), (5L, "A", 202.0, 5L, 86400000L + 600000L)
    ).map { case (id, s, p, v, off) =>
      (id, s, p, v, new java.sql.Timestamp(1705312800000L + off),
        java.sql.Date.valueOf(if (off < 86400000L) "2024-01-15" else "2024-01-16"))
    }.toDF("event_id", "symbol", "price", "volume", "event_time", "trade_date")
    val out = Indicators.intradayProfile(df).collect()
      .map(r => r.getAs[Int]("hour") -> r).toMap
    assert(out.keySet === Set(10, 11))
    val h10 = out(10)
    assert(h10.getAs[Long]("n_trades") === 4L && h10.getAs[Long]("volume") === 20L)
    // hour 10 returns: |1010000-1000000|*1e6 div 1000000 = 10000 and
    // |2020000-2000000|*1e6 div 2000000 = 10000 -> mean 10000.
    assert(h10.getAs[Long]("n_rets") === 2L)
    assert(h10.getAs[Long]("mean_abs_ret_e6") === 10000L)
    val h11 = out(11)
    assert(h11.getAs[Long]("n_trades") === 1L && h11.getAs[Long]("n_rets") === 1L)
    assert(h11.getAs[Long]("mean_abs_ret_e6") === 0L)
  }

  test("b23 effective spread: prevailing quote at-or-before, tolerance voids stale matches") {
    // Hand-built silver: every third event_id (0, 3) becomes a quote.
    // t0 = 2024-01-15 10:00:00 UTC.
    val t0 = 1705312800000L
    val rows = Seq(
      // (event_id, price, offset_ms)
      (0L, 100.0, 0L),         // -> quote at t0-500: bid 999500, ask 1001000 (e4)
      (1L, 100.5, 1000L),      // matched by quote 0 (age 1500ms)
      (2L, 101.0, 700000L),    // quote 0 is 700500ms old -> STALE, unquoted
      (3L, 102.0, 720000L),    // -> quote at +719500; matches its own quote (age 500)
      (4L, 101.5, 730000L))    // matched by quote 3 (age 10500ms? no: 730000-719500=10500 -> within 600000)
      .map { case (id, p, off) =>
        (id, "AAPL", p, 10L, new java.sql.Timestamp(t0 + off),
          java.sql.Date.valueOf("2024-01-15"))
      }.toDF("event_id", "symbol", "price", "volume", "event_time", "trade_date")
    val out = Indicators.effectiveSpread(rows, Indicators.syntheticQuotes(rows))
      .collect()
    assert(out.length === 1) // all inside hour 10
    val r = out.head
    assert(r.getAs[Long]("n_trades") === 5L)
    // Unquoted: event 2 (stale). Events 0,1 match quote(0); 3,4 match quote(3).
    assert(r.getAs[Long]("n_quoted") === 4L)
    // quote(0): px 1000000 -> bid = 1000000-500=999500, ask = 1000000+1000=1001000
    //   quoted = 1500; ev0: |2*1000000-(999500+1001000)| = 500
    //   ev1: px 1005000 -> |2010000-2000500| = 9500
    // quote(3): px 1020000 -> bid 1019490, ask 1021020; quoted = 1530
    //   ev3: |2040000-2040510| = 510; ev4: px 1015000 -> |2030000-2040510| = 10510
    assert(r.getAs[Long]("quoted_sum_e4") === (1500L + 1500L + 1530L + 1530L))
    assert(r.getAs[Long]("eff_sum_e4") === (500L + 9500L + 510L + 10510L))
    assert(r.getAs[Long]("mid_dev_sum_e4") === (-500L + 9500L - 510L - 10510L))
    assert(r.getAs[Long]("eff_vs_quoted_e6") ===
      (500L + 9500L + 510L + 10510L) * 1000000L / (1500L + 1500L + 1530L + 1530L))
  }

  test("b24 realized/bipower: hand-built increments, exact integer sums") {
    // Prices in e4 ticks: 100, 103, 101, 106 -> d = _,3,-2,5;
    // prev_d = _,_,3,-2. RV = 9+4+25 = 38; BV = |−2|·3 + 5·|−2| = 16.
    val out = Indicators.realizedBipower(
      feed(Seq(0.0100, 0.0103, 0.0101, 0.0106))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_rets") === 3L)
    assert(r.getAs[Long]("rv_ticks2") === 38L)
    assert(r.getAs[Long]("bv_ticks2") === 16L)
    assert(r.getAs[Long]("bv_vs_rv_e6") === 16L * 1000000L / 38L)
    // Single-trade day: no increments, null sums, null ratio.
    val lone = Indicators.realizedBipower(feed(Seq(1.0))).collect().head
    assert(lone.getAs[Long]("n_rets") === 0L)
    assert(lone.isNullAt(lone.fieldIndex("rv_ticks2")))
    assert(lone.isNullAt(lone.fieldIndex("bv_vs_rv_e6")))
  }

  test("b25 lee-ready: midpoint test first, tick test with zero-tick carry as fallback") {
    // Trades at minute offsets 0..4, e4 px: 1000, 1010, 1010, 1005, 1005.
    // One quote (bid 1000, ask 1008, mid2 2008) prevails for trades
    // 1-2 only (tolerance voids it for 3-4; none before trade 0).
    //  t0: unquoted, no prior tick -> unclassified (0)
    //  t1: 2*1010 = 2020 > 2008 -> buy (midpoint test)
    //  t2: quoted, 2*1010 > 2008 -> buy (zero tick irrelevant)
    //  t3: unquoted -> tick test: last nonzero delta is -5 -> sell
    //  t4: unquoted, delta 0 -> carry -> sell
    val trades = feed(Seq(0.1000, 0.1010, 0.1010, 0.1005, 0.1005))
    val quotes = Seq(("AAPL", java.sql.Date.valueOf("2024-01-15"),
        1705312800000L + 55000L, 1000L, 1008L))
      .toDF("symbol", "trade_date", "q_ms", "bid_e4", "ask_e4")
    val out = Indicators.leeReady(trades, quotes, toleranceMs = 120000L).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_trades") === 5L)
    assert(r.getAs[Long]("n_buy") === 2L)
    assert(r.getAs[Long]("n_sell") === 2L)
    assert(r.getAs[Long]("n_unclassified") === 1L)
    assert(r.getAs[Long]("buy_vol") === 20L)
    assert(r.getAs[Long]("sell_vol") === 20L)
    assert(r.getAs[Long]("net_flow") === 0L)
  }
}
