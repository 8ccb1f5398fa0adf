package graft

import org.apache.spark.sql.functions._

import graft.operators.Ohlcv

class OhlcvSpec extends SparkSpecBase {
  import spark.implicits._

  private def tradesDf(rows: Seq[(Long, String, Double, Long, String)]) =
    rows.toDF("event_id", "symbol", "price", "volume", "ts")
      .withColumn("event_time", col("ts").cast("timestamp")).drop("ts")

  test("open/close follow event-time order, not input order") {
    // Deliberately out of order in the input.
    val df = tradesDf(Seq(
      (3L, "A", 30.0, 10L, "2024-01-01 00:02:00"),
      (1L, "A", 10.0, 10L, "2024-01-01 00:00:30"),
      (2L, "A", 20.0, 10L, "2024-01-01 00:01:00")))
    val bar = Ohlcv.bars5m(df).collect().head
    assert(bar.getAs[Double]("open") === 10.0)
    assert(bar.getAs[Double]("close") === 30.0)
    assert(bar.getAs[Double]("high") === 30.0)
    assert(bar.getAs[Double]("low") === 10.0)
    assert(bar.getAs[Long]("volume") === 30L)
    assert(bar.getAs[Long]("trade_count") === 3L)
  }

  test("equal timestamps tie-break on event_id") {
    val df = tradesDf(Seq(
      (2L, "A", 99.0, 1L, "2024-01-01 00:00:00"),
      (1L, "A", 11.0, 1L, "2024-01-01 00:00:00")))
    val bar = Ohlcv.bars5m(df).collect().head
    assert(bar.getAs[Double]("open") === 11.0)
    assert(bar.getAs[Double]("close") === 99.0)
  }

  test("vwap_e6 is the volume-weighted mean in micro-units") {
    val df = tradesDf(Seq(
      (1L, "A", 10.0, 1L, "2024-01-01 00:00:00"),
      (2L, "A", 20.0, 3L, "2024-01-01 00:01:00")))
    val bar = Ohlcv.bars5m(df).collect().head
    // (10*1 + 20*3) / 4 = 17.5
    assert(bar.getAs[Long]("vwap_e6") === 17500000L)
    assert(math.abs(bar.getAs[Double]("vwap") - 17.5) < 1e-9)
  }

  test("windows are aligned tumbling buckets; 1h groups multiple 5m bars") {
    val df = tradesDf(Seq(
      (1L, "A", 1.0, 1L, "2024-01-01 00:01:00"),
      (2L, "A", 2.0, 1L, "2024-01-01 00:59:00"),
      (3L, "A", 3.0, 1L, "2024-01-01 01:01:00")))
    assert(Ohlcv.bars5m(df).count() === 3)
    val hours = Ohlcv.bars1h(df).orderBy("window_start").collect()
    assert(hours.length === 2)
    assert(hours.head.getAs[Double]("open") === 1.0)
    assert(hours.head.getAs[Double]("close") === 2.0)
  }

  test("sliding windows emit ~5 windows per event") {
    val df = tradesDf(Seq((1L, "A", 1.0, 1L, "2024-01-01 00:02:30")))
    assert(Ohlcv.barsSliding(df).count() === 5)
  }

  test("rollup(bars5m, 1 hour) equals bars1h bar-for-bar (seeded random trades)") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      val sec = rng.nextInt(4 * 3600)
      (i.toLong, if (i % 3 == 0) "A" else "B",
        (1 + rng.nextInt(100000)) / 100.0, 1L + rng.nextInt(1000),
        f"2024-01-01 ${sec / 3600}%02d:${sec / 60 % 60}%02d:${sec % 60}%02d")
    }
    val df = tradesDf(rows)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("symbol"), r.getAs[java.sql.Timestamp]("window_start").getTime)
    def vals(r: org.apache.spark.sql.Row) = Seq[Any](
      r.getAs[Double]("open"), r.getAs[Double]("high"), r.getAs[Double]("low"),
      r.getAs[Double]("close"), r.getAs[Long]("volume"), r.getAs[Long]("trade_count"),
      r.getAs[Long]("vwap_e6"), r.getAs[Long]("pv_ticks"))
    val direct = Ohlcv.bars1h(df).collect().map(r => key(r) -> vals(r)).toMap
    val rolled = Ohlcv.rollup(Ohlcv.bars5m(df), "1 hour")
      .collect().map(r => key(r) -> vals(r)).toMap
    assert(rolled.keySet === direct.keySet)
    rolled.foreach { case (k, v) => assert(v === direct(k), s"bar $k") }
    // Three-level composition: rollup is associative through the
    // exact pv carry — 5m→1h→1d equals direct 1d aggregation.
    val daily = Ohlcv.bars(df, "1 day").collect().map(r => key(r) -> vals(r)).toMap
    val cascaded = Ohlcv.rollup(Ohlcv.rollup(Ohlcv.bars5m(df), "1 hour"), "1 day")
      .collect().map(r => key(r) -> vals(r)).toMap
    assert(cascaded.keySet === daily.keySet)
    cascaded.foreach { case (k, v) => assert(v === daily(k), s"daily bar $k") }
  }

  test("rollup rejects non-nesting input: sliding bars and non-dividing durations") {
    val df = tradesDf((0 until 20).map(i =>
      (i.toLong, "A", 10.0 + i, 1L, f"2024-01-01 00:${i * 3}%02d:00")))
    // Sliding 5m/1m bars: window_start not aligned to the bar span.
    intercept[Exception] {
      Ohlcv.rollup(Ohlcv.barsSliding(df), "1 hour").collect()
    }
    // 90 minutes is not a multiple of 1h bars.
    intercept[Exception] {
      Ohlcv.rollup(Ohlcv.bars1h(df), "90 minutes").collect()
    }
    // Mixed grains: each row passes the per-row test (5m and 1h both
    // nest in 1h) but one output window holds both spans.
    intercept[Exception] {
      Ohlcv.rollup(Ohlcv.bars5m(df).unionByName(Ohlcv.bars1h(df)), "1 hour").collect()
    }
    // The nesting case still works.
    assert(Ohlcv.rollup(Ohlcv.bars5m(df), "1 hour").count() === 1)
  }

  test("rollup rejects null-bounded input at the GROUP level (heartbeat tolerance, r16 ADVICE)") {
    // The per-row assert PASSES a null-window_end row — so a streaming
    // heartbeat (stripped by a filter Catalyst may merge with the
    // assert in either conjunct order) can never crash the cascade —
    // but a null-bounded row that actually REACHES the aggregate (a
    // malformed batch input with nothing stripping it) still errors,
    // via the group-level null-span count.
    import org.apache.spark.sql.functions.{col, lit}
    val df = tradesDf((0 until 12).map(i =>
      (i.toLong, "A", 10.0 + i, 1L, f"2024-01-01 00:${i * 5}%02d:00")))
    val bars = Ohlcv.bars5m(df)
    val withNullEnd = bars.unionByName(
      bars.limit(1).withColumn("window_end",
        lit(null).cast("timestamp")))
    val e = intercept[Exception] {
      Ohlcv.rollup(withNullEnd, "1 hour").collect()
    }
    assert(e.getMessage.contains("null-bounded") ||
      Option(e.getCause).exists(_.getMessage.contains("null-bounded")))
    // And the heartbeat shape composes: a strip filter above the
    // rollup (the cascade's composition) removes the null-bounded row
    // regardless of conjunct order, and the result equals the clean
    // rollup.
    val stripped = Ohlcv.rollup(
      withNullEnd.filter(col("window_end").isNotNull), "1 hour")
    assert(stripped.collect().toSet ===
      Ohlcv.rollup(bars, "1 hour").collect().toSet)
  }

  test("property: OHLC invariants hold on random trade sets (seeded)") {
    val rng = new scala.util.Random(42)
    (1 to 10).foreach { _ =>
      val n = 1 + rng.nextInt(60)
      val rows = (0 until n).map { i =>
        val sec = rng.nextInt(3600)
        (i.toLong, "X", (1 + rng.nextInt(100000)) / 100.0, 1L + rng.nextInt(1000),
          f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")
      }
      val bars = Ohlcv.bars1h(tradesDf(rows)).collect()
      bars.foreach { b =>
        val (o, h, l, c) = (b.getAs[Double]("open"), b.getAs[Double]("high"),
          b.getAs[Double]("low"), b.getAs[Double]("close"))
        assert(l <= math.min(o, c) && math.max(o, c) <= h)
        assert(b.getAs[Long]("volume") > 0)
        val vwap = b.getAs[Double]("vwap")
        assert(l - 1e-9 <= vwap && vwap <= h + 1e-9)
      }
      assert(bars.map(_.getAs[Long]("volume")).sum === rows.map(_._4).sum)
    }
  }
}
