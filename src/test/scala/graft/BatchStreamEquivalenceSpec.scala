package graft

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Indicators, Medallion, Ohlcv}
import graft.sources.Tables
import graft.streaming.{BarIndicatorStream, TradeStreams}
import graft.streaming.BarIndicatorStream.DailyBar

/** The engine's central design property (SURVEY.md §7.1): the same
  * Dataset->Dataset operators run in batch and streaming. Two halves:
  *
  *  1. the production OHLCV graph — replay the real sf0.001 events
  *     through file source -> parse -> silver -> gold and assert the
  *     emitted bars are row-identical to the batch pipeline;
  *  2. the streaming bar indicators (OBV, ATR-14, stochastic %K/%D)
  *     against their batch window-function forms — BIT-exact on the
  *     doubles (doubleToLongBits), not approximate: both sides run
  *     the same IEEE operations in the same order on the same exact
  *     e4-tick integers, under arbitrary micro-batch slicings and
  *     replayed deliveries.
  */
class BatchStreamEquivalenceSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming gold bars equal batch gold bars on real data") {
    val dir = Files.createTempDirectory("graft_equiv").toString

    // Kafka-shaped JSON replay input from the real events table.
    Tables.eventsNorm(spark, Sf).select(
      to_json(struct(
        col("event_type").as("symbol"),
        col("value").as("price"),
        get_json_object(col("props"), "$.k").cast("long").as("volume"),
        expr("ts_us div 1000").as("timestamp"),
        array().cast("array<string>").as("conditions"),
        expr("ts_us div 1000").as("ingestion_time"))).as("value"))
      .write.parquet(s"$dir/in")

    // Streaming path: the production graph.
    val raw = spark.readStream.schema("value STRING").parquet(s"$dir/in")
    val trades = TradeStreams.parseTrades(raw).withColumn("event_id", col("timestamp"))
    val silver = TradeStreams.dedupWithinWatermark(
      TradeStreams.withWatermark(TradeStreams.toSilverStreaming(trades)))
    val q = Ohlcv.bars5m(silver)
      .writeStream.format("memory").queryName("equiv_bars").outputMode("update").start()
    q.processAllAvailable(); q.stop()

    def key(r: Row) = (
      r.getAs[String]("symbol"), r.getAs[java.sql.Timestamp]("window_start").getTime,
      r.getAs[Double]("open"), r.getAs[Double]("high"), r.getAs[Double]("low"),
      r.getAs[Double]("close"), r.getAs[Long]("volume"),
      r.getAs[Long]("trade_count"), r.getAs[Long]("vwap_e6"))
    val streamedBars = spark.table("equiv_bars").collect().map(key).toSet

    // Batch path over the same events. The streaming side collapsed
    // ms-truncated timestamps, so feed batch the same ms-granularity
    // trades (the streaming wire format is epoch-ms by contract).
    val batchTrades = Tables.eventsNorm(spark, Sf).select(
      col("event_type").as("symbol"),
      col("value").as("price"),
      get_json_object(col("props"), "$.k").cast("long").as("volume"),
      expr("timestamp_millis(ts_us div 1000)").as("event_time"))
      .withColumn("event_id", unix_millis(col("event_time")))
    val batch = Ohlcv.bars5m(Medallion.dedupAgg(
        Medallion.clean(batchTrades)
          .filter(col("volume") > 0 && col("price") > 0),
        payloadCols = Seq("price", "volume")))
      .collect().map(key).toSet

    assert(streamedBars === batch,
      s"streaming-only: ${(streamedBars -- batch).take(3)}; batch-only: ${(batch -- streamedBars).take(3)}")
    assert(streamedBars.nonEmpty)
  }

  private def bits(x: java.lang.Double): Option[Long] =
    Option(x).map(d => java.lang.Double.doubleToLongBits(d))

  private lazy val silver = SparkEntry.silverDf(spark, Sf)
  private lazy val bars: Seq[DailyBar] =
    Indicators.dailyBars(silver).as[DailyBar].collect().toSeq
      .sortBy(b => (b.trade_date.toLocalDate.toEpochDay, b.symbol))

  /** Stream `slices` of closed bars through BarIndicatorStream and
    * return every update keyed by (symbol, date).
    */
  private def streamed(slices: Seq[Seq[DailyBar]])
      : Map[(String, Long), BarIndicatorStream.BarIndicatorUpdate] =
    withRocksDbState {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[DailyBar]
      val name = s"bar_ind_out_${slices.size}"
      val q = BarIndicatorStream.updates(spark, mem.toDS(), n = 14)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
      q.stop()
      val out = spark.table(name).as[BarIndicatorStream.BarIndicatorUpdate]
        .collect()
      spark.catalog.dropTempView(name)
      out.map(u => (u.symbol, u.trade_date.toLocalDate.toEpochDay) -> u).toMap
    }

  private def key(r: Row) =
    (r.getAs[String]("symbol"), r.getAs[Date]("trade_date").toLocalDate.toEpochDay)

  private def assertMatchesBatch(
      got: Map[(String, Long), BarIndicatorStream.BarIndicatorUpdate]): Unit = {
    val obvB = Indicators.obv(silver).collect()
    val atrB = Indicators.atr(silver, n = 14).collect()
    val stochB = Indicators.stochastic(silver, n = 14).collect()
    assert(got.size === obvB.length)
    obvB.foreach { r =>
      val u = got(key(r))
      assert(u.close_px === r.getAs[Long]("close_px") &&
        u.day_volume === r.getAs[Long]("day_volume") &&
        u.signed_vol === r.getAs[Long]("signed_vol") &&
        u.obv === r.getAs[Long]("obv"), s"obv mismatch at ${key(r)}")
    }
    atrB.foreach { r =>
      val u = got(key(r))
      assert(u.tr === r.getAs[Long]("tr") &&
        u.tr_sum === r.getAs[Long]("tr_sum") &&
        u.n_tr === r.getAs[Long]("n_tr"), s"atr ints mismatch at ${key(r)}")
      assert(Some(java.lang.Double.doubleToLongBits(u.atr)) ===
        bits(r.getAs[java.lang.Double]("atr")), s"atr bits mismatch at ${key(r)}")
    }
    stochB.foreach { r =>
      val u = got(key(r))
      assert(u.k_num === r.getAs[Long]("k_num") &&
        u.k_den === r.getAs[Long]("k_den"), s"stoch ints mismatch at ${key(r)}")
      assert(u.pct_k.map(java.lang.Double.doubleToLongBits) ===
        bits(r.getAs[java.lang.Double]("pct_k")), s"pct_k mismatch at ${key(r)}")
      assert(u.pct_d.map(java.lang.Double.doubleToLongBits) ===
        bits(r.getAs[java.lang.Double]("pct_d")), s"pct_d mismatch at ${key(r)}")
    }
  }

  test("streaming OBV/ATR/stochastic equal the batch forms bar-for-bar (single batch)") {
    assertMatchesBatch(streamed(Seq(bars)))
  }

  test("streaming OBV/ATR/stochastic equal the batch forms under uneven micro-batch slicing") {
    // Date-ordered uneven slices: 1 bar, then ~1/3, then the rest —
    // state crosses micro-batch boundaries mid-warm-up for every
    // indicator (ATR/stochastic windows span the cuts).
    val cuts = Seq(bars.take(1), bars.slice(1, bars.size / 3), bars.drop(bars.size / 3))
    assertMatchesBatch(streamed(cuts))
  }

  test("re-delivered closed bars are dropped, not folded twice") {
    // Replay the first half again inside a later micro-batch: every
    // replayed bar is at-or-before the carried state's date and must
    // be ignored (at-least-once delivery safety).
    val half = bars.size / 2
    val withReplay = Seq(bars.take(half), bars.take(half) ++ bars.drop(half))
    assertMatchesBatch(streamed(withReplay))
  }
}
