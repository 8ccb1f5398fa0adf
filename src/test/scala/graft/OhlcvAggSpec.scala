package graft

import org.apache.spark.sql.functions._

import graft.operators.{Medallion, Ohlcv, OhlcvAggregator}
import graft.sources.Tables

/** The typed Aggregator and the untyped Ohlcv.bars must agree
  * bar-for-bar on real data.
  */
class OhlcvAggSpec extends SparkSpecBase {
  import spark.implicits._

  test("typed single-pass Aggregator matches Ohlcv.bars5m on sf0.001") {
    val silver = Medallion.dedup(Medallion.toSilver(
      Tables.trades(spark, Sf), lit("2024-02-01 00:00:00").cast("timestamp")))

    val untyped = Ohlcv.bars5m(silver)
      .select(col("symbol"), unix_millis(col("window_start")).as("ws_ms"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("trade_count"), col("vwap_e6"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(2)).toMap

    val ticks = silver.select(col("symbol"), col("price"), col("volume"),
        unix_micros(col("event_time")).as("eventTimeMicros"),
        col("event_id").as("eventId"))
      .as[OhlcvAggregator.TradeTick]
    val typed = ticks
      .groupByKey(t => (t.symbol, t.eventTimeMicros / 300000000L * 300000L))
      .agg(OhlcvAggregator.agg.toColumn)
      .collect().map { case ((sym, wsMs), bar) =>
        (sym, wsMs) -> Seq[Any](bar.open, bar.high, bar.low, bar.close,
          bar.volume, bar.trade_count, bar.vwap_e6.map(Long.box).orNull)
      }.toMap

    assert(typed.keySet === untyped.keySet)
    typed.foreach { case (k, v) => assert(v === untyped(k), s"bar $k") }
  }
}
