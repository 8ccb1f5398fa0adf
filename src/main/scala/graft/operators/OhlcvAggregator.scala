package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed single-pass OHLCV+VWAP `Aggregator[IN, BUF, OUT]` —
  * the SURVEY.md §7.4 "preferred" form: one buffer, one shuffle, all
  * seven aggregates in a single pass, usable from
  * `KeyValueGroupedDataset.agg` in both batch and streaming.
  *
  * The untyped path (`Ohlcv.bars`) stays the default for SQL-shaped
  * pipelines (it keeps whole-stage codegen); this typed form is for
  * `Dataset[TradeTick]` pipelines that already pay the typed-encoder
  * boundary and want the aggregation expressed as plain Scala.
  * OhlcvAggSpec asserts both forms agree bar-for-bar.
  *
  * Determinism mirrors Ohlcv.bars: open/close ordered by
  * (event-time micros, event_id); vwap in exact integer micro-units.
  */
object OhlcvAggregator {

  case class TradeTick(symbol: String, price: Double, volume: Long,
                       eventTimeMicros: Long, eventId: Long)

  case class Buf(
      var openOrd: Long, var openId: Long, var open: Double,
      var closeOrd: Long, var closeId: Long, var close: Double,
      var high: Double, var low: Double,
      var volume: Long, var count: Long, var pvTicks: Long)

  case class Bar(open: Double, high: Double, low: Double, close: Double,
                 volume: Long, trade_count: Long, vwap_e6: Option[Long])

  val agg: Aggregator[TradeTick, Buf, Bar] = new Aggregator[TradeTick, Buf, Bar] {

    override def zero: Buf = Buf(
      Long.MaxValue, Long.MaxValue, 0.0,
      Long.MinValue, Long.MinValue, 0.0,
      Double.NegativeInfinity, Double.PositiveInfinity, 0L, 0L, 0L)

    private def pvTicksOf(t: TradeTick): Long =
      (BigDecimal(t.price).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        * 10000).toLongExact * t.volume

    override def reduce(b: Buf, t: TradeTick): Buf = {
      if (t.eventTimeMicros < b.openOrd ||
          (t.eventTimeMicros == b.openOrd && t.eventId < b.openId)) {
        b.openOrd = t.eventTimeMicros; b.openId = t.eventId; b.open = t.price
      }
      if (t.eventTimeMicros > b.closeOrd ||
          (t.eventTimeMicros == b.closeOrd && t.eventId > b.closeId)) {
        b.closeOrd = t.eventTimeMicros; b.closeId = t.eventId; b.close = t.price
      }
      if (t.price > b.high) b.high = t.price
      if (t.price < b.low) b.low = t.price
      b.volume += t.volume; b.count += 1; b.pvTicks += pvTicksOf(t)
      b
    }

    override def merge(a: Buf, c: Buf): Buf = {
      if (c.openOrd < a.openOrd || (c.openOrd == a.openOrd && c.openId < a.openId)) {
        a.openOrd = c.openOrd; a.openId = c.openId; a.open = c.open
      }
      if (c.closeOrd > a.closeOrd || (c.closeOrd == a.closeOrd && c.closeId > a.closeId)) {
        a.closeOrd = c.closeOrd; a.closeId = c.closeId; a.close = c.close
      }
      if (c.high > a.high) a.high = c.high
      if (c.low < a.low) a.low = c.low
      a.volume += c.volume; a.count += c.count; a.pvTicks += c.pvTicks
      a
    }

    override def finish(b: Buf): Bar = Bar(
      b.open, b.high, b.low, b.close, b.volume, b.count,
      if (b.volume == 0) None else Some(b.pvTicks * 100 / b.volume))

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Bar] = Encoders.product[Bar]
  }
}
