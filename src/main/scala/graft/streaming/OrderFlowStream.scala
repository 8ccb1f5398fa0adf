package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.sql.{streaming => ss}

/** Streaming form of b16's tick-rule classification: per-symbol
  * (last price, last non-zero tick sign, high-water mark) as one
  * `transformWithState` ValueState record — three longs per symbol
  * forever — emitting each trade's buy/sell verdict as it arrives. A
  * running per-(symbol, day) aggregate over the output stream is the
  * order-flow imbalance, incrementally.
  *
  * Ordering contract (the FunnelStream/TransitionStream discipline):
  * within a micro-batch a symbol's trades fold in (ts, eventId) order;
  * a trade whose (ts, eventId) is not lexicographically greater than
  * the (hwm, hwmId) high-water mark is dropped, so replays are
  * idempotent while distinct same-timestamp trades both survive. Under per-symbol event-time-
  * ordered delivery the streamed verdicts equal the batch operator's
  * exactly (OrderFlowStreamSpec pins this for arbitrary slicings) —
  * with one deliberate difference: batch state resets at day
  * boundaries (the per-day window frame), while the stream carries
  * tick state across days like a live feed would; the spec therefore
  * pins equivalence on single-day data and documents the boundary.
  */
object OrderFlowStream {

  /** One trade: px in integer e4 ticks (the batch ticksE4 grain). */
  case class Tick(symbol: String, px: Long, volume: Long, ts: Long, eventId: Long)

  /** sign: +1 / -1 / 0 = unclassified (no non-zero tick seen yet). */
  case class Verdict(symbol: String, ts: Long, eventId: Long, sign: Int, volume: Long)

  /** lastPx < 0 means no trade seen yet; (hwm, hwmId) = the largest
    * (ts, eventId) absorbed so far, compared lexicographically. */
  case class TickState(lastPx: Long, lastSign: Int, hwm: Long, hwmId: Long)

  private[graft] def step(st: TickState, t: Tick): (TickState, Option[Verdict]) =
    if (st.lastPx >= 0 &&
        (t.ts < st.hwm || (t.ts == st.hwm && t.eventId <= st.hwmId))) (st, None)
    else {
      val sign =
        if (st.lastPx < 0) 0
        else if (t.px > st.lastPx) 1
        else if (t.px < st.lastPx) -1
        else st.lastSign
      (TickState(t.px, sign, t.ts, t.eventId),
        Some(Verdict(t.symbol, t.ts, t.eventId, sign, t.volume)))
    }

  class OrderFlowProcessor
      extends StatefulProcessor[String, Tick, Verdict] {

    @transient private var state: ValueState[TickState] = _

    override def init(outputMode: ss.OutputMode, timeMode: ss.TimeMode): Unit =
      state = getHandle.getValueState[TickState]("tick_state",
        Encoders.product[TickState], TTLConfig.NONE)

    override def handleInputRows(symbol: String, rows: Iterator[Tick],
                                 timerValues: TimerValues): Iterator[Verdict] = {
      var st = Option(state.get()).getOrElse(TickState(-1L, 0, Long.MinValue, Long.MinValue))
      val out = Seq.newBuilder[Verdict]
      rows.toSeq.sortBy(t => (t.ts, t.eventId)).foreach { t =>
        val (next, v) = step(st, t)
        st = next
        v.foreach(out += _)
      }
      state.update(st)
      out.result().iterator
    }
  }

  def verdicts(spark: SparkSession, ticks: Dataset[Tick]): Dataset[Verdict] = {
    import spark.implicits._
    verdictsGrouped(spark, ticks.groupByKey(_.symbol))
  }

  /** Verdicts over a caller-grouped tick stream. The grouping key
    * chooses the classification RESET scope: `_.symbol` is the live
    * form (state carries across days like a real feed);
    * "symbol|trade_date" resets at day boundaries exactly like the
    * batch operator's per-(symbol, trade_date) window frame — the key
    * sr4's replay uses to make the chained stream hash-match batch
    * b21 on multi-day data. The processor is unchanged either way:
    * the emitted Verdict carries the tick's own symbol, not the key.
    */
  def verdictsGrouped(spark: SparkSession,
                      grouped: org.apache.spark.sql.KeyValueGroupedDataset[String, Tick]): Dataset[Verdict] = {
    import spark.implicits._
    grouped.transformWithState(new OrderFlowProcessor(),
      TimeMode.None(), OutputMode.Append, implicitly[Encoder[Verdict]])
  }
}
