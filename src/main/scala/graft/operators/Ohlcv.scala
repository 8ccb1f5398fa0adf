package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed OHLCV bars + VWAP — the analytical core (A1-A4,
  * calculate_ohlcv, reference transformations.py:161-204; vwap gap
  * filled per keyspace.cql:88 which declares the column the reference
  * never computes).
  *
  * Semantic fix over the reference (SURVEY.md §7.5.1): PySpark
  * `first`/`last` in a groupBy are ordering-dependent, i.e. the
  * reference's open/close are non-deterministic. We pin open/close to
  * event-time order with `min_by`/`max_by` (tie-broken by event_id via
  * a composite ordering struct), which is a single hash-aggregation —
  * one shuffle on (symbol, window), partial aggregation map-side, no
  * sort. That plan scales to any cluster size: state per reducer is
  * one small buffer per (symbol, window) key.
  *
  * Exact arithmetic: price is cast to DECIMAL(18,4) before the sums so
  * volume-weighted sums are order-independent (double addition is not
  * associative; a 1000-executor plan must not produce different vwap
  * than a laptop).
  */
object Ohlcv {

  /** Tumbling-window OHLCV. `duration` e.g. "5 minutes", "1 hour".
    * Pass `slide` for the sliding-window variant (A3,
    * docs/research/SPARK_STREAMING.md:27-49).
    */
  def bars(trades: DataFrame, duration: String, slide: Option[String] = None): DataFrame = {
    val w = slide match {
      case Some(s) => window(col("event_time"), duration, s)
      case None    => window(col("event_time"), duration)
    }
    // Two-level ordering key: event-time first, event_id tie-break.
    // Built-in min_by(price, struct(ts, id)) would be semantically
    // right but forces SortAggregate (struct agg buffer); the custom
    // MinByOrd2/MaxByOrd2 DeclarativeAggregate keeps primitive buffer
    // slots so the plan stays a codegen'd HashAggregate with map-side
    // partial aggregation (graft.functions.OrderedExtremum).
    val ordTs = unix_micros(col("event_time"))
    val ordId = col("event_id")
    val priceDec = col("price").cast("decimal(18,4)")
    // price*volume in integer ticks of 1e-4 — summing longs is exact
    // and associative, so any aggregation order gives one answer.
    val pvTicks = (priceDec * col("volume") * 10000).cast("long")
    trades
      .groupBy(col("symbol"), w.as("w"))
      .agg(
        graft.functions.OrderedExtremum.minByOrd2(col("price"), ordTs, ordId).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        graft.functions.OrderedExtremum.maxByOrd2(col("price"), ordTs, ordId).as("close"),
        sum(col("volume")).as("volume"),
        count(lit(1)).as("trade_count"),
        sum(pvTicks).as("pv_ticks"))
      .transform(finishBars)
  }

  /** Shared bar finalization: flatten the window struct and derive
    * VWAP from the exact integer pv sum. `pv_ticks` stays in the
    * output so bars can be re-aggregated losslessly ([[rollup]]) —
    * vwap_e6 alone cannot be, the floor division is not invertible.
    */
  private[operators] def finishBars(aggregated: DataFrame): DataFrame =
    aggregated.select(
      col("symbol"),
      col("w.start").as("window_start"),
      col("w.end").as("window_end"),
      col("open"), col("high"), col("low"), col("close"),
      col("volume"), col("trade_count"),
      // A4 — VWAP in integer micro-units (floor(1e6 * Σpv / Σv)):
      // float rounding at the x.xxxxxx5 boundary differs between
      // engines, so the canonical form stays in integer arithmetic.
      when(col("volume") === 0, lit(null))
        .otherwise(expr("(pv_ticks * 100) div volume"))
        .as("vwap_e6"),
      // Human-facing double VWAP (not oracle-compared).
      when(col("volume") === 0, lit(null))
        .otherwise(col("pv_ticks").cast("double") / 10000.0 / col("volume").cast("double"))
        .as("vwap"),
      col("pv_ticks"))

  def bars5m(trades: DataFrame): DataFrame = bars(trades, "5 minutes")
  def bars1h(trades: DataFrame): DataFrame = bars(trades, "1 hour")

  /** Sliding 5-minute windows advancing every minute (A3). */
  def barsSliding(trades: DataFrame): DataFrame =
    bars(trades, "5 minutes", Some("1 minute"))

  /** A7 — hierarchical re-aggregation: coarser bars from finer ones
    * (1h from 5m), without touching raw trades. At 100 TB this is the
    * grain cascade that matters: the 5m layer is O(symbols × windows),
    * orders of magnitude smaller than the trade stream, so every
    * coarser grain costs a shuffle over BARS, not trades — and the
    * answer is exactly what direct aggregation over trades produces
    * (OhlcvSpec pins rollup(bars5m) === bars1h bar-for-bar), because
    * open/close re-derive from the finest window's own open/close
    * ordered by window start and VWAP re-sums the exact integer
    * pv_ticks rather than the floored vwap_e6.
    *
    * Requires tumbling input bars whose duration divides `duration`
    * (window starts are epoch-aligned, so finer tumbling windows nest
    * exactly). The precondition is enforced, not just documented —
    * sliding bars or a non-dividing duration (90m from 1h) would
    * otherwise double-count volume and mix overlapping windows with
    * no error, same schema, type-checks fine. Two layers: a per-row
    * check (span > 0, divides the target, window_start aligned to its
    * own span — two integer ops inside codegen; `assert_true` keeps
    * it alive through optimization) catches sliding/non-dividing
    * input, and a per-output-group check catches what the per-row one
    * deliberately lets through: min==max span catches MIXED grains (a
    * glob over `gold*` directories unioning 5m and 1h bars passes
    * every per-row test yet double-counts), and a null-span count
    * catches NULL-BOUNDED rows — which the per-row assert PASSES so
    * that streaming heartbeat rows (null window_end, stripped by a
    * filter that Catalyst may merge with this one in either conjunct
    * order) can never crash the cascade on an ordering detail (r16
    * ADVICE; the group check costs four primitive agg slots). Two
    * sources of the SAME grain remain indistinguishable from
    * duplicate data, which no schema check can see.
    */
  def rollup(bars: DataFrame, duration: String): DataFrame = {
    // to_timestamp(0) is the epoch instant in any session timezone;
    // a timestamp literal would shift with the session zone.
    val targetUs = expr(s"unix_micros(to_timestamp(0) + INTERVAL $duration)")
    val barUs = unix_micros(col("window_end")) - unix_micros(col("window_start"))
    // NULL-bound rows PASS the per-row assert (r16 ADVICE): in the
    // streaming cascade a heartbeat row (null window_end, stamped
    // window_start) sits under a strip filter that removes it from
    // the stream — but CombineFilters merges that strip with this
    // assert filter into one And, and whether the heartbeat reaches
    // the throwing assert then depends on Catalyst's conjunct
    // ORDERING, an implementation detail a Spark upgrade may change.
    // Tolerating null bounds here makes the composition order-proof:
    // the strip conjunct still removes the row either way (And is
    // logically commutative; only the side effect was order-
    // sensitive). Malformed BATCH input with null bounds is still
    // rejected — by the group-level null-span count below, which
    // heartbeat rows can never reach (the strip runs before the
    // aggregate in every ordering).
    val nested = coalesce(barUs > 0 && pmod(targetUs, barUs) === 0 &&
      pmod(unix_micros(col("window_start")), barUs) === 0,
      col("window_end").isNull || col("window_start").isNull)
    val ordTs = unix_micros(col("window_start"))
    bars
      .filter(assert_true(nested,
        lit(s"rollup: input must be epoch-aligned tumbling bars whose " +
          s"duration divides $duration")).isNull)
      .withColumn("__bar_us", barUs)
      .groupBy(col("symbol"), window(col("window_start"), duration).as("w"))
      .agg(
        graft.functions.OrderedExtremum.minByOrd2(col("open"), ordTs, lit(0L)).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        graft.functions.OrderedExtremum.maxByOrd2(col("close"), ordTs, lit(0L)).as("close"),
        sum(col("volume")).as("volume"),
        sum(col("trade_count")).as("trade_count"),
        sum(col("pv_ticks")).as("pv_ticks"),
        min(col("__bar_us")).as("__span_min"),
        max(col("__bar_us")).as("__span_max"),
        count(lit(1)).as("__n"),
        count(col("__bar_us")).as("__n_span"))
      // coalesce: an all-null-span group makes min===max NULL, and
      // assert_true only throws on FALSE — the count conjunct alone
      // already fails such a group, but keep the guard explicit.
      .filter(assert_true(coalesce(
        col("__span_min") === col("__span_max"), lit(false)) &&
        col("__n") === col("__n_span"),
        lit("rollup: mixed or null-bounded input bars in one output window")).isNull)
      .transform(finishBars)
  }
}
