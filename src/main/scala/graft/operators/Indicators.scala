package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Technical indicators over the silver trade feed — the analytics a
  * user of the reference pipeline computes downstream of its OHLCV
  * store (the reference stops at bars; SMA/Bollinger/RSI/return
  * scans are the canonical next queries over them).
  *
  * All rolling state is per-symbol, time-ordered — expressed as
  * `Window.partitionBy(symbol).orderBy(event_time)` row frames. Scale
  * posture: the shuffle key is the symbol, so parallelism = symbol
  * count (thousands in a real market feed — fine at 100 TB); there is
  * deliberately NO global (partition-less) window anywhere. A single
  * hot symbol serializes its own scan only, which is inherent to any
  * sequential indicator (the alternative — day-chunked windows with
  * boundary overlap replay — only pays off when one symbol dominates
  * an executor's memory, and AQE skew hints cover that first).
  *
  * Exactness: every windowed aggregate is an integer sum of e4 price
  * ticks (decimal(18,4) * 10000), so any aggregation order gives one
  * answer; the float columns (bands, returns) are derived from those
  * exact integers with single IEEE operations (+,-,*,/ and sqrt are
  * correctly rounded per IEEE-754, hence bit-identical across engines
  * when the expression tree matches — mirrored literally in the
  * DuckDB oracles).
  */
object Indicators {

  /** Price in integer e4 ticks: silver prices are ROUND(price, 4), so
    * the decimal cast is exact and the tick count is a faithful
    * integer representation.
    */
  private[graft] def ticksE4(price: Column): Column =
    (price.cast("decimal(18,4)") * 10000).cast("long")

  /** Second-moment window sum Σx² computed in decimal so the
    * intermediate never overflows Long: px² alone exceeds 2⁶³ for
    * prices above ~$96M-e4, and n·Σx²−(Σx)² exceeds it above ~$15k —
    * far below real crypto prices. decimal(38,0) holds 20·(1e18)²
    * comfortably; only the final variance NUMERATOR (a difference of
    * near-equal moments, ~n²·var(x)) is cast back to long, which under
    * ANSI fails loudly iff the within-window tick variance itself
    * tops 2⁶³ — σ(price) > ~$340k inside one 20-trade window.
    */
  private def sumSqDec(px: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(px.cast("decimal(19,0)") * px).over(w)

  /** Exact variance numerator cnt·Σx² − (Σx)² in decimal. */
  private def varNumDec(cnt: Column, s1: Column, s2: Column): Column =
    cnt * s2 - s1.cast("decimal(19,0)") * s1

  private def bySymbolTime = Window.partitionBy(col("symbol")).orderBy(col("event_time"))

  /** Rolling SMA + Bollinger bands over the last `n` trades.
    *
    * Emits both the exact integer form (`sma_e6`, `var_num` — the
    * variance numerator cnt*Σx² − (Σx)², exact in ticks²) and the
    * usual float bands (sma ± 2σ) computed from them.
    */
  def smaBollinger(silver: DataFrame, n: Int = 20): DataFrame = {
    val w = bySymbolTime.rowsBetween(-(n - 1), Window.currentRow)
    silver
      .withColumn("px", ticksE4(col("price")))
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("s1", sum(col("px")).over(w))
      .withColumn("s2", sumSqDec(col("px"), w))
      .select(
        col("symbol"),
        unix_millis(col("event_time")).as("ts_ms"),
        col("price"),
        col("cnt"),
        // Exact integer SMA in e6 units: ticks are e4, *100 -> e6.
        // Both operands nonnegative, so truncating and flooring
        // division agree (Spark div vs DuckDB // differ on negatives).
        expr("(s1 * 100) div cnt").as("sma_e6"),
        varNumDec(col("cnt"), col("s1"), col("s2")).cast("long").as("var_num"),
        smaD(col("s1"), col("cnt")).as("sma"),
        (smaD(col("s1"), col("cnt")) + lit(2.0) * sigmaD(col("cnt"), col("s1"), col("s2")))
          .as("bb_upper"),
        (smaD(col("s1"), col("cnt")) - lit(2.0) * sigmaD(col("cnt"), col("s1"), col("s2")))
          .as("bb_lower"))
  }

  /** SMA as a double: one division of exactly-represented integers. */
  private def smaD(s1: Column, cnt: Column): Column =
    s1.cast("double") / (cnt * 10000).cast("double")

  /** Population σ in price units from the exact integer sums: one
    * division + one sqrt, both correctly rounded. The decimal→double
    * cast of the exact numerator is also correctly rounded (as is
    * DuckDB's HUGEINT→DOUBLE), so the oracle stays bit-identical.
    */
  private def sigmaD(cnt: Column, s1: Column, s2: Column): Column =
    sqrt(varNumDec(cnt, s1, s2).cast("double") /
      (cnt * cnt * lit(100000000L)).cast("double"))

  /** Per-trade simple returns + the day's top-k movers by |return|.
    *
    * The return is one IEEE division of exact tick integers; ranking
    * is deterministic under ties (|ret|, then symbol, then event_id).
    */
  def topMovers(silver: DataFrame, k: Int = 5): DataFrame = {
    val prev = lag(col("px"), 1).over(bySymbolTime)
    val byDay = Window.partitionBy(col("trade_date"))
      .orderBy(abs(col("ret")).desc, col("symbol"), col("event_id"))
    silver
      .withColumn("px", ticksE4(col("price")))
      .withColumn("prev_px", prev)
      .filter(col("prev_px").isNotNull)
      .withColumn("ret",
        (col("px") - col("prev_px")).cast("double") / col("prev_px").cast("double"))
      .withColumn("rnk", row_number().over(byDay))
      .filter(col("rnk") <= k)
      .select(col("trade_date"), col("rnk"), col("symbol"), col("event_id"),
        col("price"), col("ret"))
  }

  /** Wilder-style RSI over the last `n` price changes (simple average
    * form), kept entirely in integer arithmetic:
    * rsi_e4 = 1e6 * Σgain / (Σgain + Σloss) — i.e. RSI (0..100)
    * scaled by 1e4. Rows without a full n-change window are dropped
    * (the standard warm-up); a flat window (no gains, no losses)
    * yields null.
    */
  def rsi(silver: DataFrame, n: Int = 14): DataFrame = {
    val wOrd = bySymbolTime
    val wN = bySymbolTime.rowsBetween(-(n - 1), Window.currentRow)
    silver
      .withColumn("px", ticksE4(col("price")))
      .withColumn("diff", col("px") - lag(col("px"), 1).over(wOrd))
      .filter(col("diff").isNotNull)
      .withColumn("gain", greatest(col("diff"), lit(0L)))
      .withColumn("loss", greatest(-col("diff"), lit(0L)))
      .withColumn("gain_sum", sum(col("gain")).over(wN))
      .withColumn("loss_sum", sum(col("loss")).over(wN))
      .withColumn("n_diffs", count(lit(1)).over(wN))
      .filter(col("n_diffs") === n)
      .select(
        col("symbol"),
        unix_millis(col("event_time")).as("ts_ms"),
        col("price"),
        when(col("gain_sum") + col("loss_sum") === 0, lit(null))
          .otherwise(expr("(gain_sum * 1000000) div (gain_sum + loss_sum)"))
          .as("rsi_e4"))
  }

  /** Price-spike (anomaly) counts: a trade is a spike when its z-score
    * against the trailing `n`-trade window exceeds `z`. The test is
    * the cross-multiplied integer form
    *   (cnt*x − Σx)² > z² * (cnt*Σx² − (Σx)²)
    * — no float, no sqrt, no rounding ambiguity. Windows still
    * warming up (cnt < n) are excluded.
    */
  /** B6 — per-symbol/day maximum drawdown versus the running all-time
    * peak, plus cumulative return from sequence start. Pure exact
    * integer arithmetic in e4 ticks / e6 fractions: the running peak
    * and first price are ordinary ordered-window aggregates (shuffle
    * key = symbol, like every indicator here), the drawdown is a
    * per-row integer expression, and the daily roll-up is one hash
    * aggregate. peak ≥ px > 0 always, so the divisions are total.
    */
  def drawdown(silver: DataFrame): DataFrame = {
    // event_id tie-break: silver is deduped on (symbol, event_time),
    // but a running ROWS window must stay deterministic even if a
    // caller feeds undeduped trades — ties in event_time would
    // otherwise make peak/first_px depend on partition scan order.
    val wAll = Window.partitionBy(col("symbol"))
      .orderBy(col("event_time"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    silver
      .withColumn("px", ticksE4(col("price")))
      .withColumn("peak", max(col("px")).over(wAll))
      .withColumn("first_px", first(col("px")).over(wAll))
      .withColumn("dd_e6", expr("(peak - px) * 1000000L div peak"))
      .groupBy(col("symbol"), col("trade_date"))
      .agg(
        max(col("dd_e6")).as("max_drawdown_e6"),
        graft.functions.OrderedExtremum.maxByOrd2(col("px"),
          unix_micros(col("event_time")), col("event_id")).as("close_px"),
        max(col("peak")).as("peak_px"),
        min(col("first_px")).as("first_px"))
      .withColumn("cum_ret_e6",
        expr("close_px * 1000000L div first_px - 1000000L"))
      .drop("first_px")
  }

  /** B7 — MACD(12, 26, 9) end-state over the per-symbol daily-close
    * series, as one `aggregate` fold carrying (ema12, ema26, signal):
    * both EMAs seed from the first close, the signal from the first
    * MACD (= 0). Every step is the same IEEE double expression tree
    * the DuckDB oracle folds with `list_reduce`, so equality is
    * bit-exact, not approximate (the b5 contract).
    *
    * Shape at scale: daily closes are one hash aggregate over trades;
    * the fold then runs over a per-symbol array of DAYS — thousands of
    * elements after decades — so `collect_list` here is bounded by the
    * calendar, not the trade count, and the shuffle key is the symbol
    * like every indicator in this module.
    */
  def macdDaily(silver: DataFrame): DataFrame = {
    val daily = silver
      .groupBy(col("symbol"), col("trade_date"))
      .agg(graft.functions.OrderedExtremum.maxByOrd2(col("price"),
        unix_micros(col("event_time")), col("event_id")).as("close"))
    val fold = """aggregate(
      slice(days, 2, size(days) - 1),
      named_struct(
        'e12', CAST(days[0].close AS DOUBLE),
        'e26', CAST(days[0].close AS DOUBLE),
        'sig', CAST(0.0 AS DOUBLE)),
      (acc, d) -> named_struct(
        'e12', (2D / 13D) * d.close + (1D - 2D / 13D) * acc.e12,
        'e26', (2D / 27D) * d.close + (1D - 2D / 27D) * acc.e26,
        'sig', (2D / 10D) * (((2D / 13D) * d.close + (1D - 2D / 13D) * acc.e12)
                 - ((2D / 27D) * d.close + (1D - 2D / 27D) * acc.e26))
               + (1D - 2D / 10D) * acc.sig))"""
    daily
      .groupBy(col("symbol"))
      .agg(sort_array(collect_list(struct(col("trade_date"), col("close")))).as("days"))
      .select(col("symbol"), size(col("days")).cast("long").as("n_days"),
        expr(fold).as("m"))
      .select(col("symbol"), col("n_days"),
        col("m.e12").as("ema12"), col("m.e26").as("ema26"),
        (col("m.e12") - col("m.e26")).as("macd"),
        col("m.sig").as("signal"),
        (col("m.e12") - col("m.e26") - col("m.sig")).as("histogram"))
  }

  /** B8 — pairwise daily-return covariance/correlation across
    * symbols, the first cross-series statistic (everything else in
    * this module is per-symbol). Returns are exact e6 integers,
    * (close − prev)·1e6 div prev: returns go negative, and BOTH
    * engines' integer division truncates toward zero (Spark `div`,
    * DuckDB integer `//` — verified: -7 // 2 = -3 there, not -4), so
    * plain division is the portable form — a floor-division identity
    * here would DIVERGE on every down day, not protect against it.
    * Covariance/variance numerators are the n·Σxy − Σx·Σy form,
    * computed EXACTLY in decimal and EMITTED as DECIMAL(38,0): the h1
    * "exact inside, one double cast at the boundary" posture is
    * unsafe here because the numerators top 2⁵³ (measured ~2.1e16 at
    * sf0.01), where a double no longer represents the integer exactly
    * and the two engines' int→double casts are free to disagree —
    * DuckDB v1.0.0's HUGEINT→DOUBLE double-rounds negative values
    * (it rounds `lower` to double before combining with upper·2⁶⁴)
    * while Spark's decimal→double is correctly rounded, a 1-ulp
    * divergence found live in round 4. Decimals compare exactly at
    * any magnitude. `corr` IS emitted as double, derived from the
    * exact decimals via correctly-rounded casts and single IEEE ops
    * (/, *, sqrt), so it is bit-identical as long as the oracle's
    * int→double casts are also correctly rounded (it routes them
    * through VARCHAR for exactly that reason).
    *
    * Shape at scale: daily returns are one hash aggregate + a lag
    * over O(symbols × days) rows; the pair frame is a self equi-join
    * on trade_date — quadratic in SYMBOLS, not trades, i.e. bounded
    * by portfolio size (10³–10⁴ symbols ⇒ ≤ 10⁸ pair-days over a
    * year), with the join shuffling only the tiny daily-return frame.
    */
  /** Per-symbol daily returns in exact e6 integers — the shared input
    * frame of the cross-series statistics (B8 covariance, B9 beta):
    * one hash aggregate for daily closes, one per-symbol lag.
    */
  private def dailyReturns(silver: DataFrame): DataFrame = {
    val daily = silver
      .groupBy(col("symbol"), col("trade_date"))
      .agg(graft.functions.OrderedExtremum.maxByOrd2(ticksE4(col("price")),
        unix_micros(col("event_time")), col("event_id")).as("close_px"))
    val wd = Window.partitionBy(col("symbol")).orderBy(col("trade_date"))
    daily
      .withColumn("prev_px", lag(col("close_px"), 1).over(wd))
      .filter(col("prev_px").isNotNull)
      .withColumn("ret_e6",
        expr("(close_px - prev_px) * 1000000L div prev_px"))
      .select(col("symbol"), col("trade_date"), col("ret_e6"))
  }

  def returnCovariance(silver: DataFrame): DataFrame = {
    val rets = dailyReturns(silver)
    val a = rets.select(col("symbol").as("sym_a"), col("trade_date"), col("ret_e6").as("ra"))
    val b = rets.select(col("symbol").as("sym_b"), col("trade_date"), col("ret_e6").as("rb"))
    def dec(c: Column) = c.cast("decimal(19,0)")
    a.join(b, Seq("trade_date"))
      .filter(col("sym_a") < col("sym_b"))
      .groupBy(col("sym_a"), col("sym_b"))
      .agg(count(lit(1)).as("n_days"),
        sum(dec(col("ra"))).as("sa"), sum(dec(col("rb"))).as("sb"),
        sum(dec(col("ra")) * col("rb")).as("sab"),
        sum(dec(col("ra")) * col("ra")).as("saa"),
        sum(dec(col("rb")) * col("rb")).as("sbb"))
      .select(col("sym_a"), col("sym_b"), col("n_days"),
        (col("n_days") * col("sab") - col("sa") * col("sb"))
          .cast("decimal(38,0)").as("cov_num"),
        (col("n_days") * col("saa") - col("sa") * col("sa"))
          .cast("decimal(38,0)").as("var_a_num"),
        (col("n_days") * col("sbb") - col("sb") * col("sb"))
          .cast("decimal(38,0)").as("var_b_num"))
      .withColumn("corr",
        when(col("var_a_num") > 0 && col("var_b_num") > 0,
          col("cov_num").cast("double") /
            sqrt(col("var_a_num").cast("double") * col("var_b_num").cast("double"))))
      // The exact >2^53 numerators SHIP AS STRINGS: the correctness
      // comparer reads Spark parquet natively (exact decimal.Decimal)
      // but collapses the oracle's DECIMAL(38,0) to float64, so a
      // decimal OUTPUT column can never hash-match above 2^53 (round-5
      // finding). Decimal stays the internal arithmetic type; only the
      // boundary is text. `corr` stays double — the correctly-rounded
      // decimal->double casts are bit-identical on both engines.
      .select(col("sym_a"), col("sym_b"), col("n_days"),
        col("cov_num").cast("string").as("cov_num"),
        col("var_a_num").cast("string").as("var_a_num"),
        col("var_b_num").cast("string").as("var_b_num"),
        col("corr"))
  }

  /** B9 — market beta per symbol: the regression slope of a symbol's
    * daily returns against the equal-weight market return,
    * β = cov(r, m) / var(m). The market return is the floored integer
    * mean of all symbols' e6 returns that day (truncating division —
    * Spark `div` = DuckDB `//` on the possibly-negative sum), so the
    * whole input stays exact integers and the moment numerators
    * follow b8's >2⁵³ posture: decimal arithmetic inside, STRING at
    * the output boundary, `beta` as one double division of
    * correctly-rounded casts (the oracle routes its casts through
    * VARCHAR for the same correct rounding).
    *
    * Shape at scale: returns are O(symbols × days); the market frame
    * is O(days) and broadcast-joins back; one hash aggregate per
    * symbol. Nothing quadratic — beta against ONE index needs no
    * pair frame, unlike b8's full covariance matrix.
    */
  def marketBeta(silver: DataFrame): DataFrame = {
    val rets = dailyReturns(silver)
    val mkt = rets.groupBy(col("trade_date"))
      .agg(sum(col("ret_e6")).as("mkt_sum"), count(lit(1)).as("n_sym"))
      .select(col("trade_date"), expr("mkt_sum div n_sym").as("mret_e6"))
    def dec(c: Column) = c.cast("decimal(19,0)")
    rets.join(broadcast(mkt), Seq("trade_date"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_days"),
        sum(dec(col("ret_e6"))).as("sr"), sum(dec(col("mret_e6"))).as("sm"),
        sum(dec(col("ret_e6")) * col("mret_e6")).as("srm"),
        sum(dec(col("mret_e6")) * col("mret_e6")).as("smm"))
      .select(col("symbol"), col("n_days"),
        (col("n_days") * col("srm") - col("sr") * col("sm"))
          .cast("decimal(38,0)").as("cov_num"),
        (col("n_days") * col("smm") - col("sm") * col("sm"))
          .cast("decimal(38,0)").as("var_m_num"))
      .withColumn("beta",
        when(col("var_m_num") > 0,
          col("cov_num").cast("double") / col("var_m_num").cast("double")))
      // Same >2^53 boundary rule as b8: exact numerators out as text,
      // beta as the already-bit-identical double.
      .select(col("symbol"), col("n_days"),
        col("cov_num").cast("string").as("cov_num"),
        col("var_m_num").cast("string").as("var_m_num"),
        col("beta"))
  }

  /** Shared daily-bar frame for the bar-level indicators (B10–B12):
    * one hash aggregate over silver — high/low are plain extrema in
    * e4 ticks, close is the deterministic last trade by
    * (event_time, event_id), day volume an exact long sum. Output is
    * O(symbols × days) rows; every downstream window partitions by
    * symbol and orders by trade_date (unique per symbol after this
    * aggregate, so the ordering is total and the windows
    * deterministic at any parallelism).
    */
  private[graft] def dailyBars(silver: DataFrame): DataFrame =
    silver
      .withColumn("px", ticksE4(col("price")))
      .groupBy(col("symbol"), col("trade_date"))
      .agg(
        max(col("px")).as("high"),
        min(col("px")).as("low"),
        graft.functions.OrderedExtremum.maxByOrd2(col("px"),
          unix_micros(col("event_time")), col("event_id")).as("close"),
        sum(col("volume")).as("day_volume"))

  private def bySymbolDate =
    Window.partitionBy(col("symbol")).orderBy(col("trade_date"))

  /** B10 — on-balance volume per symbol: the running sum of each
    * day's volume signed by the close-to-close direction (flat days
    * and the first day contribute zero). Pure exact integer
    * arithmetic end to end — longs only, no floats anywhere — so the
    * result is order-independent and bit-identical on any engine.
    *
    * Shape at scale: one hash aggregate over trades to daily bars,
    * then per-symbol lag + running sum over O(days) rows. The shuffle
    * key is the symbol, like every indicator in this module.
    */
  def obv(silver: DataFrame): DataFrame = {
    val w = bySymbolDate
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailyBars(silver)
      .withColumn("prev_close", lag(col("close"), 1).over(w))
      .withColumn("signed_vol",
        when(col("prev_close").isNull || col("close") === col("prev_close"), lit(0L))
          .when(col("close") > col("prev_close"), col("day_volume"))
          .otherwise(-col("day_volume")))
      .withColumn("obv", sum(col("signed_vol")).over(cum))
      .select(col("symbol"), col("trade_date"), col("close").as("close_px"),
        col("day_volume"), col("signed_vol"), col("obv"))
  }

  /** B11 — Average True Range over the daily bars: true range is
    * max(high−low, |high−prevClose|, |low−prevClose|) in e4 ticks
    * (first day: high−low, the standard Wilder convention when no
    * prior close exists), ATR-n its rolling n-day mean. The range
    * arithmetic and rolling sum are exact longs; `atr` is the single
    * IEEE division of those two exact integers, so it is correctly
    * rounded and bit-identical across engines.
    */
  def atr(silver: DataFrame, n: Int = 14): DataFrame = {
    val w = bySymbolDate
    val wN = w.rowsBetween(-(n - 1), Window.currentRow)
    dailyBars(silver)
      .withColumn("prev_close", lag(col("close"), 1).over(w))
      .withColumn("tr",
        when(col("prev_close").isNull, col("high") - col("low"))
          .otherwise(greatest(col("high") - col("low"),
            abs(col("high") - col("prev_close")),
            abs(col("low") - col("prev_close")))))
      .withColumn("tr_sum", sum(col("tr")).over(wN))
      .withColumn("n_tr", count(lit(1)).over(wN))
      .withColumn("atr", col("tr_sum").cast("double") / col("n_tr").cast("double"))
      .select(col("symbol"), col("trade_date"), col("tr"),
        col("tr_sum"), col("n_tr"), col("atr"))
  }

  /** B12 — stochastic oscillator %K/%D over the daily bars:
    * %K = 100·(close − lowestLow_n)/(highestHigh_n − lowestLow_n),
    * %D the 3-day mean of %K. The numerator and denominator are
    * exact tick integers (emitted as `k_num`/`k_den` so the exact
    * form is also on the output); %K is the two-IEEE-op expression
    * (cast·100.0)/cast — multiplication by 100 of a <2⁴⁶ integer is
    * exact, the division correctly rounded — and %D is the explicit
    * left-parenthesised tree ((k + lag₁k) + lag₂k)/3.0, both
    * mirrored literally in the DuckDB oracle, so equality is
    * bit-exact, not approximate. Flat windows (k_den = 0) and the
    * first two days of %D are NULL on both engines by the same
    * NULL-propagation rules.
    */
  def stochastic(silver: DataFrame, n: Int = 14): DataFrame = {
    val w = bySymbolDate
    val wN = w.rowsBetween(-(n - 1), Window.currentRow)
    dailyBars(silver)
      .withColumn("hh", max(col("high")).over(wN))
      .withColumn("ll", min(col("low")).over(wN))
      .withColumn("k_num", col("close") - col("ll"))
      .withColumn("k_den", col("hh") - col("ll"))
      .withColumn("pct_k",
        when(col("k_den") > 0,
          col("k_num").cast("double") * 100.0 / col("k_den").cast("double")))
      .withColumn("pct_d",
        (col("pct_k") + lag(col("pct_k"), 1).over(w) + lag(col("pct_k"), 2).over(w)) / 3.0)
      .select(col("symbol"), col("trade_date"), col("k_num"), col("k_den"),
        col("pct_k"), col("pct_d"))
  }

  /** B13 — TWAP (time-weighted average price) per symbol/day: each
    * trade's price weighted by the interval it was the live price —
    * until the next trade, or day end for the last one. VWAP's sibling
    * (execution benchmarking weights by TIME, not volume; a single
    * giant print moves VWAP but barely moves TWAP).
    *
    * Exactness: weights are integer millis (silver's dedup makes
    * event_time unique per symbol, so lead() is total-order
    * deterministic) and the price·duration numerator accumulates in
    * decimal(38,0) — price_e4 × day_ms alone is ~8.6e17 per row, so a
    * long Σ could overflow within one heavy day. `twap_e6 = ⌊num·100 /
    * span⌋` is one exact integral division; span = day_end − first
    * trade (the pre-open gap carries no price to weight).
    */
  def twap(silver: DataFrame): DataFrame = {
    val w = bySymbolTime
    val dayEndMs = unix_millis(col("trade_date").cast("timestamp")) + 86400000L
    silver
      .withColumn("px", ticksE4(col("price")))
      .withColumn("ts_ms", unix_millis(col("event_time")))
      // lead is within (symbol, day): partition by both, else the
      // last trade of a day would weight into the NEXT day's first.
      .withColumn("next_ms",
        lead(col("ts_ms"), 1).over(Window.partitionBy(col("symbol"), col("trade_date"))
          .orderBy(col("event_time"))))
      .withColumn("dur_ms", coalesce(col("next_ms"), dayEndMs) - col("ts_ms"))
      .groupBy(col("symbol"), col("trade_date"))
      .agg(count(lit(1)).as("n_trades"),
        sum(col("px").cast("decimal(38,0)") * col("dur_ms")).as("num"),
        sum(col("dur_ms")).as("span_ms"))
      .select(col("symbol"), col("trade_date"), col("n_trades"), col("span_ms"),
        // integral divide (`div` = DuckDB `//`), NOT `/`: decimal
        // division rounds at result scale before any cast could floor.
        expr("(num * 100) div span_ms").as("twap_e6"))
  }

  /** B14 — realized volatility per symbol/day from 5-minute close
    * log returns: rv = Σ r², r = ln(close_t / close_{t−1}) over the
    * day's consecutive 5m bars (the standard realized-variance
    * estimator; Andersen & Bollerslev 1998). The reference's gold
    * layer stops at the bars — this is the canonical risk query run
    * on top of them.
    *
    * Exactness: 5m closes are exact e4 tick longs (deterministic
    * last-trade-by-(time,id)); each return is ONE ln() of a
    * correctly-rounded quotient of two exact doubles (ticks < 2⁵³),
    * floor-quantized to e6 BEFORE the sum — so rv_e12 is an exact
    * long Σ of (r_e6)² products, order-independent at any
    * parallelism (|r_e6| ≤ ln(1e14)·1e6 ≈ 3.2e7, squared 1e15, ×288
    * bars/day ≈ 3e17 < 2⁶³). day_vol_e6 = ⌊√rv⌋ is one IEEE sqrt of
    * an exactly-cast long — bit-identical across engines.
    *
    * Scale: one hash aggregate trades→5m closes (O(bars) output),
    * then a per-(symbol,day) lag + hash aggregate over O(bars) rows.
    * The shuffle key is the symbol — nothing global, nothing
    * quadratic; the trades scan dominates, exactly like a1.
    */
  def realizedVol(silver: DataFrame): DataFrame = {
    val wsMs = unix_millis(col("event_time")) - unix_millis(col("event_time")) % 300000L
    val closes = silver
      .withColumn("px", ticksE4(col("price")))
      .withColumn("ws_ms", wsMs)
      .groupBy(col("symbol"), col("trade_date"), col("ws_ms"))
      .agg(graft.functions.OrderedExtremum.maxByOrd2(col("px"),
        unix_micros(col("event_time")), col("event_id")).as("close"))
    val byDay = Window.partitionBy(col("symbol"), col("trade_date")).orderBy(col("ws_ms"))
    closes
      .withColumn("prev_close", lag(col("close"), 1).over(byDay))
      .withColumn("r_e6",
        when(col("prev_close").isNotNull,
          floor(log(col("close").cast("double") / col("prev_close").cast("double"))
            * lit(1000000.0)).cast("long")))
      .groupBy(col("symbol"), col("trade_date"))
      .agg(
        count(lit(1)).as("n_bars"),
        count(col("r_e6")).as("n_returns"),
        sum(col("r_e6") * col("r_e6")).as("rv_e12"))
      .withColumn("day_vol_e6",
        when(col("rv_e12").isNotNull,
          floor(sqrt(col("rv_e12").cast("double"))).cast("long")))
  }

  /** B15 — range-based volatility estimators per symbol/day from the
    * daily OHLC bar: Parkinson (1980) `lhl²/(4·ln2)` and
    * Garman–Klass (1980) `0.5·lhl² − (2·ln2 − 1)·lco²`, with
    * lhl = ln(High/Low), lco = ln(Close/Open). Range estimators are
    * 5–7× more efficient than close-to-close variance per bar — the
    * estimator of choice when only bars (not ticks) survive
    * retention, i.e. exactly the reference's gold store.
    *
    * Exactness: OHLC are exact e4 tick longs from one hash aggregate
    * (open/close deterministic by (time, id)); each estimator is a
    * fixed IEEE expression tree over two ln() values — the constants
    * 1/(4ln2) and (2ln2−1) are written as decimal LITERALS mirrored
    * byte-for-byte in the oracle so both engines parse the identical
    * double — floor-quantized to e9 at the end. H ≥ L > 0 always
    * (same aggregate), so no domain guards are needed.
    *
    * Scale: one trades→daily-bars hash aggregate (O(symbols·days)
    * rows), then per-row scalar math. Shuffle key = (symbol, date).
    */
  def rangeVol(silver: DataFrame): DataFrame = {
    val ordTs = unix_micros(col("event_time"))
    val daily = silver
      .withColumn("px", ticksE4(col("price")))
      .groupBy(col("symbol"), col("trade_date"))
      .agg(
        graft.functions.OrderedExtremum.minByOrd2(col("px"), ordTs, col("event_id")).as("open"),
        max(col("px")).as("high"),
        min(col("px")).as("low"),
        graft.functions.OrderedExtremum.maxByOrd2(col("px"), ordTs, col("event_id")).as("close"))
    val lhl = log(col("high").cast("double") / col("low").cast("double"))
    val lco = log(col("close").cast("double") / col("open").cast("double"))
    daily
      .withColumn("lhl_e9", floor(lhl * lit(1.0e9)).cast("long"))
      .withColumn("lco_e9", floor(lco * lit(1.0e9)).cast("long"))
      // 1/(4·ln2) and (2·ln2 − 1) as literal doubles (see Scaladoc).
      .withColumn("park_e9",
        floor(lhl * lhl * lit(0.36067376022224085) * lit(1.0e9)).cast("long"))
      .withColumn("gk_e9",
        floor((lit(0.5) * (lhl * lhl) - lit(0.3862943611198906) * (lco * lco))
          * lit(1.0e9)).cast("long"))
      .select(col("symbol"), col("trade_date"), col("open"), col("high"),
        col("low"), col("close"), col("lhl_e9"), col("lco_e9"),
        col("park_e9"), col("gk_e9"))
  }

  /** B16 — tick-rule trade classification (the tick test of Lee &
    * Ready 1991): a trade is buyer-initiated (+1) on an uptick,
    * seller-initiated (−1) on a downtick, and on a ZERO tick inherits
    * the last non-zero tick's sign; leading trades of a (symbol, day)
    * before any price change stay unclassified. Aggregated to
    * per-(symbol, day) order-flow imbalance — the microstructure
    * signal flow-toxicity/price-impact models consume.
    *
    * The zero-tick inheritance is not a recursion: it is
    * `last(sign_of_change, ignoreNulls)` over the ordered per-day
    * frame — one window pass. All arithmetic is exact longs on e4
    * ticks; the imbalance is a truncating e6 division (Spark `div` ≡
    * DuckDB `//`, both toward zero, which matters here because the
    * numerator can be negative).
    *
    * Shape at scale: one (symbol, day) window pass over trades (the
    * b-family shuffle), then a hash aggregate to O(symbol×days) rows.
    */
  /** The tick-test classification pass shared by B16 (order flow) and
    * B17 (Kyle's lambda): adds `px` (e4 ticks) and `sign` (+1 buy /
    * −1 sell / null unclassified) to each silver trade. One window
    * pass keyed (symbol, trade_date) — silver is deduped on
    * (symbol, event_time), so the ORDER BY is total.
    */
  private def tickClassified(silver: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol"), col("trade_date"))
      .orderBy(col("event_time"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    silver
      .withColumn("px", ticksE4(col("price")))
      .withColumn("prev_px", lag(col("px"), 1).over(w))
      .withColumn("chg_sign",
        when(col("prev_px").isNull, lit(null).cast("int"))
          .when(col("px") > col("prev_px"), lit(1))
          .when(col("px") < col("prev_px"), lit(-1))
          .otherwise(lit(null).cast("int")))
      .withColumn("sign", last(col("chg_sign"), ignoreNulls = true).over(cum))
  }

  def orderFlow(silver: DataFrame): DataFrame = {
    tickClassified(silver).groupBy(col("symbol"), col("trade_date"))
      .agg(
        sum(when(col("sign") === 1, 1L).otherwise(0L)).as("n_buy"),
        sum(when(col("sign") === -1, 1L).otherwise(0L)).as("n_sell"),
        sum(when(col("sign").isNull, 1L).otherwise(0L)).as("n_unclassified"),
        sum(when(col("sign") === 1, col("volume")).otherwise(0L)).as("buy_vol"),
        sum(when(col("sign") === -1, col("volume")).otherwise(0L)).as("sell_vol"))
      .withColumn("flow_imbalance_e6",
        when(col("buy_vol") + col("sell_vol") === 0, lit(0L))
          // Stage the ±vol·1e6 numerator through decimal(38,0) (the
          // kyleLambda discipline): Long would overflow once a
          // (symbol, day)'s classified volume passes ~9.2e12 shares.
          // `div` on decimals still emits BIGINT and truncates toward
          // zero, so the output schema and oracle semantics are
          // unchanged.
          .otherwise(expr(
            "(cast(buy_vol as decimal(38,0)) - sell_vol) * 1000000 div (buy_vol + sell_vol)")))
  }

  /** B17 — Kyle's lambda (Kyle 1985): per-(symbol, day) price impact,
    * the OLS slope of 5-minute price change Δp (e4 ticks) on signed
    * order flow q (tick-test sign × volume, unclassified trades
    * contributing 0). λ = (n·Σqp − Σq·Σp) / (n·Σq² − (Σq)²), emitted
    * as an exact truncating e9 integer — every sufficient statistic
    * is an integer sum in decimal(38,0) (q² alone can exceed 2⁶³),
    * so the answer is independent of aggregation order, and the final
    * `div` truncates toward zero exactly like the DuckDB oracle's
    * `//` on HUGEINT. Days whose flow has zero variance (all bins the
    * same q) get a NULL λ rather than a division blow-up.
    *
    * Shape at scale: reuses B16's one (symbol, day) window pass, then
    * two hash aggregates — trades → O(symbol·day·bins) 5m bins →
    * O(symbol·day) rows. No new shuffle key beyond the b-family's.
    */
  def kyleLambda(silver: DataFrame): DataFrame = {
    val ordTs = unix_micros(col("event_time"))
    val bins = tickClassified(silver)
      .withColumn("ws_ms",
        expr("(unix_micros(event_time) div 1000) - (unix_micros(event_time) div 1000) % 300000"))
      .groupBy(col("symbol"), col("trade_date"), col("ws_ms"))
      .agg(
        sum(coalesce(col("sign"), lit(0)).cast("long") * col("volume")).as("q"),
        graft.functions.OrderedExtremum.maxByOrd2(col("px"), ordTs, col("event_id"))
          .as("close_px"),
        graft.functions.OrderedExtremum.minByOrd2(col("px"), ordTs, col("event_id"))
          .as("open_px"))
      .withColumn("dp", col("close_px") - col("open_px"))
    val d38 = "decimal(38,0)"
    bins.groupBy(col("symbol"), col("trade_date"))
      .agg(
        count(lit(1)).cast("long").as("n_bins"),
        sum(col("q")).cast("long").as("net_flow"),
        sum(col("q").cast(d38)).as("sx"),
        sum(col("dp").cast(d38)).as("sy"),
        sum(col("q").cast(d38) * col("dp").cast(d38)).as("sxy"),
        sum(col("q").cast(d38) * col("q").cast(d38)).as("sxx"))
      .withColumn("den", col("n_bins").cast(d38) * col("sxx") - col("sx") * col("sx"))
      .withColumn("lambda_e9",
        when(col("den") === 0, lit(null).cast("long"))
          .otherwise(expr(
            "(CAST(n_bins AS DECIMAL(38,0)) * sxy - sx * sy) * 1000000000 div den")))
      .select(col("symbol"), col("trade_date"), col("n_bins"),
        col("net_flow"), col("lambda_e9"))
  }

  /** B18 — Amihud (2002) illiquidity: per symbol, the average over
    * days of |daily return| per unit of dollar volume — THE standard
    * price-impact proxy when order-book data is absent. Exact end to
    * end: ret_e6 is the b2/b8 integer daily return, dollar volume is
    * the gold layer's Σ price·volume in e4 ticks (a long per day,
    * decimal(38,0) at the symbol level), and both divisions truncate
    * (`div` ≡ DuckDB `//`). Emitted ×1e12 so the tiny ratios survive
    * integer truncation.
    *
    * Shape at scale: two hash aggregates over trades keyed
    * (symbol, day) — the b-family shuffle — then an equi-join of two
    * O(symbol×days) frames and a final per-symbol aggregate. Nothing
    * new shuffles the trade stream.
    */
  def amihudIlliquidity(silver: DataFrame): DataFrame = {
    val rets = dailyReturns(silver)
    val pv = silver
      .withColumn("pv",
        (col("price").cast("decimal(18,4)") * col("volume") * 10000).cast("long"))
      .groupBy(col("symbol"), col("trade_date"))
      // decimal sum: per-day dollar volume can pass 2^63 ticks at
      // 100 TB trade volume even though each pv term is a safe long.
      .agg(sum(col("pv").cast("decimal(38,0)")).as("pv_ticks"))
    rets.join(pv, Seq("symbol", "trade_date"))
      .withColumn("illiq_e12",
        expr("(cast(abs(ret_e6) as decimal(38,0)) * 1000000000000) div pv_ticks"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_days"),
        expr("sum(cast(illiq_e12 as decimal(38,0))) div count(1)")
          .as("avg_illiq_e12"))
  }

  /** B19 — Roll (1984) effective-spread estimator: per (symbol, day),
    * the first-order serial covariance of consecutive trade-price
    * changes; bid-ask bounce makes it negative, and
    * spread = 2·√(−cov). Sufficient statistics are exact decimal
    * sums over e4-tick deltas (cov_num = m·Σdᵢdᵢ₊₁ − Σdᵢ·Σdᵢ₊₁,
    * shipped as STRING per the b8 >2⁵³ posture); the spread itself is
    * a chain of correctly-rounded double ops (decimal→double cast,
    * divide, sqrt, ×2) that both engines reproduce bit-for-bit — the
    * b8/b9 `corr`/`beta` discipline. Days where the covariance is
    * non-negative (no bounce detected) emit NULL, the literature's
    * convention. Ordering is by event_time alone: silver dedup makes
    * it unique per symbol, so the lag/lead chain is total.
    *
    * Shape at scale: one (symbol, day) window pass + one hash
    * aggregate — the b-family shuffle, nothing else.
    */
  def rollSpread(silver: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol"), col("trade_date"))
      .orderBy(col("event_time"))
    def dec(c: Column) = c.cast("decimal(19,0)")
    silver
      .withColumn("px", ticksE4(col("price")))
      .withColumn("d", col("px") - lag(col("px"), 1).over(w))
      .withColumn("d_next", lead(col("d"), 1).over(w))
      .filter(col("d").isNotNull && col("d_next").isNotNull)
      .groupBy(col("symbol"), col("trade_date"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(dec(col("d")) * col("d_next")).as("s_dd"),
        sum(dec(col("d"))).as("s_d"),
        sum(dec(col("d_next"))).as("s_dn"))
      .withColumn("cov_num",
        (col("n_pairs").cast("decimal(38,0)") * col("s_dd") -
          col("s_d") * col("s_dn")).cast("decimal(38,0)"))
      .withColumn("roll_spread_ticks",
        when(col("cov_num") < 0,
          lit(2.0) * sqrt(-(col("cov_num").cast("double")) /
            (col("n_pairs").cast("double") * col("n_pairs").cast("double")))))
      .select(col("symbol"), col("trade_date"), col("n_pairs"),
        col("cov_num").cast("string").as("cov_num"), col("roll_spread_ticks"))
  }

  /** B20 — VPIN (Easley/López de Prado/O'Hara): per symbol, the
    * Volume-synchronized Probability of INformed trading — trades are
    * cut into ~`nBuckets` equal-VOLUME buckets (volume clock, not
    * wall clock) and vpin = Σ|buy−sell| / Σvol over buckets, buy/sell
    * from B16's tick-test classification. The flash-crash toxicity
    * gauge, and the natural consumer of the order-flow pass this
    * module already has.
    *
    * Determinism: the volume clock orders by event_time (unique per
    * symbol after silver dedup); bucket width = ⌊total/nBuckets⌋
    * clamped ≥1, bucket id clamped to nBuckets−1 so the floor-
    * remainder tail folds into the last bucket — every boundary is
    * integer arithmetic, bit-identical at any parallelism.
    *
    * Shape at scale: B16's (symbol, day) window pass, then the volume
    * clock is DAY-BUCKETED two-pass prefix sums — an in-day cumulative
    * window keyed (symbol, trade_date) (the b-family shuffle; no task
    * ever sorts more than one symbol-day) plus per-day running offsets
    * computed on the O(symbols×days) day-total frame and broadcast
    * back. cum_prev = day_offset + in-day prefix is identical to the
    * naive per-symbol unbounded window (trade_date is derived from
    * event_time, so (trade_date, event_time) order IS event_time
    * order) without ever putting a symbol's full history through one
    * task. Two hash aggregates finish. The cumulative volume lives in
    * a long — overflow needs 9.2e18 shares/symbol, beyond any market.
    */
  /** Shared volume-clock plumbing for b20/b21: classified trades with
    * the global per-symbol cumulative volume BEFORE each trade
    * (`cum_prev`) and the per-symbol total (`tot_vol`), via
    * day-bucketed prefix sums — an in-day cumulative window keyed
    * (symbol, trade_date) plus per-day running offsets AND totals as
    * two windows over the tiny O(symbols×days) day-total frame,
    * broadcast back. No task ever sorts more than one symbol-day, and
    * the trade stream is scanned exactly twice (cls + day totals).
    * ONE definition on purpose: b20 and b21 must cut buckets from the
    * identical clock, so a future rule change cannot desynchronize
    * them.
    */
  private def volumeClock(silver: DataFrame): DataFrame = {
    val cls = tickClassified(silver)
    val dayTot = cls.groupBy(col("symbol"), col("trade_date"))
      .agg(sum(col("volume")).as("day_vol"))
    val wDays = Window.partitionBy(col("symbol")).orderBy(col("trade_date"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAllDays = Window.partitionBy(col("symbol"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = dayTot
      .withColumn("day_off", coalesce(sum(col("day_vol")).over(wDays), lit(0L)))
      .withColumn("tot_vol", sum(col("day_vol")).over(wAllDays))
      .select(col("symbol"), col("trade_date"), col("day_off"), col("tot_vol"))
    val wInDay = Window.partitionBy(col("symbol"), col("trade_date"))
      .orderBy(col("event_time"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cls
      .withColumn("in_day_prev", coalesce(sum(col("volume")).over(wInDay), lit(0L)))
      .join(broadcast(offsets), Seq("symbol", "trade_date"))
      .withColumn("cum_prev", col("day_off") + col("in_day_prev"))
  }

  def vpin(silver: DataFrame, nBuckets: Int = 50): DataFrame = {
    volumeClock(silver)
      .withColumn("vbucket", expr(s"greatest(tot_vol div ${nBuckets}L, 1L)"))
      .withColumn("bucket",
        expr(s"least(cum_prev div vbucket, ${nBuckets - 1}L)"))
      .groupBy(col("symbol"), col("bucket"))
      .agg(sum(when(col("sign") === 1, col("volume")).otherwise(0L)).as("buy"),
        sum(when(col("sign") === -1, col("volume")).otherwise(0L)).as("sell"),
        sum(col("volume")).as("vol"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_buckets"),
        expr("sum(cast(abs(buy - sell) as decimal(38,0))) * 1000000 div sum(vol)")
          .as("vpin_e6"))
  }

  /** B21 — rolling VPIN on a FIXED volume bucket (the live-trading
    * form of b20): the volume clock cuts at an ABSOLUTE width
    * `bucketVolume` (bucket = cum_prev div V — needs no knowledge of
    * the total, so a stream can run the identical rule), and each
    * bucket reports the trailing-`window` toxicity
    * Σ|buy−sell|·1e6 div Σvol over the last `window` non-empty
    * buckets. Companion streaming runtime: graft.streaming.VpinStream
    * (bounded per-symbol state; VpinStreamSpec pins equivalence on
    * completed buckets under arbitrary micro-batch slicings).
    *
    * Shape at scale: b20's day-bucketed volume clock verbatim (in-day
    * cumulative window keyed (symbol, trade_date) + O(symbols×days)
    * running-offset broadcast — no per-symbol unbounded sort over
    * trades); the rolling window then runs over the
    * O(symbols × buckets) bucket frame only. |buy−sell| sums stage
    * through decimal(38,0) (the b-family >2⁶³ posture).
    */
  def vpinRolling(silver: DataFrame, bucketVolume: Long,
                  window: Int = 10): DataFrame = {
    require(bucketVolume > 0, "bucketVolume must be positive")
    val wRoll = Window.partitionBy(col("symbol")).orderBy(col("bucket"))
      .rowsBetween(-(window - 1), Window.currentRow)
    volumeClock(silver)
      .withColumn("bucket", expr(s"cum_prev div ${bucketVolume}L"))
      .groupBy(col("symbol"), col("bucket"))
      .agg(sum(when(col("sign") === 1, col("volume")).otherwise(0L)).as("buy"),
        sum(when(col("sign") === -1, col("volume")).otherwise(0L)).as("sell"),
        sum(col("volume")).as("vol"))
      .withColumn("n_in_window", count(lit(1)).over(wRoll))
      .withColumn("w_absdiff",
        sum(abs(col("buy") - col("sell")).cast("decimal(38,0)")).over(wRoll))
      .withColumn("w_vol", sum(col("vol")).over(wRoll))
      .select(col("symbol"), col("bucket"), col("buy"), col("sell"), col("vol"),
        col("n_in_window"),
        expr("cast((w_absdiff * 1000000) div w_vol as bigint)").as("vpin_roll_e6"))
  }

  /** B22 — intraday seasonality profile: per (symbol, UTC hour of
    * day), trade count, volume, and the mean per-trade |return| in
    * exact e6 integers — the U-shape table (open/close activity
    * concentration) every execution desk keeps. The return lag is
    * keyed (symbol, trade_date) so overnight gaps never pollute the
    * first hour's numbers (each day's first trade contributes
    * activity but no return). Hour is integer arithmetic on epoch
    * micros — no cross-engine timezone/extract semantics.
    *
    * Shape at scale: one (symbol, day) window pass (the b-family
    * shuffle) then a hash aggregate to O(symbols × 24) rows. The
    * |Δpx|·1e6 product stages through decimal(38,0) (>2⁶³ at e4
    * ticks of extreme prices); `div` truncates like the oracle's `//`
    * (all terms non-negative).
    */
  def intradayProfile(silver: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol"), col("trade_date"))
      .orderBy(col("event_time"))
    silver
      .withColumn("px", ticksE4(col("price")))
      .withColumn("prev_px", lag(col("px"), 1).over(w))
      .withColumn("hour",
        expr("(unix_micros(event_time) div 3600000000L) % 24").cast("int"))
      .withColumn("abs_ret_e6",
        expr("cast(abs(cast(px as decimal(38,0)) - prev_px) * 1000000 div prev_px as bigint)"))
      .groupBy(col("symbol"), col("hour"))
      .agg(count(lit(1)).as("n_trades"),
        sum(col("volume")).as("volume"),
        count(col("abs_ret_e6")).as("n_rets"),
        sum(col("abs_ret_e6").cast("decimal(38,0)")).as("__sum_ret"))
      .withColumn("mean_abs_ret_e6",
        when(col("n_rets") === 0, lit(null).cast("long"))
          .otherwise(expr("cast(__sum_ret div n_rets as bigint)")))
      .select(col("symbol"), col("hour"), col("n_trades"), col("volume"),
        col("n_rets"), col("mean_abs_ret_e6"))
  }

  /** Synthetic prevailing-quote book derived deterministically from
    * the silver trade feed — the quotes_raw fixture (the reference
    * declares the quote stream in schemas/avro/quote.avsc and topic
    * `quotes_raw` in producer/config.py:38 but never consumes it;
    * FIXTURES.md §8 documents this derivation as the batch stand-in).
    * Every third trade (event_id % 3 == 0) becomes a quote stamped
    * 500 ms EARLIER than its source trade, with an asymmetric
    * integer-tick band around the trade price: bid = px − max(1,
    * px/2000) (~5 bp), ask = px + max(1, px/1000) (~10 bp) — the
    * asymmetry keeps the midpoint strictly off the quote price so
    * effective-spread arithmetic has a real signal. All integer e4
    * ticks; `div` truncation matches DuckDB `//` (prices positive).
    * trade_date rides along from the SOURCE trade (the day bucket the
    * as-of join is keyed on), not re-derived from the shifted stamp.
    */
  def syntheticQuotes(silver: DataFrame, modulus: Long = 3L,
                      lagMs: Long = 500L): DataFrame =
    silver.filter(col("event_id") % modulus === 0)
      .select(col("symbol"), col("trade_date"),
        (unix_millis(col("event_time")) - lagMs).as("q_ms"),
        ticksE4(col("price")).as("qpx_e4"))
      .withColumn("bid_e4",
        col("qpx_e4") - greatest(lit(1L), expr(s"qpx_e4 div 2000")))
      .withColumn("ask_e4",
        col("qpx_e4") + greatest(lit(1L), expr(s"qpx_e4 div 1000")))
      .select(col("symbol"), col("trade_date"), col("q_ms"),
        col("bid_e4"), col("ask_e4"))

  /** B23 — quote-driven effective vs quoted spread per (symbol, UTC
    * hour): each trade is as-of joined to the prevailing quote (latest
    * quote at-or-before the trade, same symbol and day, within a
    * 10-minute staleness tolerance — stale or missing quotes count the
    * trade as unquoted). Effective spread per trade is 2·|p − mid|,
    * computed as |2·px − (bid + ask)| so no halving ever leaves the
    * integers; quoted spread is ask − bid; the signed midpoint
    * deviation 2·px − (bid + ask) keeps buy/sell pressure visible.
    * eff_vs_quoted_e6 is the hour's effective/quoted ratio in e6
    * (floored), the standard price-improvement gauge.
    *
    * Scale: the as-of join is the tag-union-window form
    * ([[AsOfJoin.asOf]]) keyed (symbol, trade_date) — the same
    * day-bucketed posture as b20/b21, so no per-symbol
    * whole-history sort; quotes never carry across days (market
    * convention: books reset at the open). Sums stage through
    * decimal(38,0) before the one truncating division.
    */
  def effectiveSpread(silver: DataFrame, quotes: DataFrame,
                      toleranceMs: Long = 600000L): DataFrame = {
    val trades = silver.select(col("symbol"), col("trade_date"),
      unix_millis(col("event_time")).as("t_ms"),
      ticksE4(col("price")).as("px_e4"))
    val joined = AsOfJoin.asOf(trades, quotes,
      keys = Seq("symbol", "trade_date"),
      leftTime = "t_ms", rightTime = "q_ms",
      rightPayload = Seq("bid_e4", "ask_e4"), prefix = "q_",
      toleranceMs = Some(toleranceMs))
    joined
      .withColumn("hour_ms", expr("t_ms - t_ms % 3600000"))
      .withColumn("mid_dev_e4",
        lit(2L) * col("px_e4") - (col("q_bid_e4") + col("q_ask_e4")))
      .withColumn("quoted_e4", col("q_ask_e4") - col("q_bid_e4"))
      .groupBy(col("symbol"), col("hour_ms"))
      .agg(count(lit(1)).as("n_trades"),
        count(col("q_bid_e4")).as("n_quoted"),
        sum(abs(col("mid_dev_e4")).cast("decimal(38,0)")).as("__eff"),
        sum(col("quoted_e4").cast("decimal(38,0)")).as("__quoted"),
        sum(col("mid_dev_e4").cast("decimal(38,0)")).as("__mid_dev"))
      .select(col("symbol"), col("hour_ms"), col("n_trades"), col("n_quoted"),
        expr("cast(__eff as bigint)").as("eff_sum_e4"),
        expr("cast(__quoted as bigint)").as("quoted_sum_e4"),
        expr("cast(__mid_dev as bigint)").as("mid_dev_sum_e4"),
        when(col("__quoted") > 0,
          expr("cast((__eff * 1000000) div __quoted as bigint)"))
          .as("eff_vs_quoted_e6"))
  }

  /** B24 — realized variance and bipower variation of integer tick
    * increments per (symbol, trade_date), the Barndorff-Nielsen /
    * Shephard jump decomposition: RV = Σ Δ² captures continuous
    * variation PLUS jumps, BV = Σ |Δ_t|·|Δ_{t−1}| is jump-robust, so
    * a low BV/RV ratio flags jump days. Both sums are EXACT integers
    * over e4 price ticks (Δ = px_t − px_{t−1}), staged through
    * decimal(38,0) — order-independent at any parallelism; the
    * irrational μ₁⁻² = π/2 normalization of BV is left to consumers so
    * nothing here rounds. bv_vs_rv_e6 is floored e6 (DuckDB `//`
    * parity; both sums non-negative).
    *
    * Scale: one day-keyed window pass (the b20/b22 posture — no
    * whole-history per-symbol sort) + one hash aggregation on the
    * same (symbol, trade_date) key, so the window's sort output feeds
    * the agg without a second shuffle.
    */
  def realizedBipower(silver: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol"), col("trade_date"))
      .orderBy(col("event_time"))
    silver
      .withColumn("px", ticksE4(col("price")))
      .withColumn("d", col("px") - lag(col("px"), 1).over(w))
      .withColumn("prev_d", lag(col("d"), 1).over(w))
      .groupBy(col("symbol"), col("trade_date"))
      .agg(count(col("d")).as("n_rets"),
        sum(col("d").cast("decimal(38,0)") * col("d")).as("__rv"),
        sum(abs(col("d")).cast("decimal(38,0)") * abs(col("prev_d"))).as("__bv"))
      .select(col("symbol"), col("trade_date"), col("n_rets"),
        expr("cast(__rv as bigint)").as("rv_ticks2"),
        expr("cast(__bv as bigint)").as("bv_ticks2"),
        when(col("__rv") > 0, expr("cast((__bv * 1000000) div __rv as bigint)"))
          .as("bv_vs_rv_e6"))
  }

  /** B25 — Lee-Ready trade classification from the prevailing quote:
    * a trade above the quote midpoint is buyer-initiated, below is
    * seller-initiated, and AT the midpoint (or unquoted/stale) falls
    * back to the tick test with zero-tick carry — the last non-zero
    * price-change direction (Lee & Ready 1991's structure; their 5s
    * quote-delay adjustment is pre-decimalization lore and omitted).
    * Midpoint compares stay in integers: 2·px vs (bid + ask), no
    * halving. Aggregated per (symbol, trade_date): counts, volumes,
    * and signed net flow.
    *
    * Scale: the as-of join is day-bucketed (b23's posture); the tick
    * direction is one day-keyed window pass; classification is pure
    * projection. Same-day state only — books and tick state reset at
    * the open, matching OrderFlowStream's day-keyed streaming form.
    */
  def leeReady(silver: DataFrame, quotes: DataFrame,
               toleranceMs: Long = 600000L): DataFrame = {
    val trades = silver.select(col("symbol"), col("trade_date"), col("volume"),
      unix_micros(col("event_time")).as("t_us"),
      unix_millis(col("event_time")).as("t_ms"),
      ticksE4(col("price")).as("px_e4"))
    val joined = AsOfJoin.asOf(trades, quotes,
      keys = Seq("symbol", "trade_date"),
      leftTime = "t_ms", rightTime = "q_ms",
      rightPayload = Seq("bid_e4", "ask_e4"), prefix = "q_",
      toleranceMs = Some(toleranceMs))
    // Event-time order is total per (symbol, day): silver dedups on
    // (symbol, event_time), and t_us keeps microsecond resolution the
    // ms join stamp would truncate away.
    val w = Window.partitionBy(col("symbol"), col("trade_date")).orderBy(col("t_us"))
    val carry = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("mid2", col("q_bid_e4") + col("q_ask_e4"))
      .withColumn("tick_dir",
        last(nullif(signum(col("px_e4") - lag(col("px_e4"), 1).over(w)).cast("int"),
          lit(0)), ignoreNulls = true).over(carry))
      .withColumn("side",
        when(col("mid2").isNotNull && lit(2L) * col("px_e4") > col("mid2"), lit(1))
          .when(col("mid2").isNotNull && lit(2L) * col("px_e4") < col("mid2"), lit(-1))
          .otherwise(coalesce(col("tick_dir"), lit(0))))
      .groupBy(col("symbol"), col("trade_date"))
      .agg(count(lit(1)).as("n_trades"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("n_buy"),
        sum(when(col("side") === -1, 1L).otherwise(0L)).as("n_sell"),
        sum(when(col("side") === 0, 1L).otherwise(0L)).as("n_unclassified"),
        sum(when(col("side") === 1, col("volume")).otherwise(0L)).as("buy_vol"),
        sum(when(col("side") === -1, col("volume")).otherwise(0L)).as("sell_vol"))
      .withColumn("net_flow", col("buy_vol") - col("sell_vol"))
  }

  def spikeCounts(silver: DataFrame, n: Int = 20, z: Int = 3): DataFrame = {
    val w = bySymbolTime.rowsBetween(-(n - 1), Window.currentRow)
    silver
      .withColumn("px", ticksE4(col("price")))
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("s1", sum(col("px")).over(w))
      .withColumn("s2", sumSqDec(col("px"), w))
      .filter(col("cnt") === n)
      .withColumn("dev", col("cnt") * col("px") - col("s1"))
      .withColumn("spike",
        (col("dev").cast("decimal(19,0)") * col("dev")) >
          lit(z.toLong * z) * varNumDec(col("cnt"), col("s1"), col("s2")))
      .groupBy(col("symbol"), col("trade_date"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("spike"), 1L).otherwise(0L)).as("n_spikes"))
  }
}
