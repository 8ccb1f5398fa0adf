package graft

import java.sql.{Date, Timestamp}
import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Medallion, Ohlcv}

/** The medallion definition exists twice by necessity: once as Scala
  * (Tables.trades → Medallion → Ohlcv) and once as DuckDB SQL (the
  * `SparkEntry.P` prelude every oracle reuses). This spec is the gate
  * that keeps the two texts semantically locked: it fails when EITHER
  * side changes alone.
  *
  *  - Side 1 (SQL text): every semantic constant of the prelude —
  *    rounding scale, quality filter, cutoff literal, dedup
  *    tie-break, window widths, the vwap_e6 integer chain, the
  *    trades-view column mapping — is pinned as a substring of `P`.
  *    Rewording the prelude without updating this spec fails here.
  *  - Side 2 (Scala behavior): the same constants are pinned as golden
  *    outputs of the actual operators over an adversarial micro-frame
  *    (half-way rounding, negative/zero volume, at/after-cutoff
  *    events, duplicate business keys, a truncating vwap). Editing
  *    Medallion/Ohlcv semantics without updating this spec fails here.
  *
  * A legitimate rule change must touch prelude + Scala + this spec
  * together — which is exactly the review surface we want (the r8
  * schema-drift post-mortem, BENCHNOTES.md).
  */
class MedallionContractSpec extends SparkSpecBase {
  import spark.implicits._

  // ---------------------------------------------------------------
  // Side 1: the DuckDB prelude text carries each semantic constant.
  // ---------------------------------------------------------------

  private val P = SparkEntry.P

  test("prelude: trades-view column mapping (events → trades)") {
    for (frag <- Seq(
      "event_type AS symbol",
      "value AS price",
      "json_extract_string(props, '$.k') AS BIGINT) AS volume",
      "ts AS event_time",
      "CAST(ts AS DATE) AS trade_date"))
      assert(P.contains(frag), s"prelude lost trades mapping fragment: $frag")
  }

  test("prelude: P4 normalization — ROUND scale 4 and ABS volume") {
    assert(P.contains("ROUND(price, 4) AS price"))
    assert(P.contains("ABS(volume) AS volume"))
  }

  test("prelude: F1 quality filter and the deterministic cutoff literal") {
    assert(P.contains("WHERE volume > 0 AND price > 0"))
    // The SQL cutoff must be the SAME constant the Scala side passes
    // to Medallion.toSilver (SparkEntry.CutoffTs).
    assert(P.contains(s"event_time <= TIMESTAMP '${SparkEntry.CutoffTs}'"),
      s"prelude cutoff drifted from SparkEntry.CutoffTs=${SparkEntry.CutoffTs}")
  }

  test("prelude: F2 dedup keeps the LOWEST event_id per (symbol, event_time)") {
    assert(P.contains(
      "QUALIFY ROW_NUMBER() OVER (PARTITION BY symbol, event_time ORDER BY event_id) = 1"))
  }

  test("prelude: gold window widths are 5m/1h epoch-aligned tumbling") {
    for (frag <- Seq("% 300000", "ws_ms + 300000", "% 3600000", "ws_ms + 3600000"))
      assert(P.contains(frag), s"prelude lost window-width fragment: $frag")
  }

  test("prelude: vwap_e6 integer chain — e4 ticks × 100, truncating //") {
    // price → DECIMAL(18,4) ticks ×1e4, pv summed exact, ×100 → e6,
    // floor-divided by volume. Any change to a scale factor here must
    // be mirrored in Ohlcv (pvTicks / finishBars) and vice versa.
    assert(P.contains("CAST(CAST(price AS DECIMAL(18,4)) * volume * 10000 AS BIGINT)"))
    assert(P.contains("* 100\n                  // SUM(volume) AS BIGINT) END AS vwap_e6")
      || P.replaceAll("\\s+", " ").contains("* 100 // SUM(volume) AS BIGINT) END AS vwap_e6"),
      "prelude lost the ×100 // SUM(volume) vwap chain")
    assert(P.contains("arg_min(price, event_time) AS open"))
    assert(P.contains("arg_max(price, event_time) AS close"))
  }

  test("CutoffTs and CutoffMs are the same instant (UTC)") {
    val iso = SparkEntry.CutoffTs.replace(' ', 'T') + "Z"
    assert(Instant.parse(iso).toEpochMilli === SparkEntry.CutoffMs)
  }

  // ---------------------------------------------------------------
  // Side 2: the Scala operators reproduce the same constants as
  // golden behavior on an adversarial micro-frame.
  // ---------------------------------------------------------------

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))
  private val d = Date.valueOf("2024-01-15")

  /** trades-shaped rows: every case targets one prelude constant. */
  private def microTrades: DataFrame = Seq(
    // rounding boundary: ROUND(…, 4) half-up on the decimal rendering
    (1L, "A", 1.23455, 10L, ts("2024-01-15T00:00:30Z"), d),
    // ABS(volume)
    (2L, "A", 2.0, -5L, ts("2024-01-15T00:00:31Z"), d),
    // dropped: volume 0 / price 0 / price < 0
    (3L, "A", 3.0, 0L, ts("2024-01-15T00:00:32Z"), d),
    (4L, "A", 0.0, 5L, ts("2024-01-15T00:00:33Z"), d),
    (5L, "A", -1.0, 5L, ts("2024-01-15T00:00:34Z"), d),
    // cutoff is INCLUSIVE (<=): at-cutoff kept, 1ms later dropped
    (6L, "A", 4.0, 1L, ts("2024-02-01T00:00:00Z"), Date.valueOf("2024-02-01")),
    (7L, "A", 5.0, 1L, ts("2024-02-01T00:00:00.001Z"), Date.valueOf("2024-02-01")),
    // duplicate (symbol, event_time): survivor = LOWEST event_id (8)
    (9L, "A", 9.0, 1L, ts("2024-01-15T00:01:00Z"), d),
    (8L, "A", 8.0, 1L, ts("2024-01-15T00:01:00Z"), d),
    // vwap window for symbol V: one 5m bar with truncating division
    (20L, "V", 1.0000, 1L, ts("2024-01-15T00:00:10Z"), d),
    (21L, "V", 1.0001, 2L, ts("2024-01-15T00:02:00Z"), d),
    // exact 00:05:00 boundary → belongs to the SECOND window
    (22L, "V", 2.0, 1L, ts("2024-01-15T00:05:00Z"), d)
  ).toDF("event_id", "symbol", "price", "volume", "event_time", "trade_date")

  private def silver: DataFrame =
    Medallion.dedupAgg(
      Medallion.toSilver(microTrades, lit(SparkEntry.CutoffTs).cast("timestamp")),
      payloadCols = Seq("price", "volume", "trade_date"))

  test("scala: quality filter, rounding, abs, inclusive cutoff, dedup survivor") {
    val rows = silver.select("event_id", "symbol", "price", "volume")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows === Seq(
      (1L, "A", 1.2346, 10L),   // ROUND half-up at the 5 boundary
      (2L, "A", 2.0, 5L),       // ABS(-5)
      (6L, "A", 4.0, 1L),       // event_time == cutoff kept
      (8L, "A", 8.0, 1L),       // lowest-event_id survivor of the dup
      (20L, "V", 1.0, 1L),
      (21L, "V", 1.0001, 2L),
      (22L, "V", 2.0, 1L)))
    // ids 3,4,5 (quality), 7 (past cutoff), 9 (dup loser) are gone.
  }

  test("scala: gold 5m — epoch-aligned width, ordered open/close, truncating vwap_e6") {
    val bars = Ohlcv.bars5m(silver.filter(col("symbol") === "V"))
      .select("window_start", "window_end", "open", "close", "volume", "trade_count", "vwap_e6")
      .collect().sortBy(_.getTimestamp(0).getTime)
    assert(bars.length === 2)
    val b0 = bars(0)
    assert(b0.getTimestamp(0) === ts("2024-01-15T00:00:00Z")) // aligned to 300000 ms
    assert(b0.getTimestamp(1) === ts("2024-01-15T00:05:00Z"))
    assert(b0.getDouble(2) === 1.0)      // open = earliest event_time
    assert(b0.getDouble(3) === 1.0001)   // close = latest event_time
    assert(b0.getLong(4) === 3L && b0.getLong(5) === 2L)
    // pv_ticks = 10000·1 + 10001·2 = 30002; ×100 = 3000200; div 3
    // TRUNCATES (no rounding) → 1000066, exactly like DuckDB's //.
    assert(b0.getLong(6) === 1000066L)
    val b1 = bars(1)
    assert(b1.getTimestamp(0) === ts("2024-01-15T00:05:00Z")) // boundary row rolls forward
    assert(b1.getLong(6) === 2000000L)
  }
}
