package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Serving-side query surface — the CQL queries Grafana/alerts/client
  * API issue against the reference's Cassandra tables (Q1-Q12,
  * SURVEY.md §2.6; grafana/dashboards/market-data-main.json,
  * src/storage/cassandra_client.py:159-225), re-expressed as batch
  * DataFrame functions over the silver/gold outputs.
  *
  * Every function keeps the filter leading so Catalyst pushes it into
  * the parquet scan (partition pruning on trade_date when the store is
  * date-partitioned — the Spark analog of Cassandra's (symbol, date)
  * partition key, SURVEY.md §4.1).
  */
object MarketQueries {

  /** Q1 — count of silver trades for a day. */
  def countForDay(silver: DataFrame, day: String): DataFrame =
    silver.filter(col("trade_date") === lit(day).cast("date"))
      .agg(count(lit(1)).as("n_trades"))

  /** Q2 — total 5m-bar volume for a day. */
  def volumeForDay(gold5m: DataFrame, day: String): DataFrame =
    gold5m.filter(to_date(col("window_start")) === lit(day).cast("date"))
      .agg(sum(col("volume")).as("total_volume"))

  /** Q3 — freshest bar for a day (pipeline-liveness probe). */
  def maxWindowForDay(gold5m: DataFrame, day: String): DataFrame =
    gold5m.filter(to_date(col("window_start")) === lit(day).cast("date"))
      .agg(max(unix_millis(col("window_start"))).as("max_window_start_ms"))

  /** Q4 — OHLCV candles: newest-first top-k for one symbol+day.
    * Catalyst turns orderBy+limit into TakeOrderedAndProject — no full
    * sort, per-partition top-k then a single-reducer merge of k rows.
    */
  def candles(gold5m: DataFrame, symbol: String, day: String, k: Int): DataFrame =
    gold5m.filter(col("symbol") === symbol &&
        to_date(col("window_start")) === lit(day).cast("date"))
      .select(unix_millis(col("window_start")).as("window_start_ms"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
      .orderBy(col("window_start_ms").desc)
      .limit(k)

  /** Q5 — total volume by symbol. */
  def volumeBySymbol(gold5m: DataFrame): DataFrame =
    gold5m.groupBy(col("symbol")).agg(sum(col("volume")).as("total_volume"))

  /** Q6 — total trade count by symbol. */
  def tradeCountBySymbol(gold5m: DataFrame): DataFrame =
    gold5m.groupBy(col("symbol")).agg(sum(col("trade_count")).as("total_trades"))

  /** Q7 — latest-prices scan is LatestPrices.snapshot itself. */

  /** Q8 — latest N raw trades for a symbol+day (newest-first;
    * clustering DESC analog). event_id tie-break keeps the top-k
    * reproducible.
    */
  def latestTrades(silver: DataFrame, symbol: String, day: String, n: Int): DataFrame =
    silver.filter(col("symbol") === symbol &&
        col("trade_date") === lit(day).cast("date"))
      .select(col("event_id"), col("symbol"), col("price"), col("volume"),
        unix_millis(col("event_time")).as("event_time_ms"))
      .orderBy(col("event_time_ms").desc, col("event_id").desc)
      .limit(n)

  /** Q9 — per-day OHLCV fetch with a date-range variant. */
  def ohlcvRange(gold: DataFrame, symbol: String, from: String, to: String): DataFrame =
    gold.filter(col("symbol") === symbol &&
        to_date(col("window_start")).between(lit(from).cast("date"), lit(to).cast("date")))
      .select(unix_millis(col("window_start")).as("window_start_ms"),
        col("open"), col("high"), col("low"), col("close"), col("volume"),
        col("trade_count"), col("vwap_e6"))

  /** Q10 — average latency analog: mean seconds-into-day of the
    * event_time over one day's silver rows (the reference computes
    * AVG(processed_at - trade_timestamp); processed_at is wall clock,
    * so the deterministic batch analog measures against midnight).
    * Sum of longs (exact, associative) divided once — no
    * float-accumulation ordering sensitivity at any parallelism.
    */
  def avgSecondsIntoDay(silver: DataFrame, day: String): DataFrame =
    silver.filter(col("trade_date") === lit(day).cast("date"))
      .agg(
        round(
          (sum(unix_millis(col("event_time")) - unix_millis(col("trade_date").cast("timestamp")))
            / count(lit(1)) / 1000.0), 6).as("avg_seconds_into_day"))

  /** Q11 — secondary-index analog: price-band filter, grouped. Spark
    * needs no index — the predicate pushes into the parquet scan
    * (min/max row-group skipping).
    */
  def priceBand(silver: DataFrame, lo: Double, hi: Double): DataFrame =
    silver.filter(col("price").between(lo, hi))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_trades"),
        round(min(col("price")), 4).as("min_price"),
        round(max(col("price")), 4).as("max_price"))

  /** Q12 — keyspace/table health check (smoke_test.py:75-100 analog):
    * every store table with its row count, as one unioned plan. Counts
    * are metadata-cheap for parquet (footer row counts; Spark's
    * aggregate pushdown short-circuits the scan).
    */
  def catalogSummary(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.sources.Tables.tableNames.map { n =>
      graft.sources.Tables.table(spark, dir, n)
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(n).as("table_name"), col("n_rows"))
    }.reduce(_ unionByName _)
}
