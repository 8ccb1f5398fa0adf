package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Quote-stream handling — the reference REGISTERS a quote schema and
  * provisions a `quotes_raw` topic but never consumes either
  * (schemas/avro/quote.avsc, producer/config.py:38; SURVEY.md §1.1
  * "declared, unused downstream"). This module is what consuming it
  * looks like: parse, derive spread metrics, and join to trades with
  * the as-of operator.
  */
object QuoteStreams {

  /** quote.avsc:1-43 — bid/ask price+size, epoch-ms timestamp. */
  val quoteSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("bid_price", DoubleType),
    StructField("bid_size", LongType),
    StructField("ask_price", DoubleType),
    StructField("ask_size", LongType),
    StructField("timestamp", LongType)))

  /** P1 analog for quotes: JSON value bytes -> typed quote rows with
    * event time.
    */
  def parseQuotes(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"), quoteSchema).as("q"))
      .select(col("q.*"))
      .withColumn("event_time", to_timestamp(col("timestamp") / 1000))

  /** Avro form over the registered quote contract
    * (TradeStreams.quoteAvroSchema; includes the avsc's
    * ingestion_time field, which the JSON path's schema omits).
    */
  def parseQuotesAvro(raw: DataFrame): DataFrame =
    raw.select(graft.functions.AvroFunctions
        .fromAvro(col("value"), TradeStreams.quoteAvroSchema).as("q"))
      .select(col("q.*"))
      .withColumn("event_time", to_timestamp(col("timestamp") / 1000))

  /** Derived quote analytics: mid price, absolute and relative spread,
    * book imbalance — all per-row codegen'd arithmetic.
    */
  def withSpreadMetrics(quotes: DataFrame): DataFrame =
    quotes
      .withColumn("mid", (col("bid_price") + col("ask_price")) / 2)
      .withColumn("spread", col("ask_price") - col("bid_price"))
      .withColumn("spread_bps",
        when(col("mid") > 0, (col("ask_price") - col("bid_price")) / col("mid") * 10000))
      .withColumn("imbalance",
        when(col("bid_size") + col("ask_size") > 0,
          (col("bid_size") - col("ask_size")).cast("double") /
            (col("bid_size") + col("ask_size"))))

  /** Stream-stream interval join: each trade joined with every quote
    * for its symbol in the lookback window — the real-time form of
    * trade-quote alignment. Both sides must be watermarked; Spark
    * bounds the join state to (watermark + lookback), so state is
    * O(traffic in the window), not O(stream history).
    */
  def streamStreamQuoteJoin(trades: DataFrame, quotes: DataFrame,
                            lookback: String = "5 minutes"): DataFrame = {
    val t = trades.select(col("symbol"), col("price"),
      col("event_time").as("trade_time"))
    val q = quotes.select(col("symbol").as("q_symbol"),
      col("bid_price"), col("ask_price"), col("event_time").as("quote_time"))
    t.join(q,
      col("symbol") === col("q_symbol") &&
        col("quote_time") >= col("trade_time") - expr(s"INTERVAL $lookback") &&
        col("quote_time") <= col("trade_time"))
      .drop("q_symbol")
  }

  /** Trade enriched with the prevailing quote (at-or-before) — the
    * canonical trade-quote alignment, built on AsOfJoin.
    */
  def tradesWithPrevailingQuote(trades: DataFrame, quotes: DataFrame,
                                toleranceMs: Option[Long] = None): DataFrame =
    graft.operators.AsOfJoin.asOf(
      trades, quotes.select(col("symbol"), col("event_time"),
        col("bid_price"), col("ask_price")),
      keys = Seq("symbol"), leftTime = "event_time", rightTime = "event_time",
      rightPayload = Seq("bid_price", "ask_price"),
      prefix = "quote_", toleranceMs = toleranceMs)
}
