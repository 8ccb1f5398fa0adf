package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Medallion, Ohlcv}
import graft.sources.Tables
import graft.streaming.TradeStreams

/** The engine's central design property (SURVEY.md §7.1): the same
  * Dataset->Dataset operators run in batch and streaming. This spec
  * replays the real sf0.001 events through the streaming graph (file
  * source -> parse -> silver -> gold) and asserts the emitted bars are
  * row-identical to the batch pipeline over the same data.
  */
class BatchStreamEquivalenceSpec extends SparkSpecBase {

  test("streaming gold bars equal batch gold bars on real data") {
    val dir = Files.createTempDirectory("graft_equiv").toString

    // Kafka-shaped JSON replay input from the real events table.
    Tables.events(spark, Sf).select(
      to_json(struct(
        col("event_type").as("symbol"),
        col("value").as("price"),
        get_json_object(col("props"), "$.k").cast("long").as("volume"),
        expr("ts div 1000000").as("timestamp"),
        array().cast("array<string>").as("conditions"),
        expr("ts div 1000000").as("ingestion_time"))).as("value"))
      .write.parquet(s"$dir/in")

    // Streaming path: the production graph.
    val raw = spark.readStream.schema("value STRING").parquet(s"$dir/in")
    val trades = TradeStreams.parseTrades(raw).withColumn("event_id", col("timestamp"))
    val silver = TradeStreams.dedupWithinWatermark(
      TradeStreams.withWatermark(TradeStreams.toSilverStreaming(trades)))
    val q = Ohlcv.bars5m(silver)
      .writeStream.format("memory").queryName("equiv_bars").outputMode("update").start()
    q.processAllAvailable(); q.stop()

    def key(r: org.apache.spark.sql.Row) = (
      r.getAs[String]("symbol"), r.getAs[java.sql.Timestamp]("window_start").getTime,
      r.getAs[Double]("open"), r.getAs[Double]("high"), r.getAs[Double]("low"),
      r.getAs[Double]("close"), r.getAs[Long]("volume"),
      r.getAs[Long]("trade_count"), r.getAs[Long]("vwap_e6"))
    val streamed = spark.table("equiv_bars").collect().map(key).toSet

    // Batch path over the same events. The streaming side collapsed
    // ms-truncated timestamps, so feed batch the same ms-granularity
    // trades (the streaming wire format is epoch-ms by contract).
    val batchTrades = Tables.events(spark, Sf).select(
      col("event_type").as("symbol"),
      col("value").as("price"),
      get_json_object(col("props"), "$.k").cast("long").as("volume"),
      expr("timestamp_millis(ts div 1000000)").as("event_time"))
      .withColumn("event_id", unix_millis(col("event_time")))
    val batch = Ohlcv.bars5m(Medallion.dedupAgg(
        Medallion.clean(batchTrades)
          .filter(col("volume") > 0 && col("price") > 0),
        payloadCols = Seq("price", "volume")))
      .collect().map(key).toSet

    assert(streamed === batch,
      s"streaming-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
    assert(streamed.nonEmpty)
  }
}
