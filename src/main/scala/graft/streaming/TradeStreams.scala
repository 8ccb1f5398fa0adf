package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming side of the engine: sources, JSON parsing, watermarking,
  * streaming dedup — the operators the reference wires in
  * spark_processor.py:135-183 (S1, P1, P2, A5, F2).
  *
  * Every transform is a pure DataFrame -> DataFrame function shared
  * with the batch path, so the duckdb-oracle-checked batch semantics
  * are exactly what streams execute (SURVEY.md §7.1).
  */
object TradeStreams {

  /** TRADE_SCHEMA (reference transformations.py:25-32), with
    * `conditions` as array<string> per the Avro contract
    * (trade.avsc:28-34; the reference's string-typed Spark schema is a
    * declared-vs-used bug we fix — SURVEY.md §7.5.5).
    */
  val tradeSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("price", DoubleType),
    StructField("volume", LongType),
    StructField("timestamp", LongType),
    StructField("conditions", ArrayType(StringType)),
    StructField("ingestion_time", LongType)))

  /** S1 — Kafka streaming scan (read_from_kafka,
    * spark_processor.py:116-133): subscribe, latest offsets, tolerate
    * data loss. Returns the raw (key, value, ...) frame.
    */
  def kafkaSource(spark: SparkSession, bootstrap: String, topic: String,
                  startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("failOnDataLoss", "false")
      .load()

  /** File-based streaming source over a parquet directory — the test
    * and replay path (SURVEY.md S2: the WebSocket producer is outside
    * the engine; tests use file/memory streams).
    */
  def fileSource(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** P1 — JSON decode against the fixed schema: value bytes -> string
    * -> from_json -> flatten (parse_kafka_value,
    * transformations.py:51-66).
    */
  def parseKafkaValue(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"), tradeSchema).as("trade"))
      .select(col("trade.*"))

  /** P2 — event-time derivation: epoch-ms -> timestamp
    * (parse_with_event_time, transformations.py:69-83).
    */
  def withEventTime(parsed: DataFrame): DataFrame =
    parsed.withColumn("event_time", to_timestamp(col("timestamp") / 1000))

  /** P1+P2 composed — the entry transform of the consumer. */
  def parseTrades(raw: DataFrame): DataFrame = withEventTime(parseKafkaValue(raw))

  /** Typed form: the parsed stream as Dataset[Trade] (compile-time
    * field checks downstream; graft.model mirrors the Avro contract).
    */
  def parseTradesTyped(spark: SparkSession, raw: DataFrame): org.apache.spark.sql.Dataset[graft.model.Trade] = {
    import spark.implicits._
    parseTrades(raw)
      .select(col("symbol"), col("price"), col("volume"), col("timestamp"),
        col("conditions"), col("event_time"))
      .as[graft.model.Trade]
  }

  /** A5 — watermark: late events beyond `delay` are dropped from
    * stateful ops (apply_watermark, transformations.py:211-224;
    * default 10 minutes, spark_processor.py:45).
    */
  def withWatermark(df: DataFrame, delay: String = "10 minutes"): DataFrame =
    df.withWatermark("event_time", delay)

  /** F2 (streaming) — dedup on the business key with state bounded by
    * the watermark. `dropDuplicatesWithinWatermark` evicts keys older
    * than the watermark, so state is O(traffic within the lateness
    * window) instead of unbounded — the difference between a demo and
    * something that survives weeks of uptime (SURVEY.md §7.5.2).
    */
  def dedupWithinWatermark(df: DataFrame): DataFrame =
    df.dropDuplicatesWithinWatermark(Seq("symbol", "timestamp"))

  /** F1 (streaming form) — silver filter with the wall-clock
    * future-event guard the reference uses (to_silver,
    * transformations.py:114-137). `current_timestamp()` in streaming
    * is micro-batch evaluation time (SURVEY.md §7.5.3).
    */
  def toSilverStreaming(df: DataFrame): DataFrame =
    df.withColumn("price", round(col("price"), 4))
      .withColumn("volume", abs(col("volume")))
      .filter(col("volume") > 0 && col("price") > 0 &&
        col("event_time") <= current_timestamp() + expr("INTERVAL 5 MINUTES"))
}
