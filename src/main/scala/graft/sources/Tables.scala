package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Table loaders over the driver-provided parquet test data
  * (TESTDATA.md), plus the canonical "trades" view that maps the
  * `events` stream table onto the reference's trade-event schema
  * (reference: src/consumer/transformations.py:25-32, the TRADE_SCHEMA
  * of duckonthemic/Real-Time-Financial-Market-Data-Pipeline).
  *
  * Scale note: every loader is a plain parquet scan — Catalyst pushes
  * filters/column pruning into the scan, so downstream operators keep
  * working unchanged when the directory points at a 100 TB partitioned
  * table instead of a single test file.
  */
object Tables {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // The events table carries TIMESTAMP(NANOS) parquet timestamps,
      // which Spark does not support natively; read them as epoch-nanos
      // longs and convert explicitly (see trades()).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** The documents schema, for non-parquet ingestion paths. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** JSONL document corpus — the format web-scale text corpora
    * actually arrive in (one JSON object per line, possibly gzipped;
    * Spark's json source handles .gz transparently and splits plain
    * files by line). The schema is passed explicitly: schema inference
    * would scan the corpus once BEFORE the real read — at 100 TB that
    * is a full extra pass, and a heterogeneous corpus would widen
    * types under you. Unparseable lines surface in
    * `_corrupt_record`-free PERMISSIVE mode as all-null rows; pass
    * `strict = true` to fail fast instead (FAILFAST).
    */
  def documentsJsonl(spark: SparkSession, path: String,
                     strict: Boolean = false): DataFrame =
    spark.read
      .schema(documentsSchema)
      .option("mode", if (strict) "FAILFAST" else "PERMISSIVE")
      .json(path)

  /** Canonical trade view: the batch analog of the reference's parsed
    * Kafka trade stream (transformations.py:51-83 — P1 JSON decode +
    * P2 event-time derivation). Mapping:
    *   symbol     <- event_type
    *   price      <- value
    *   volume     <- props JSON field "k"   (exercises from_json path)
    *   event_time <- ts (epoch nanos -> microsecond timestamp)
    *   trade_date <- to_date(event_time)    (P3 bronze date component)
    *
    * `ts div 1000` is integer division on longs — going through double
    * would lose precision above 2^53 ns (~1970+104 days).
    */
  def trades(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir).select(
      col("event_id"),
      col("event_type").as("symbol"),
      col("value").as("price"),
      get_json_object(col("props"), "$.k").cast("long").as("volume"),
      expr("timestamp_micros(ts div 1000)").as("event_time")
    ).withColumn("trade_date", to_date(col("event_time")))
  }
}
