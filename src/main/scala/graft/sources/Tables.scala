package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampNTZType, TimestampType}

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
      // Older testdata generations carried TIMESTAMP(NANOS) parquet
      // timestamps, which Spark cannot read natively; with this flag
      // they surface as epoch-nanos longs and eventsNorm() converts
      // them. Current generations carry timestamp[us], which the flag
      // does not touch. Either physical encoding lands on the same
      // normalized view.
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

  /** Schema-drift-tolerant event-time normalization — THE single place
    * `ts` arithmetic lives (round-8 lesson: the driver regenerated the
    * testdata from TIMESTAMP(NANOS) to timestamp[us] and every scattered
    * `ts div 1000` site failed at analysis time; the reference survives
    * the same class of drift by delegating to Schema Registry BACKWARD
    * compat, register_schemas.py:122).
    *
    * Accepts any of the physical encodings a producer might hand us:
    *   - LongType           — a raw epoch integer. The UNIT is probed
    *                          from one non-null value: plausible event
    *                          epochs (1973–2100) occupy disjoint
    *                          magnitude bands ~250× apart per unit
    *                          (s ~1e8–4e9, ms ~1e11–4e12, µs ~1e14–
    *                          4e15, ns ~1e17–4e18), so seconds/millis/
    *                          micros/nanos are unambiguous — the
    *                          round-8 drift class (nanos → micros)
    *                          would otherwise be read 1000× off
    *                          SILENTLY, the one failure mode worse
    *                          than the analysis error it replaced.
    *                          `div` is integer long division — going
    *                          through double would lose precision
    *                          above 2^53 ns.
    *   - TimestampNTZType   — parquet timestamp[us] isAdjustedToUTC=false
    *                          (the current testdata). Sessions run UTC,
    *                          so the cast to TIMESTAMP is wall-clock
    *                          identity.
    *   - TimestampType      — parquet timestamp[us/ms] UTC-adjusted.
    * and emits the one canonical pair every consumer uses:
    *   event_time TIMESTAMP   — for windowing / calendar logic
    *   ts_us      BIGINT      — epoch micros, for ordinal comparisons
    *                            and exact integer arithmetic
    * The raw `ts` column is dropped so no downstream code can re-grow
    * an encoding assumption. All three branches are plain column
    * expressions — codegen'd, pushdown-transparent, zero extra passes.
    */
  def normalizeEventTime(df: DataFrame, tsCol: String = "ts"): DataFrame = {
    val normalized = df.schema(tsCol).dataType match {
      case LongType =>
        val toUs = probeEpochUnit(df, tsCol) match {
          case "s"  => col(tsCol) * 1000000L
          case "ms" => col(tsCol) * 1000L
          case "us" => col(tsCol)
          case "ns" => expr(s"$tsCol div 1000")
        }
        df.withColumn("ts_us", toUs)
          .withColumn("event_time", timestamp_micros(col("ts_us")))
      case TimestampType | TimestampNTZType =>
        df.withColumn("event_time", col(tsCol).cast(TimestampType))
          .withColumn("ts_us", unix_micros(col("event_time")))
      case other =>
        throw new IllegalArgumentException(
          s"events.$tsCol has unsupported physical type $other — expected " +
            "epoch-nanos BIGINT, TIMESTAMP, or TIMESTAMP_NTZ. The parquet " +
            "schema likely drifted; extend Tables.normalizeEventTime.")
    }
    // Canonical column order regardless of which branch ran (the two
    // withColumn chains append in different orders).
    val passthrough = df.columns.toIndexedSeq.filterNot(_ == tsCol).map(col)
    normalized.select(passthrough :+ col("event_time") :+ col("ts_us"): _*)
  }

  /** Infer the unit of a raw int64 epoch column from ONE non-null,
    * positive value — `limit(1)` touches a single row group, a
    * metadata-scale probe even on a 100 TB table, and every row of a
    * sanely-produced table carries the same unit. Thresholds sit at
    * the geometric gaps between the unit bands (which are ~250× wide
    * for 1973–2100 epochs), so any in-band value classifies
    * identically no matter which row the probe reads. An empty (or
    * all-null/zero) slice defaults to nanos — the legacy encoding —
    * which is vacuously correct on no rows.
    */
  private def probeEpochUnit(df: DataFrame, tsCol: String): String = {
    val sample = df.select(col(tsCol))
      .where(col(tsCol).isNotNull && col(tsCol) > 0L)
      .limit(1).collect()
    if (sample.isEmpty) "ns"
    else {
      val v = sample.head.getLong(0)
      if (v < 100000000000L) "s" // < 1e11
      else if (v < 100000000000000L) "ms" // < 1e14
      else if (v < 100000000000000000L) "us" // < 1e17
      else "ns"
    }
  }

  /** The events table with normalized time columns (see
    * normalizeEventTime): `event_time` + `ts_us` replace raw `ts`.
    */
  def eventsNorm(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTime(events(spark, dir))

  /** Canonical trade view: the batch analog of the reference's parsed
    * Kafka trade stream (transformations.py:51-83 — P1 JSON decode +
    * P2 event-time derivation). Mapping:
    *   symbol     <- event_type
    *   price      <- value
    *   volume     <- props JSON field "k"   (exercises from_json path)
    *   event_time <- normalized event time (micros resolution)
    *   trade_date <- to_date(event_time)    (P3 bronze date component)
    */
  def trades(spark: SparkSession, dir: String): DataFrame = {
    eventsNorm(spark, dir).select(
      col("event_id"),
      col("event_type").as("symbol"),
      col("value").as("price"),
      get_json_object(col("props"), "$.k").cast("long").as("volume"),
      col("event_time")
    ).withColumn("trade_date", to_date(col("event_time")))
  }
}
