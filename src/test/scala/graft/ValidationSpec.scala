package graft

import org.apache.spark.sql.functions._

import graft.operators.{Medallion, Validation}

/** Mirrors the reference's validator unit tests
  * (tests/unit/test_validator.py — zero volume, negative price,
  * missing fields, future timestamps, sec->ms normalization;
  * FIXTURES.md §3).
  */
class ValidationSpec extends SparkSpecBase {
  import spark.implicits._

  private val maxMs = 1706745600000L // 2024-02-01T00:00:00Z

  private def tradesDf(rows: Seq[(Long, String, java.lang.Double, java.lang.Long, String)]) =
    rows.toDF("event_id", "symbol", "price", "volume", "ts")
      .withColumn("event_time", col("ts").cast("timestamp")).drop("ts")

  test("zero volume is rejected; valid row passes") {
    val df = tradesDf(Seq(
      (1L, "AAPL", 150.25, 100L, "2024-01-15 10:00:00"),
      (2L, "AAPL", 150.25, 0L, "2024-01-15 10:00:01")))
    val v = Validation.validate(df, maxMs)
    val byId = v.collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Boolean]("is_valid")).toMap
    assert(byId(1L) === true)
    assert(byId(2L) === false)
  }

  test("zero volume accepted when the toggle is off") {
    val df = tradesDf(Seq((2L, "AAPL", 150.25, 0L, "2024-01-15 10:00:01")))
    val v = Validation.validate(df, maxMs, filterZeroVolume = false)
    assert(v.collect().head.getAs[Boolean]("is_valid") === true)
  }

  test("negative price and out-of-range price are rejected with reasons") {
    val df = tradesDf(Seq(
      (1L, "A", -10.0, 10L, "2024-01-15 10:00:00"),
      (2L, "A", 2000000.0, 10L, "2024-01-15 10:00:00")))
    val v = Validation.validate(df, maxMs).collect()
    v.foreach { r =>
      assert(!r.getAs[Boolean]("is_valid"))
      assert(r.getSeq[String](r.fieldIndex("errors")).contains("price_out_of_range"))
    }
  }

  test("missing fields collect all applicable reasons") {
    val df = tradesDf(Seq((1L, null, null, null, "2024-01-15 10:00:00")))
    val row = Validation.validate(df, maxMs).collect().head
    val errs = row.getSeq[String](row.fieldIndex("errors"))
    assert(errs.toSet === Set("missing_symbol", "missing_price", "missing_volume"))
  }

  test("future timestamps beyond the skew bound are rejected") {
    val df = tradesDf(Seq((1L, "A", 10.0, 10L, "2024-03-01 00:00:00")))
    val row = Validation.validate(df, maxMs).collect().head
    assert(row.getSeq[String](row.fieldIndex("errors")) === Seq("future_timestamp"))
  }

  test("symbol longer than 10 chars is a WARNING, not an error (validator.py parity)") {
    val df = tradesDf(Seq((1L, "ABCDEFGHIJK", 10.0, 10L, "2024-01-15 10:00:00")))
    val row = Validation.validate(df, maxMs).collect().head
    assert(row.getAs[Boolean]("is_valid") === true)
    assert(row.getSeq[String](row.fieldIndex("errors")).isEmpty)
    // (Jan 15 is also > 1 day before the synthetic Feb 1 "now".)
    assert(row.getSeq[String](row.fieldIndex("warnings"))
      === Seq("symbol_too_long", "stale_timestamp"))
  }

  test("price below min and stale timestamp warn; row stays valid") {
    val df = tradesDf(Seq(
      (1L, "A", 0.00001, 10L, "2024-01-15 10:00:00"), // below MinPrice, >= 0
      (2L, "A", 10.0, 10L, "2023-12-01 00:00:00")))   // > 1 day before "now"
    val rows = Validation.validate(df, maxMs).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Boolean]("is_valid"), r.getSeq[String](r.fieldIndex("warnings")))).toMap
    assert(rows(1L) === (true, Seq("price_below_min", "stale_timestamp")))
    assert(rows(2L) === (true, Seq("stale_timestamp")))
  }

  test("rateMetrics reports totals and exact micro-unit valid rate") {
    val df = tradesDf(Seq(
      (1L, "A", 10.0, 10L, "2024-01-15 10:00:00"),
      (2L, "A", 10.0, 0L, "2024-01-15 10:00:00"),
      (3L, "A", -1.0, 10L, "2024-01-15 10:00:00")))
    val r = Validation.rateMetrics(Validation.validate(df, maxMs)).collect().head
    assert(r.getAs[Long]("total") === 3L)
    assert(r.getAs[Long]("valid") === 1L)
    assert(r.getAs[Long]("invalid") === 2L)
    assert(r.getAs[Long]("valid_rate_e6") === 333333L) // floor(1e6/3)
    // Empty input mirrors the reference's 100% convention.
    val empty = Validation.rateMetrics(Validation.validate(df.limit(0), maxMs)).collect().head
    assert(empty.getAs[Long]("valid_rate_e6") === 1000000L)
  }

  test("seconds-vs-millis heuristic scales small epochs (F4)") {
    val df = Seq((1L, 1706684400L), (2L, 1706684400000L)).toDF("id", "t")
    val out = Validation.normalizeEpochMs(df).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("timestamp_ms")).toMap
    assert(out(1L) === 1706684400000L)
    assert(out(2L) === 1706684400000L)
  }

  test("split() routes valid and invalid branches (K5 dead letters)") {
    val df = tradesDf(Seq(
      (1L, "A", 10.0, 10L, "2024-01-15 10:00:00"),
      (2L, "A", -1.0, 10L, "2024-01-15 10:00:00")))
    val (valid, dead) = Validation.split(Validation.validate(df, maxMs))
    assert(valid.count() === 1 && dead.count() === 1)
    assert(!valid.columns.contains("errors"))
    assert(dead.columns.contains("errors"))
  }

  test("metrics counts reasons and valid rows") {
    val df = tradesDf(Seq(
      (1L, "A", 10.0, 10L, "2024-01-15 10:00:00"),
      (2L, "A", 10.0, 0L, "2024-01-15 10:00:00"),
      (3L, "A", 10.0, 0L, "2024-01-15 10:00:00")))
    val m = Validation.metrics(Validation.validate(df, maxMs)).collect()
      .map(r => r.getAs[String]("reason") -> r.getAs[Long]("n")).toMap
    assert(m === Map("valid" -> 1L, "zero_volume" -> 2L))
  }

  test("dedup keeps the lowest event_id per (symbol, event_time)") {
    val df = tradesDf(Seq(
      (5L, "A", 10.0, 10L, "2024-01-15 10:00:00"),
      (3L, "A", 11.0, 10L, "2024-01-15 10:00:00"),
      (7L, "B", 12.0, 10L, "2024-01-15 10:00:00")))
    val kept = Medallion.dedup(df).collect().map(_.getAs[Long]("event_id")).toSet
    assert(kept === Set(3L, 7L))
  }

  test("aggregate-form dedup returns the same surviving rows as the window form") {
    val df = tradesDf(Seq(
      (5L, "A", 10.0, 10L, "2024-01-15 10:00:00"),
      (3L, "A", 11.0, 20L, "2024-01-15 10:00:00"),
      (9L, "A", 12.0, 30L, "2024-01-15 10:00:05"),
      (7L, "B", 12.0, 40L, "2024-01-15 10:00:00")))
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select("event_id", "symbol", "price", "volume")
      .collect().map(_.toSeq).toSet
    assert(rows(Medallion.dedupAgg(df)) === rows(Medallion.dedup(df)))
    // Survivor payload comes from the lowest-id row, not a mix.
    val a = Medallion.dedupAgg(df).filter(col("symbol") === "A" &&
      col("event_id") === 3L).collect().head
    assert(a.getAs[Double]("price") === 11.0 && a.getAs[Long]("volume") === 20L)
  }
}
