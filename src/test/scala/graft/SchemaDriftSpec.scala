package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.sources.Tables

/** Schema-drift regression (the test that would have caught round 8
  * before the driver did): the same logical events data written under
  * the two physical `ts` encodings the testdata generator has produced
  * — epoch-nanos int64 (legacy TIMESTAMP(NANOS) surfaced via
  * nanosAsLong) and parquet timestamp[us] (TIMESTAMP_NTZ) — must read
  * through Tables.normalizeEventTime to IDENTICAL normalized frames,
  * and downstream queries (an a-family OHLCV aggregate and an x-family
  * events query) must produce row-identical results on both.
  */
class SchemaDriftSpec extends SparkSpecBase {
  import spark.implicits._

  // Micros timestamps over a few 5-minute windows, two event types,
  // including values that exercise sub-ms precision (non-zero micros).
  private val rows = Seq(
    (1L, 1705312800000001L, 10L, "view", 50.0, """{"k":"3"}"""),
    (2L, 1705312800123456L, 10L, "click", 51.5, """{"k":"4"}"""),
    (3L, 1705312937000000L, 11L, "view", 49.25, """{"k":"5"}"""),
    (4L, 1705313100999999L, 11L, "purchase", 52.0, """{"k":"2"}"""),
    (5L, 1705313400000000L, 12L, "view", 48.0, """{"k":"7"}"""),
    (6L, 1705316700500000L, 12L, "purchase", 53.75, """{"k":"1"}"""))

  private def base = rows.toDF("event_id", "ts_us_src", "user_id", "event_type", "value", "props")

  private lazy val dirs: (String, String) = {
    val root = Files.createTempDirectory("graft_drift").toString
    // Fixture 1: ts as plain int64 epoch-NANOS — byte-wise what the
    // legacy TIMESTAMP(NANOS) files look like to Spark under
    // nanosAsLong=true (the annotation only changes how the reader
    // surfaces the same int64 column, so LongType-with-nanos IS the
    // legacy read path normalizeEventTime sees).
    base.select(col("event_id"), (col("ts_us_src") * 1000).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$root/nanos/events.parquet")
    // Fixture 2: ts as TIMESTAMP_NTZ — written by Spark as parquet
    // timestamp[us] isAdjustedToUTC=false, the current testdata shape.
    base.select(col("event_id"),
        timestamp_micros(col("ts_us_src")).cast(TimestampNTZType).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$root/ntz/events.parquet")
    (s"$root/nanos", s"$root/ntz")
  }

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("fixtures read back with the two distinct physical ts types") {
    val tNanos = Tables.events(spark, dirs._1).schema("ts").dataType
    val tNtz = Tables.events(spark, dirs._2).schema("ts").dataType
    assert(tNanos === LongType, s"nanos fixture read as $tNanos")
    assert(tNtz === TimestampNTZType || tNtz === TimestampType,
      s"ntz fixture read as $tNtz")
  }

  test("normalizeEventTime yields identical (event_time, ts_us) on both encodings") {
    val n = Tables.eventsNorm(spark, dirs._1)
    val z = Tables.eventsNorm(spark, dirs._2)
    assert(n.schema("event_time").dataType === TimestampType)
    assert(z.schema("event_time").dataType === TimestampType)
    assert(n.schema("ts_us").dataType === LongType)
    assert(!n.columns.contains("ts") && !z.columns.contains("ts"),
      "raw ts must be dropped so no consumer can re-grow an encoding assumption")
    assert(collectSorted(n) === collectSorted(z))
    // And the values are right, not just equal: micros round-trip.
    assert(n.select("ts_us").as[Long].collect().sorted ===
      rows.map(_._2).sorted.toArray)
  }

  test("trades view is row-identical on both encodings") {
    assert(collectSorted(Tables.trades(spark, dirs._1)) ===
      collectSorted(Tables.trades(spark, dirs._2)))
    assert(Tables.trades(spark, dirs._1).count() === rows.size.toLong)
  }

  test("a-family OHLCV bars are row-identical on both encodings") {
    def bars(dir: String) = operators.Ohlcv.bars5m(Tables.trades(spark, dir))
    assert(collectSorted(bars(dirs._1)) === collectSorted(bars(dirs._2)))
    assert(bars(dirs._1).count() > 0)
  }

  test("x-family funnel and retention cohorts are row-identical on both encodings") {
    assert(collectSorted(ExtendedQueries.funnel(spark, dirs._1)) ===
      collectSorted(ExtendedQueries.funnel(spark, dirs._2)))
    assert(collectSorted(ExtendedQueries.retentionCohorts(spark, dirs._1)) ===
      collectSorted(ExtendedQueries.retentionCohorts(spark, dirs._2)))
    assert(ExtendedQueries.retentionCohorts(spark, dirs._1).count() > 0)
  }

  test("x39 markov transitions are row-identical on both encodings, rows sum to their from-state total") {
    val a = ExtendedQueries.markovTransitions(spark, dirs._1)
    val b = ExtendedQueries.markovTransitions(spark, dirs._2)
    assert(collectSorted(a) === collectSorted(b))
    val rowsA = a.collect()
    assert(rowsA.nonEmpty)
    // Per from_type: transition counts sum to n_from, and truncated
    // probabilities sum to at most 1e6 (short by < #successors).
    rowsA.groupBy(_.getAs[String]("from_type")).foreach { case (_, grp) =>
      assert(grp.map(_.getAs[Long]("n")).sum === grp.head.getAs[Long]("n_from"))
      val pSum = grp.map(_.getAs[Long]("p_e6")).sum
      assert(pSum <= 1000000L && pSum > 1000000L - grp.length)
    }
  }

  test("raw int64 ts in MICROS or SECONDS normalizes by magnitude, not by assumption") {
    // The next drift class after round 8: the generator switches the
    // int64 unit. Nanos-assumed arithmetic would read a micros column
    // 1000x off SILENTLY — magnitude probing must classify each band.
    val root = Files.createTempDirectory("graft_drift_units").toString
    base.select(col("event_id"), col("ts_us_src").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.parquet(s"$root/us/events.parquet")
    assert(collectSorted(Tables.eventsNorm(spark, s"$root/us")) ===
      collectSorted(Tables.eventsNorm(spark, dirs._2)))

    // Seconds-encoded fixture: compare against an NTZ fixture built
    // from the SAME second-truncated instants (sub-second precision is
    // gone from the source data itself, not lost by the reader).
    val secs = base.select(col("event_id"),
      expr("ts_us_src div 1000000").as("ts_s"), col("user_id"),
      col("event_type"), col("value"), col("props"))
    secs.select(col("event_id"), col("ts_s").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.parquet(s"$root/s/events.parquet")
    secs.select(col("event_id"),
        timestamp_seconds(col("ts_s")).cast(TimestampNTZType).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$root/s_ntz/events.parquet")
    assert(collectSorted(Tables.eventsNorm(spark, s"$root/s")) ===
      collectSorted(Tables.eventsNorm(spark, s"$root/s_ntz")))
  }

  test("an unsupported ts encoding fails fast with a readable message") {
    val bad = base.select(col("event_id"), col("ts_us_src").cast("string").as("ts"))
    val e = intercept[IllegalArgumentException] {
      Tables.normalizeEventTime(bad)
    }
    assert(e.getMessage.contains("unsupported physical type"))
  }

  // ------------------------------------------------------------------
  // JSON wire-schema evolution pins (r13 verdict item #2, sr19's
  // companion): which evolutions the from_json decode path TOLERATES
  // (null defaults — the BACKWARD-compatibility analog Schema Registry
  // enforces for the reference, register_schemas.py:122) vs which it
  // degrades on silently (type flips → per-FIELD null under Spark's
  // partial-results PERMISSIVE mode) vs how to make it REJECT loudly
  // (FAILFAST). sr19 executes the tolerated path across a checkpoint
  // restart; these pins are the full decision table.
  // ------------------------------------------------------------------

  private val wireV1 = org.apache.spark.sql.types.StructType.fromDDL(
    "symbol STRING, price DOUBLE, volume BIGINT")
  private val wireV2 = org.apache.spark.sql.types.StructType.fromDDL(
    "symbol STRING, price DOUBLE, volume BIGINT, exchange STRING")

  private def decode(reader: org.apache.spark.sql.types.StructType,
                     payloads: String*): Seq[org.apache.spark.sql.Row] =
    payloads.toSeq.toDF("value")
      .select(from_json(col("value"), reader).as("t")).select("t.*")
      .collect().toSeq

  test("evolution TOLERATED: reader ahead of data — absent nullable field reads as null") {
    val Seq(r) = decode(wireV2, """{"symbol":"A","price":1.5,"volume":10}""")
    assert(r.getString(0) === "A" && r.getDouble(1) === 1.5 && r.getLong(2) === 10L)
    assert(r.isNullAt(3), "absent field must default to null (BACKWARD)")
  }

  test("evolution TOLERATED: data ahead of reader — unknown field is ignored") {
    val Seq(r) = decode(wireV1,
      """{"symbol":"B","price":2.5,"volume":20,"exchange":"XN"}""")
    assert(r.getString(0) === "B" && r.getDouble(1) === 2.5 && r.getLong(2) === 20L)
  }

  test("evolution DEGRADED: a type flip nulls THAT FIELD, keeping the rest (partial results)") {
    // Spark 4's PERMISSIVE mode with partial results: the unparseable
    // field nulls, siblings survive — NOT a whole-row null (Spark 3)
    // and NOT an error. A silent null is a data-quality leak, hence
    // the loud count guard pattern pinned below.
    val Seq(r1, r2) = decode(wireV2,
      """{"symbol":"C","price":"oops","volume":30}""",
      """{"symbol":"D","price":3.5,"volume":"40"}""")
    assert(r1.getString(0) === "C" && r1.isNullAt(1) && r1.getLong(2) === 30L)
    // Numeric-as-string is NOT coerced either — "40" is a flip, not 40.
    assert(r2.getString(0) === "D" && r2.getDouble(1) === 3.5 && r2.isNullAt(2))
  }

  test("evolution REJECTED loudly: FAILFAST mode throws on the same type flip") {
    val e = intercept[Exception] {
      Seq("""{"symbol":"C","price":"oops","volume":30}""").toDF("value")
        .select(from_json(col("value"), wireV2,
          Map("mode" -> "FAILFAST")).as("t")).select("t.*")
        .collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgs.contains("FAILFAST") || msgs.contains("Malformed"), msgs)
  }

  test("the loud guard sr19-style pipelines should carry: required-field null count") {
    // The production posture for the DEGRADED case: decode PERMISSIVE
    // for throughput, then gate on null counts of contract-required
    // fields — this is Validation.split's shape, asserted here on the
    // decode output directly.
    val bad = decode(wireV2, """{"symbol":"C","price":"oops","volume":30}""",
      """{"symbol":"A","price":1.5,"volume":10}""")
      .count(r => r.isNullAt(1))
    assert(bad === 1, "the guard must see exactly the flipped row")
  }
}
