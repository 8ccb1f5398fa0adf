package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Sessions}

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val left = Seq(
    // (id, key, t, payload)
    (1L, "A", 100L, 10.0),
    (2L, "A", 200L, 20.0),
    (3L, "A", 50L, 5.0), // before any right row
    (4L, "B", 100L, 1.0)).toDF("id", "k", "t", "px")

  private val right = Seq(
    ("A", 80L, 800.0),
    ("A", 100L, 1000.0), // equal timestamp to left id=1
    ("A", 150L, 1500.0),
    ("C", 10L, 99.0)).toDF("k", "t", "bid")

  private def run(tol: Option[Long] = None) =
    AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("bid"), toleranceMs = tol)
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[java.lang.Double]("asof_bid")).map(_.toDouble),
         Option(r.getAs[java.lang.Long]("asof_time")).map(_.toLong))).toMap

  test("as-of picks latest right row at-or-before each left time") {
    val m = run()
    assert(m(1L) === (Some(1000.0), Some(100L))) // equal ts counts (at-or-before)
    assert(m(2L) === (Some(1500.0), Some(150L))) // latest prior, not first
    assert(m(3L) === (None, None))               // nothing before -> nulls
    assert(m(4L) === (None, None))               // key with no right rows
  }

  test("tolerance nulls out stale right rows") {
    // left t=200 matched 150; with tolerance 40ms the quote is stale.
    val m = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("bid"),
      toleranceMs = Some(40L))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Double]("asof_bid")).map(_.toDouble)).toMap
    assert(m(1L) === Some(1000.0)) // age 0 <= 40
    assert(m(2L) === None)         // age 50 > 40
  }

  test("as-of join preserves every left row exactly once") {
    assert(run().size === 4)
  }

  test("NULL payload field in the matched right row is NOT backfilled from an older row") {
    // Single-row ASOF semantics: the match at t=100 has bid=NULL, and
    // must surface that NULL — not blend bid=800 from the t=80 quote.
    val l = Seq((1L, "A", 120L)).toDF("id", "k", "t")
    val r = Seq(("A", 80L, Some(800.0), Some(10L)),
                ("A", 100L, None, Some(20L))).toDF("k", "t", "bid", "sz")
    val out = AsOfJoin.asOf(l, r, Seq("k"), "t", "t", Seq("bid", "sz")).collect().head
    assert(out.getAs[Any]("asof_bid") === null)      // matched row's NULL stands
    assert(out.getAs[Long]("asof_sz") === 20L)       // same matched row's non-null field
    assert(out.getAs[Long]("asof_time") === 100L)
  }

  test("session windows work in streaming mode with a watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
      .withColumn("event_time", col("ts").cast("timestamp"))
      .withWatermark("event_time", "1 hour")
    val q = Sessions.sessionStats(events, "user_id", "event_time", "value", "30 minutes")
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    mem.addData(
      ("u1", "2024-01-01 00:00:00", 1.0),
      ("u1", "2024-01-01 00:10:00", 2.0),
      ("u1", "2024-01-01 01:00:00", 4.0),
      // Advance the watermark far enough to close all sessions.
      ("u2", "2024-01-01 09:00:00", 8.0))
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sess_out").filter(col("user_id") === "u1")
      .orderBy("session_start_ms").collect()
    assert(closed.length === 2)
    assert(closed.head.getAs[Long]("n_events") === 2)
    assert(closed.head.getAs[Double]("sum_value") === 3.0)
  }

  test("a later micro-batch bridges two open sessions into one") {
    // The nontrivial streaming-session behavior: state MERGE across
    // micro-batches, not just accumulation into one open window.
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
      .withColumn("event_time", col("ts").cast("timestamp"))
      .withWatermark("event_time", "1 hour")
    val q = Sessions.sessionStats(events, "user_id", "event_time", "value", "30 minutes")
      .writeStream.format("memory").queryName("sess_merge_out").outputMode("append").start()
    // Batch 1: two sessions 50 minutes apart (gap 30m keeps them open
    // and separate).
    mem.addData(("u1", "2024-01-01 00:00:00", 1.0), ("u1", "2024-01-01 00:50:00", 2.0))
    q.processAllAvailable()
    // Batch 2: a bridge at 00:25 — within 30m of both — must merge
    // them into ONE session 00:00..01:20.
    mem.addData(("u1", "2024-01-01 00:25:00", 4.0))
    q.processAllAvailable()
    // Batch 3: advance the watermark far enough to close and emit.
    mem.addData(("u2", "2024-01-01 09:00:00", 8.0))
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sess_merge_out").filter(col("user_id") === "u1").collect()
    assert(closed.length === 1)
    assert(closed.head.getAs[Long]("n_events") === 3)
    assert(closed.head.getAs[Double]("sum_value") === 7.0)
    // Session tz is UTC; build the expected epoch tz-independently
    // (Timestamp.valueOf would use the JVM default zone).
    assert(closed.head.getAs[Long]("session_end_ms") ===
      java.time.Instant.parse("2024-01-01T01:20:00Z").toEpochMilli)
    // And it matches the batch run over the same events.
    val batch = Sessions.sessionStats(
      Seq(("u1", "2024-01-01 00:00:00", 1.0), ("u1", "2024-01-01 00:50:00", 2.0),
        ("u1", "2024-01-01 00:25:00", 4.0))
        .toDF("user_id", "ts", "value")
        .withColumn("event_time", col("ts").cast("timestamp")),
      "user_id", "event_time", "value", "30 minutes").collect()
    assert(batch.length === 1 && batch.head.getAs[Long]("n_events") === 3)
  }

  test("session windows merge within gap and split beyond it") {
    val events = Seq(
      ("u1", "2024-01-01 00:00:00", 1.0),
      ("u1", "2024-01-01 00:10:00", 2.0),  // within 30m -> same session
      ("u1", "2024-01-01 01:00:00", 4.0),  // 50m gap -> new session
      ("u2", "2024-01-01 00:00:00", 8.0))
      .toDF("user_id", "ts", "value")
      .withColumn("event_time", col("ts").cast("timestamp"))
    val out = Sessions.sessionStats(events, "user_id", "event_time", "value", "30 minutes")
      .orderBy("user_id", "session_start_ms").collect()
    assert(out.length === 3)
    val first = out.head
    assert(first.getAs[Long]("n_events") === 2)
    assert(first.getAs[Double]("sum_value") === 3.0)
    // end = last event (00:10) + gap (30m) = 00:40
    assert(first.getAs[Long]("session_end_ms") - first.getAs[Long]("session_start_ms")
      === 40L * 60000L)
  }
}
