package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Ohlcv

/** Pins the EXACT late-data semantics sr11's oracle encodes (r11
  * verdict item #2), then checks the production replay against an
  * independent Spark-side implementation of those semantics at
  * sf0.001.
  *
  * The controlled tests distinguish the candidate behaviors with
  * single rows:
  *  - drop is WINDOW-based, not event-time-based: a row older than the
  *    watermark whose window is still open must survive;
  *  - drop boundary is `window_end <= watermark` (inclusive);
  *  - append-mode emission boundary is `window_end <= final watermark`
  *    (inclusive);
  *  - the late-record filter uses the PREVIOUS batch's eviction
  *    watermark (SPARK-40925's lateEvents/eviction split): with
  *    interleaved no-data batches (steady-state ProcessingTime) the
  *    two coincide, but under AvailableNow's back-to-back catch-up
  *    batches the filter LAGS one batch — batch N's input is filtered
  *    with the watermark batch N−1 evicted with. Found empirically
  *    this round: a two-slice design dropped NOTHING because slice 1
  *    was filtered with watermark 0.
  * If Spark ever changes any of these, this suite fails before the
  * oracle does, with a message naming the semantic that moved.
  */
class LateDataReplaySpec extends SparkSpecBase {
  import spark.implicits._

  private val H = 1705312800000L // 2024-01-15 10:00:00 UTC

  private def at(mmss: String): Long = { // "MM:SS" offset from 10:00:00
    val Array(m, s) = mmss.split(":").map(_.toInt)
    H + (m * 60 + s) * 1000L
  }

  test("watermark drop/emit boundaries: window-based, inclusive on both sides") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double, Long, Long)]
    val in = mem.toDF().toDF("event_id", "symbol", "price", "volume", "ts_ms")
      .select(col("event_id"), col("symbol"), col("price"), col("volume"),
        timestamp_millis(col("ts_ms")).as("event_time"))
      .withWatermark("event_time", "7 minutes")
    val out = Files.createTempDirectory("graft_latesem").toString
    val q = Ohlcv.bars5m(in)
      .select(col("symbol"), unix_millis(col("window_start")).as("ws_ms"),
        col("trade_count"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$out/ckpt")
      .format("parquet").option("path", s"$out/data")
      .start()

    // Batch 0: max 10:30 -> watermark for batch 1 = 10:23 (NOT
    // 5m-aligned, so a window can SPAN it).
    mem.addData(Seq(
      (1L, "A", 10.0, 1L, at("00:00")),   // [10:00,10:05)
      (2L, "A", 11.0, 1L, at("30:00"))))  // [10:30,10:35)
    q.processAllAvailable()
    // Batch 1 under W=10:23.
    mem.addData(Seq(
      (3L, "A", 12.0, 1L, at("14:59")),   // we 10:15 <= 10:23: dropped
      (4L, "A", 13.0, 1L, at("21:00")),   // t < W but we 10:25 > W: KEPT iff window-based
      (5L, "A", 14.0, 1L, at("32:00"))))  // advances max to 10:32 -> next W = 10:25 (ALIGNED)
    q.processAllAvailable()
    // Batch 2 under W=10:25 (exactly a window boundary).
    mem.addData(Seq(
      (6L, "A", 15.0, 1L, at("24:30")),   // we 10:25 == W: dropped iff inclusive
      (7L, "A", 16.0, 1L, at("40:30")),   // [10:40,10:45): emission-boundary window
      (8L, "A", 17.0, 1L, at("52:00"))))  // max 10:52 -> final W = 10:45 (ALIGNED)
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(s"$out/data")
      .select(col("ws_ms"), col("trade_count"))
      .collect().map(r => (r.getLong(0) - H) / 1000 -> r.getLong(1)).toMap

    assert(!got.contains(600), "row 3 (we <= W) was NOT dropped — drop predicate vanished")
    assert(got.get(1200).contains(1L),
      s"row 4 (older than watermark, window still open) — got ${got.get(1200)}: " +
        "expected KEPT alone; absent => drop is event-time-based; 2 => row 6 " +
        "(we == W) not dropped, boundary is exclusive")
    assert(got.get(1800).contains(2L), s"[10:30,10:35) expected rows 2+5, got ${got.get(1800)}")
    assert(got.get(2400).contains(1L),
      "[10:40,10:45) with end == final watermark was not emitted — emission boundary is exclusive")
    assert(!got.contains(3000), "[10:50,10:55) beyond the final watermark was emitted")
    assert(got.keySet == Set(0L, 1200L, 1800L, 2400L),
      s"unexpected window set ${got.keySet}")
  }

  test("AvailableNow catch-up: the late filter lags one batch (SPARK-40925 split)") {
    val silver3 = Seq(
      // slice 0: max 10:30 -> eviction watermark after batch 0... is 0;
      // after batch 1 it is W1 = 10:23 (delay 7m, from slice 0's max).
      Seq((1L, "A", 10.0, 1L, at("00:00")),
        (2L, "A", 11.0, 1L, at("30:00"))),
      // slice 1 is filtered with watermark 0 — e3's window end 10:15
      // is <= W1 yet MUST survive (the lag witness). e4 pushes the
      // next eviction watermark to W2 = 10:24.
      Seq((3L, "A", 12.0, 1L, at("10:00")),
        (4L, "A", 13.0, 1L, at("31:00"))),
      // slice 2 is filtered with W1 = 10:23: e5 (we 10:15 <= W1) drops
      // — same window e3 already emitted, so keeping it would re-emit
      // the window; e6 (we 10:25 > W1) survives; e7 sets the final
      // watermark to 10:38 so [10:20,10:25) and [10:30,10:35) emit.
      Seq((5L, "A", 14.0, 1L, at("14:00")),
        (6L, "A", 15.0, 1L, at("23:30")),
        (7L, "A", 16.0, 1L, at("45:00"))))
    val root = Files.createTempDirectory("graft_latelag")
    val staging = Files.createDirectory(root.resolve("staging"))
    silver3.zipWithIndex.foreach { case (rows, i) =>
      val part = root.resolve(s"slice$i")
      rows.toDF("event_id", "symbol", "price", "volume", "ts_ms")
        .select(col("event_id"), col("symbol"), col("price"), col("volume"),
          timestamp_millis(col("ts_ms")).as("event_time"))
        .coalesce(1).write.parquet(part.toString)
      val one = Files.list(part)
      val src = try one.filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().orElseThrow() finally one.close()
      val dst = staging.resolve(f"slice-$i%04d.parquet")
      Files.move(src, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("symbol", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("price", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("volume", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_time", org.apache.spark.sql.types.TimestampType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staging.toString)
      .withWatermark("event_time", "7 minutes")
    val q = Ohlcv.bars5m(stream)
      .select(unix_millis(col("window_start")).as("ws_ms"), col("trade_count"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", root.resolve("out").toString)
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(root.resolve("out").toString)
      .collect().map(r => (r.getLong(0) - H) / 1000 -> r.getLong(1)).toSeq.sorted
    // (0,1)=e1; (600,1)=e3 ALONE — present proves the lag (slice-1 row
    // below W1 survived), count 1 proves e5 (slice-2, same window) was
    // dropped by the lagged filter; (1200,1)=e6; (1800,2)=e2+e4;
    // [10:45,10:50) beyond the final watermark stays unemitted.
    assert(got == Seq(0L -> 1L, 600L -> 1L, 1200L -> 1L, 1800L -> 2L),
      s"late-filter lag semantics moved: $got")
  }

  test("sr11 replay equals the explicit-cutoff semantics; watermark visibly changes the result") {
    val silver = SparkEntry.silverDf(spark, Sf).localCheckpoint(true)
    val delayMs = 259200000L // 3 days, as in the production replay

    // Independent Spark-side implementation of the oracle's kept/emit
    // logic (the DuckDB twin runs in the driver's harness).
    val wsMs = unix_millis(col("event_time")) - pmod(unix_millis(col("event_time")), lit(300000L))
    val w1 = silver.filter(col("event_id") % 3 === 0)
      .agg(max(unix_millis(col("event_time")))).head().getLong(0) - delayMs
    val wf = silver.agg(max(unix_millis(col("event_time")))).head().getLong(0) - delayMs
    val kept = silver.withColumn("ws_ms", wsMs)
      .filter(col("event_id") % 3 < 2 || col("ws_ms") + 300000L > w1)
    val expected = Ohlcv.bars5m(kept.drop("ws_ms"))
      .filter(unix_millis(col("window_end")) <= wf)
      .select(col("symbol"), unix_millis(col("window_start")).as("window_start_ms"),
        unix_millis(col("window_end")).as("window_end_ms"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("trade_count"), col("vwap_e6"))
      .collect().map(_.toSeq).toSet

    val got = StreamReplayQueries.streamLateReplay(spark, Sf)
      .collect().map(_.toSeq).toSet
    val missing = expected -- got
    val extra = got -- expected
    val diffMsg = s"|expected|=${expected.size} |got|=${got.size}" +
      s"\nmissing from replay (≤5): ${missing.take(5).mkString("\n  ", "\n  ", "")}" +
      s"\nunexpected in replay (≤5): ${extra.take(5).mkString("\n  ", "\n  ", "")}"
    assert(missing.isEmpty && extra.isEmpty, diffMsg)

    // The three populations the verdict asked for are all non-empty,
    // and removing the watermark would change the hash.
    val dropped = silver.filter(col("event_id") % 3 === 2)
      .withColumn("ws_ms", wsMs).filter(col("ws_ms") + 300000L <= w1).count()
    val lateKept = silver.filter(col("event_id") % 3 === 2)
      .withColumn("ws_ms", wsMs)
      .filter(col("ws_ms") + 300000L > w1 && unix_millis(col("event_time")) < w1 + delayMs)
      .count()
    assert(dropped > 0, "no beyond-watermark rows — the drop path was not exercised")
    assert(lateKept > 0, "no late-but-in-watermark rows — the keep path was not exercised")
    val unwatermarked = Ohlcv.bars5m(silver)
      .select(col("symbol"), unix_millis(col("window_start")).as("window_start_ms"),
        unix_millis(col("window_end")).as("window_end_ms"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("trade_count"), col("vwap_e6"))
      .collect().map(_.toSeq).toSet
    assert(got != unwatermarked,
      "replay equals the watermark-free batch aggregate — the oracle row is watermark-blind")
  }

  test("sr12 streaming session windows equal the batch sessions closed by the final watermark") {
    val ev = graft.sources.Tables.eventsNorm(spark, Sf)
      .select(col("user_id"), col("value"), col("event_time"))
      .localCheckpoint(true)
    val wfUs = ev.agg(max(unix_millis(col("event_time")))).head().getLong(0) * 1000L -
      259200000000L
    // Exact twin with MICROSECOND emission compare (the oracle's form).
    val expected = ev
      .groupBy(col("user_id"), session_window(col("event_time"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .filter(unix_micros(col("w.end")) <= wfUs)
      .select(col("user_id"), unix_millis(col("w.start")).as("session_start_ms"),
        unix_millis(col("w.end")).as("session_end_ms"),
        col("n_events"), col("sum_value"))
      .collect().map(_.toSeq).toSet

    val got = StreamReplayQueries.streamSessionReplay(spark, Sf)
      .collect().map(_.toSeq).toSet
    val missing = expected -- got
    val extra = got -- expected
    assert(missing.isEmpty && extra.isEmpty,
      s"|expected|=${expected.size} |got|=${got.size}" +
        s"\nmissing (≤5): ${missing.take(5).mkString("\n  ", "\n  ", "")}" +
        s"\nunexpected (≤5): ${extra.take(5).mkString("\n  ", "\n  ", "")}")

    // The watermark visibly withholds the tail: some sessions end
    // after the final watermark and must NOT be emitted.
    val all = ev.groupBy(col("user_id"),
        session_window(col("event_time"), "30 minutes")).count().count()
    assert(got.size < all, "no session was withheld — the cutoff is inert")
  }
}
