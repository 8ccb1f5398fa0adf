package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.IndicatorStream
import graft.streaming.IndicatorStream.TradeTick

class IndicatorStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private val t0 = 1705312800000L

  private def tick(p: Double, i: Int, sym: String = "AAPL") =
    TradeTick(sym, p, new Timestamp(t0 + i * 60000L))

  /** Driver-side reference recursion. */
  private def refEma(prices: Seq[Double], n: Int): Seq[Double] = {
    val a = 2.0 / (n + 1)
    prices.tail.scanLeft(prices.head)((e, x) => a * x + (1 - a) * e)
  }

  test("streaming EMA continues across micro-batches and matches the reference") {
    withRocksDbState {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[TradeTick]
      val q = IndicatorStream.updates(spark, mem.toDS(), n = 3)
        .writeStream.format("memory").queryName("ind_out").outputMode("append").start()
      val prices = Seq(10.0, 11.0, 12.0, 11.0, 13.0, 14.0)
      mem.addData(prices.take(3).zipWithIndex.map { case (p, i) => tick(p, i) }: _*)
      q.processAllAvailable()
      mem.addData(prices.drop(3).zipWithIndex.map { case (p, i) => tick(p, i + 3) }: _*)
      q.processAllAvailable()
      q.stop()
      val got = spark.table("ind_out").orderBy("event_time")
        .collect().map(_.getAs[Double]("ema"))
      val want = refEma(prices, 3)
      assert(got.length === want.length)
      got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
    }
  }

  test("streaming equals batch regardless of micro-batch slicing") {
    withRocksDbState {
      implicit val sqlCtx = spark.sqlContext
      val prices = (1 to 40).map(i => 100.0 + (i % 7) - (i % 3) * 2)
      val ticks = prices.zipWithIndex.map { case (p, i) => tick(p, i) }
      val mem = MemoryStream[TradeTick]
      val q = IndicatorStream.updates(spark, mem.toDS(), n = 14)
        .writeStream.format("memory").queryName("ind_eq_out").outputMode("append").start()
      // Uneven slicing: 1, 7, 25, 7 rows.
      Seq(ticks.take(1), ticks.slice(1, 8), ticks.slice(8, 33), ticks.drop(33))
        .foreach { s => mem.addData(s: _*); q.processAllAvailable() }
      q.stop()
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Timestamp]("event_time").getTime, r.getAs[Double]("ema"),
          Option(r.getAs[java.lang.Double]("rsi")).map(_.toDouble))
      val streamed = spark.table("ind_eq_out").collect().map(key).toSet
      val batch = IndicatorStream.updatesBatch(spark, ticks.toDS(), n = 14)
        .collect().map(u => (u.event_time.getTime, u.ema, u.rsi)).toSet
      assert(streamed === batch)
      // RSI warms up after 14 changes: exactly rows 15..40 carry one
      // (row 15 is the first with 14 absorbed changes — same convention
      // as the batch Indicators.rsi full-window rule).
      assert(batch.count(_._3.isDefined) === 26)
    }
  }

  test("state survives a checkpointed stop/restart: the recursion continues, not restarts") {
    withRocksDbState {
      implicit val sqlCtx = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft_ind_restart").toString
      val mem = MemoryStream[TradeTick]
      // Memory sinks can't recover from a checkpoint — use the file
      // sink, whose _spark_metadata log supports restart (same sink
      // the App's indicators layer uses).
      def startQuery() = IndicatorStream.updates(spark, mem.toDS(), n = 3)
        .writeStream.format("parquet").option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckp").outputMode("append").start()
      val prices = Seq(10.0, 11.0, 12.0, 11.0, 13.0)
      val q1 = startQuery()
      mem.addData(prices.take(2).zipWithIndex.map { case (p, i) => tick(p, i) }: _*)
      q1.processAllAvailable()
      q1.stop()
      // New query, same checkpoint: the ValueState must resume where
      // the recursion left off (ema carried from the first run).
      val q2 = startQuery()
      mem.addData(prices.drop(2).zipWithIndex.map { case (p, i) => tick(p, i + 2) }: _*)
      q2.processAllAvailable()
      q2.stop()
      val got = spark.read.parquet(s"$dir/out").orderBy("event_time")
        .collect().map(_.getAs[Double]("ema"))
      val want = refEma(prices, 3)
      assert(got.length === want.length)
      got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
    }
  }

  test("re-delivered ticks are idempotent: a replayed row never folds twice") {
    // At-least-once delivery can hand the processor the same tick in a
    // later micro-batch; the strict time bound must drop it.
    val (st1, u1) = IndicatorStream.fold("AAPL", Seq(tick(10.0, 0), tick(12.0, 1)), None, 3)
    val (st2, u2) = IndicatorStream.fold("AAPL", Seq(tick(12.0, 1)), st1, 3)
    assert(u1.length === 2 && u2.isEmpty)
    assert(st2 === st1)
  }

  test("late out-of-order ticks are dropped, not folded backwards") {
    val ticks = Seq(tick(10.0, 0), tick(12.0, 2), tick(11.0, 1))
    val out = IndicatorStream.updatesBatch(spark, ticks.toDS(), n = 3)
      .collect().sortBy(_.event_time.getTime)
    // The tick at +1min sorts before +2min in the fold, so all three
    // survive a single-batch fold...
    assert(out.length === 3)
    // ...but a replay where the middle tick arrives after the fold has
    // advanced past it drops it.
    val (st1, _) = IndicatorStream.fold("AAPL", Seq(tick(10.0, 0), tick(12.0, 2)), None, 3)
    val (st2, updates) = IndicatorStream.fold("AAPL", Seq(tick(11.0, 1)), st1, 3)
    assert(updates.isEmpty)
    assert(st2 === st1)
  }
}
