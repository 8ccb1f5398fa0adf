package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Incremental
import graft.streaming.Scd2Stream
import graft.streaming.Scd2Stream.DimSnapshot

/** Streaming SCD2 equals the batch build: (key, version)-upsert rows
  * replayed through any micro-batch slicing converge to exactly
  * `Incremental.scd2` over the same snapshots — O(keys) state,
  * O(churn) emissions.
  */
class Scd2StreamSpec extends SparkSpecBase {
  import spark.implicits._

  /** Real daily closes from sf0.001 silver (the v3 snapshot frame). */
  private lazy val snapshots: Seq[DimSnapshot] = {
    val byDay = Window.partitionBy(col("symbol"), col("trade_date"))
      .orderBy(col("event_time").desc, col("event_id").desc)
    SparkEntry.silverDf(spark, Sf)
      .withColumn("rn", row_number().over(byDay)).filter(col("rn") === 1)
      .select(col("symbol"), col("trade_date"), col("price"))
      .collect()
      .map(r => DimSnapshot(r.getString(0), r.getDate(1), r.getDouble(2)))
      .toSeq
  }

  private def expected: Set[(String, Double, Int, String, Option[String], Boolean)] =
    Incremental.scd2(
        snapshots.toDF("key", "date", "value"), "key", "date", "value")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2),
        r.getDate(3).toString, Option(r.getDate(4)).map(_.toString),
        r.getBoolean(5)))
      .toSet

  /** Converge upsert rows: a version appears at most twice (open,
    * then closed) — the closed form wins, order-free.
    */
  private def converge(rows: Seq[Row]): Set[(String, Double, Int, String, Option[String], Boolean)] =
    rows.map(r => (r.getString(0), r.getDouble(1), r.getInt(2),
        r.getDate(3).toString, Option(r.getDate(4)).map(_.toString),
        r.getBoolean(5)))
      .groupBy(t => (t._1, t._3))
      .map { case (_, vs) => vs.find(!_._6).getOrElse(vs.head) }
      .toSet

  test("streaming SCD2 converges to the batch build under date-chunked slicings") {
    withRocksDbState {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dates = snapshots.map(_.date.toString).distinct.sorted
      // Three chunks with boundaries INSIDE runs: per-key date order
      // holds across batches (the operator's ordering contract).
      val cuts = Seq(dates.size / 3, 2 * dates.size / 3)
      val chunks = Seq(
        snapshots.filter(s => s.date.toString <= dates(cuts.head - 1)),
        snapshots.filter(s => s.date.toString > dates(cuts.head - 1)
          && s.date.toString <= dates(cuts(1) - 1)),
        snapshots.filter(s => s.date.toString > dates(cuts(1) - 1)))
      assert(chunks.forall(_.nonEmpty))
      val mem = MemoryStream[DimSnapshot]
      val q = Scd2Stream.intervals(spark, mem.toDS())
        .writeStream.format("memory").queryName("scd2_stream")
        .outputMode("update").start()
      try {
        chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
        assert(converge(spark.table("scd2_stream").collect().toSeq) == expected)
      } finally q.stop()
    }
  }

  test("batch adapter equals Incremental.scd2 exactly") {
    val out = Scd2Stream.intervalsBatch(spark,
      snapshots.toDS()).toDF().collect().toSeq
    assert(converge(out) == expected)
  }

  test("cross-batch date regressions are dropped, not rewritten into history") {
    // Within ONE batch the fold sorts by date, so disorder there is
    // legal; the ordering contract is ACROSS batches, where state has
    // already advanced past the regressing date.
    val (st1, rows1) = Scd2Stream.fold("k",
      Seq(DimSnapshot("k", Date.valueOf("2024-01-05"), 1.0)), None)
    val (st2, rows2) = Scd2Stream.fold("k",
      Seq(DimSnapshot("k", Date.valueOf("2024-01-02"), 9.0)), st1)
    assert(rows1.map(_.value) == Seq(1.0))
    assert(rows2.isEmpty) // the regression emitted nothing
    assert(st2.exists(_.value == 1.0)) // and did not disturb the run
  }
}
