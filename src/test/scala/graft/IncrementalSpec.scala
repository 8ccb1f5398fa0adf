package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Incremental, Ohlcv}
import graft.sources.Tables

/** Incremental-maintenance semantics: partial-bar merge losslessness
  * (the commutative-monoid property the 100 TB re-load path rides),
  * MERGE upsert join behavior, SCD2 run-collapsing.
  */
class IncrementalSpec extends SparkSpecBase {
  import spark.implicits._

  private def silver: DataFrame = SparkEntry.silverDf(spark, Sf)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("mid-window split merge equals from-scratch bars, hash-for-hash") {
    val direct = Ohlcv.bars5m(silver)
    // Split INSIDE a 5m window so base/delta partials collide on the
    // same (symbol, window) keys and the open/close carries decide.
    val split = lit("2024-01-15 12:02:30").cast("timestamp")
    val merged = Incremental.mergeBars(
      Incremental.partialBars(silver.filter(col("event_time") < split), "5 minutes")
        .unionByName(
          Incremental.partialBars(silver.filter(col("event_time") >= split), "5 minutes")))
    assert(sortedRows(merged.select(direct.columns.map(col): _*)) == sortedRows(direct))
  }

  test("three-way split merges identically (associativity over slices)") {
    val direct = Ohlcv.bars5m(silver)
    val h = hash(col("event_id"))
    // Arbitrary hash-based 3-way partition: windows straddle all
    // three slices everywhere, the worst case for the carries.
    val parts = (0 until 3).map(i =>
      Incremental.partialBars(silver.filter(pmod(h, lit(3)) === i), "5 minutes"))
    val merged = Incremental.mergeBars(parts.reduce(_ unionByName _))
    assert(sortedRows(merged.select(direct.columns.map(col): _*)) == sortedRows(direct))
  }

  test("mergeUpsert: delta wins on collision, both sides' exclusives survive") {
    val base = Seq(("a", 1.0, 10L), ("b", 2.0, 20L)).toDF("k", "v", "t")
    val delta = Seq(("b", 9.0, 99L), ("c", 3.0, 30L)).toDF("k", "v", "t")
    val out = Incremental.mergeUpsert(base, delta, "k")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      ("a", 1.0, 10L, "base"), ("b", 9.0, 99L, "delta"), ("c", 3.0, 30L, "delta")))
  }

  test("mergeUpsert rejects schema drift between base and delta") {
    val base = Seq(("a", 1.0)).toDF("k", "v")
    val delta = Seq(("a", 1.0, 2L)).toDF("k", "v", "extra")
    intercept[IllegalArgumentException] {
      Incremental.mergeUpsert(base, delta, "k")
    }
  }

  test("snapshotDiff emits O(churn); applying the changelog reproduces delta") {
    val base = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0), ("e", 5.0)).toDF("k", "v")
    val delta = Seq(("a", 1.0), ("b", 9.0), ("d", 4.0),
      ("e", Double.NaN)).toDF("k", "v")
      .select(col("k"), when(col("k") === "e", lit(null)).otherwise(col("v")).as("v"))
    val diff = Incremental.snapshotDiff(base, delta, "k").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.get(2)))).sortBy(_._1)
    // a unchanged -> absent; e's value->NULL must surface as an update
    // CARRYING the null (not resurrect 5.0).
    assert(diff.toSeq == Seq(
      ("b", "update", Some(9.0)), ("c", "delete", Some(3.0)),
      ("d", "insert", Some(4.0)), ("e", "update", None)))

    // Round trip: upsert the non-delete changelog rows into base, then
    // anti-join out the deleted keys == delta.
    val cl = Incremental.snapshotDiff(base, delta, "k")
    val applied = Incremental.mergeUpsert(base,
        cl.filter(col("op") =!= "delete").drop("op"), "k")
      .drop("src")
      .join(cl.filter(col("op") === "delete").select("k"), Seq("k"), "left_anti")
    assert(applied.collect().map(r => (r.getString(0), Option(r.get(1)))).sortBy(_._1).toSeq ==
      delta.collect().map(r => (r.getString(0), Option(r.get(1)))).sortBy(_._1).toSeq)
  }

  test("scd2 collapses equal-value runs and bounds validity intervals") {
    val snaps = Seq(
      // k1: 5.0 for two days, 6.0 for one, back to 5.0 — the re-visit
      // must open a NEW version, not extend version 1.
      ("k1", "2024-01-01", 5.0), ("k1", "2024-01-02", 5.0),
      ("k1", "2024-01-03", 6.0), ("k1", "2024-01-05", 5.0),
      // k2: constant — exactly one open-ended row.
      ("k2", "2024-01-01", 7.0), ("k2", "2024-01-02", 7.0))
      .toDF("k", "d", "v").select(col("k"), col("d").cast("date").as("d"), col("v"))
    val out = Incremental.scd2(snaps, "k", "d", "v")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2),
        r.getDate(3).toString, Option(r.getDate(4)).map(_.toString), r.getBoolean(5)))
      .sortBy(t => (t._1, t._3))
    assert(out.toSeq == Seq(
      ("k1", 5.0, 1, "2024-01-01", Some("2024-01-02"), false),
      ("k1", 6.0, 2, "2024-01-03", Some("2024-01-04"), false),
      ("k1", 5.0, 3, "2024-01-05", None, true),
      ("k2", 7.0, 1, "2024-01-01", None, true)))
  }
}
