package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

class SketchSpec extends SparkSpecBase {

  test("HLL approx distinct is within its error bound of the exact count") {
    val trades = Tables.trades(spark, "/root/testdata/sf0.01")
    val approx = ExtendedQueries.approxDistinct(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("approx_trades")).toMap
    val exact = trades.groupBy(col("symbol"))
      .agg(countDistinct(col("event_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (sym, n) =>
      val err = math.abs(approx(sym) - n).toDouble / n
      assert(err < 0.05, s"$sym: approx=${approx(sym)} exact=$n err=$err")
    }
  }
}
