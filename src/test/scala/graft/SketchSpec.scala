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

  test("Misra-Gries sketch under eviction pressure never loses a true heavy hitter") {
    import spark.implicits._
    // 10k rows over 1000 distinct items; items h0/h1/h2 hold 30%/15%/8%.
    // k=9 counters << 1000 distinct forces constant eviction; the
    // n/(k+1) = 10% undercount bound means h0 and h1 MUST survive.
    val rows = (0 until 3000).map(_ => "h0") ++ (0 until 1500).map(_ => "h1") ++
      (0 until 800).map(_ => "h2") ++ (0 until 4700).map(i => s"t${i % 940}")
    val rng = new scala.util.Random(11)
    val shuffled = rng.shuffle(rows)
    val mg = shuffled.toDF("item").repartition(13)
      .select(col("item")).as[String]
      .select(graft.operators.HeavyHitters.sketch(9).toColumn).head()
    assert(mg.total === 10000L)
    assert(mg.counters.size <= 9)
    assert(mg.counters.contains("h0") && mg.counters.contains("h1"))
    // Counter is a lower bound within n/(k+1) of the truth.
    assert(mg.counters("h0") <= 3000L && mg.counters("h0") >= 3000L - 1000L)
  }

  test("exactHeavyHitters returns exact thresholded counts despite the sketch pass") {
    import spark.implicits._
    val rows = (0 until 500).map(_ => "big") ++ (0 until 120).map(_ => "mid") ++
      (0 until 380).map(i => s"small${i % 95}")
    val df = new scala.util.Random(3).shuffle(rows).toDF("item").repartition(7)
    // phi = 10%: only "big" (50%) and "mid" (12%) qualify.
    val out = graft.operators.HeavyHitters.exactHeavyHitters(df, "item", phiE6 = 100000L)
      .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("tf"))
    assert(out.toSeq === Seq("big" -> 500L, "mid" -> 120L))
  }
}
