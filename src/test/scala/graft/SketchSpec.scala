package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

class SketchSpec extends SparkSpecBase {

  test("HLL approx distinct is within its error bound of the exact count") {
    val trades = Tables.trades(spark, "/root/testdata/sf0.01")
    val out = ExtendedQueries.approxDistinct(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_distinct"), r.getAs[Boolean]("approx_ok"))).toMap
    val exact = trades.groupBy(col("symbol"))
      .agg(countDistinct(col("event_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(out.keySet === exact.keySet)
    exact.foreach { case (sym, n) =>
      val (nd, ok) = out(sym)
      assert(nd === n, s"$sym: shipped n_distinct=$nd exact=$n")
      assert(ok, s"$sym: HLL estimate strayed >10% from exact=$n")
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

  test("MG sketch aggregates per group, batch and streaming update mode alike") {
    import spark.implicits._
    val sk = graft.operators.HeavyHitters.sketch(4)
    // Batch per-group form.
    val batch = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "x"))
      .toDS().groupByKey(_._1).mapValues(_._2).agg(sk.toColumn)
      .collect().toMap
    assert(batch("g1").counters === Map("a" -> 2L, "b" -> 1L))
    assert(batch("g1").total === 3L && batch("g2").total === 1L)
    // Streaming: same aggregation over a MemoryStream in update mode —
    // the buffer must round-trip the state store encoder.
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val q = mem.toDS().groupByKey(_._1).mapValues(_._2).agg(sk.toColumn)
      .toDF("group", "mg")
      .writeStream.format("memory").queryName("mg_out").outputMode("update").start()
    mem.addData(("g1", "a"), ("g1", "b"))
    q.processAllAvailable()
    mem.addData(("g1", "a"), ("g2", "x"))
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("mg_out").collect()
      .map(r => r.getAs[String]("group") -> r.getAs[org.apache.spark.sql.Row]("mg"))
      .toMap // update mode: last emission per group wins in the collect-by-key map
    val g1 = fin("g1")
    assert(g1.getAs[Long]("total") === 3L)
    assert(g1.getAs[Map[String, Long]]("counters") === Map("a" -> 2L, "b" -> 1L))
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
