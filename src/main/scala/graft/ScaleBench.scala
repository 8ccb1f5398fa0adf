package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{LatestPrices, Medallion, Ohlcv, Sampling}
import graft.sources.Tables

/** Synthetic scale-up bench: replicate the sf inputs k× (disjoint ids
  * and day-shifted event times, so window/bar cardinality grows with
  * the data instead of collapsing onto itself) and measure the
  * heaviest operators at 1× and k×. A near-linear wall-clock ratio is
  * the measured evidence behind docs/SCALE.md's shuffle cost model —
  * run with SPARK_GRAFT_SF_DIR and an optional k argument (default
  * 10):
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ScaleBench"
  *
  * Prints one JSON line {"k":10,"queries":{name:{"t1":s,"tk":s,
  * "ratio":r}}}.
  */
object ScaleBench {

  /** k disjoint copies of the trade feed: ids offset per copy, event
    * times shifted by i*40 days (the source spans ~31 days, so copy
    * ranges never overlap) — same per-day trade density, k× the days,
    * so OHLCV bars, dedup keys and shuffle volume all scale k×.
    */
  private def scaledTrades(s: SparkSession, dir: String, k: Int): DataFrame =
    (0 until k).map { i =>
      Tables.trades(s, dir)
        .withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000000L))
        .withColumn("event_time", col("event_time") + expr(s"INTERVAL ${i * 40} DAYS"))
        .withColumn("trade_date", to_date(col("event_time")))
    }.reduce(_ unionByName _)

  /** k disjoint copies of the documents — ids offset AND every token
    * prefixed with the copy index, for the same reason scaledTrades
    * day-shifts event times: identical (or near-identical) texts
    * across copies would put every replica group into the same
    * MinHash buckets, growing candidate pairs ~k² and collapsing all
    * copies into one giant near-dup cluster — a structurally
    * different dedup workload, not k× the 1× shape. Prefixing every
    * token drives cross-copy Jaccard to zero while keeping each
    * copy's internal structure (and the d9 derivation's planted
    * families) intact. Copy 0 is transformed too, so 1× and k× stay
    * comparable.
    */
  private def scaledDocs(s: SparkSession, dir: String, k: Int): DataFrame =
    (0 until k).map { i =>
      Tables.documents(s, dir)
        .withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000000L))
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"c$i$$1"))
    }.reduce(_ unionByName _)

  private def scaledEmbs(s: SparkSession, dir: String, k: Int): DataFrame =
    (0 until k).map { i =>
      Tables.embeddings(s, dir)
        .withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000000L))
    }.reduce(_ unionByName _)

  /** Future-timestamp cutoff for the silver quality filter, derived
    * from k: base max event_time + k*40 days (the furthest copy is
    * shifted (k-1)*40 days, leaving one full stride of headroom). A
    * pinned constant here silently dropped the furthest copies once
    * k grew past its horizon, deflating the measured ratio.
    */
  private def cutoffFor(s: SparkSession, dir: String, k: Int): org.apache.spark.sql.Column = {
    val maxTs = Tables.trades(s, dir).agg(max(col("event_time"))).head.get(0)
    lit(maxTs) + expr(s"INTERVAL ${k * 40} DAYS")
  }

  private def silver(trades: DataFrame, cutoff: org.apache.spark.sql.Column): DataFrame =
    Medallion.dedupAgg(
      Medallion.toSilver(trades, cutoff),
      payloadCols = Seq("price", "volume", "trade_date"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm JVM

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // One cutoff for both the 1x and kx runs (sized for the furthest
    // kx copy): the filter only needs to exceed the data's horizon,
    // so the wider bound changes no row counts at 1x.
    val cutoff = cutoffFor(spark, sfDir, k)
    val cases: Seq[(String, Int => Long)] = Seq(
      "a1_ohlcv_5m" -> { kk: Int =>
        Ohlcv.bars5m(silver(scaledTrades(spark, sfDir, kk), cutoff)).count()
      },
      "a6_latest_prices" -> { kk: Int =>
        LatestPrices.snapshot(silver(scaledTrades(spark, sfDir, kk), cutoff)).count()
      },
      "x10_token_packing" -> { kk: Int =>
        val docs = scaledDocs(spark, sfDir, kk).select(col("doc_id"),
          size(operators.TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
        Sampling.packByTokenBudget(docs, "doc_id", "n_tokens", budget = 5000L)
          .groupBy(col("shard_id")).agg(count(lit(1))).count()
      },
      // Substring dedup: window explosion is O(tokens); the shared-
      // window aggregate/join must scale with distinct windows, and
      // the token prefixing keeps cross-copy windows disjoint so the
      // frequency table grows k× instead of deepening.
      "d12_substring_dup" -> { kk: Int =>
        operators.Dedup.substringDupStats(scaledDocs(spark, sfDir, kk), k = 8).count()
      },
      // Heavy hitters: pass 1 is one scan with k counters per
      // partition; pass 2 counts a bounded candidate set — wall-clock
      // should track the scan, staying well under k×.
      "x20_heavy_hitters" -> { kk: Int =>
        // Strip the per-copy token prefix so the heavy tokens stay
        // heavy across copies (the hitter set is scale-invariant).
        val toks = scaledDocs(spark, sfDir, kk)
          .select(explode(operators.TextAnalysis.tokens(
            regexp_replace(lower(col("text")), "c\\d+", ""))).as("token"))
        operators.HeavyHitters.exactHeavyHitters(toks, "token", phiE6 = 30000L).count()
      },
      // Iterative operators: rounds must stay O(log n) / O(iters) as
      // the input grows, so wall-clock should scale with the per-round
      // shuffle, not the round count.
      "d9_dup_clusters" -> { kk: Int =>
        PipelineQueries.dupClustersOver(scaledDocs(spark, sfDir, kk)).count()
      },
      "c1_kmeans" -> { kk: Int =>
        operators.KMeans.assignments(scaledEmbs(spark, sfDir, kk), k = 8, iters = 3).count()
      })

    val results = cases.map { case (name, run) =>
      run(1) // warm codegen/file-index for this shape
      val (t1, n1) = time(run(1))
      val (tk, nk) = time(run(k))
      val ratio = tk / t1
      System.err.println(f"[scalebench] $name 1x=$t1%.2fs ($n1 rows) ${k}x=$tk%.2fs ($nk rows) ratio=$ratio%.1f")
      f""""$name":{"t1":$t1%.3f,"tk":$tk%.3f,"ratio":$ratio%.2f,"rows1":$n1,"rowsk":$nk}"""
    }
    println(s"""{"metric":"scale_ratio","k":$k,"queries":${results.mkString("{", ",", "}")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
