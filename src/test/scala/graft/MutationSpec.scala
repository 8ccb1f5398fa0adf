package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators._
import graft.sources.Tables

/** Oracle-SENSITIVITY mutation harness (r12 verdict item #1, the
  * round's top_next): 201 green oracle rows prove the engine agrees
  * with the DuckDB twin, but agreement is only evidence if the gate
  * COULD disagree — a shared mistake in both builder-written sides
  * passes forever. This suite proves each query family's gate is
  * LIVE: per family, ONE semantic parameter is perturbed (window
  * duration, dedup key, band count, cutoff, k, gap, stride, grid
  * step, ...) and the canonical result — the driver's compare shape:
  * columns sorted by name, values stringified, rows sorted — must
  * CHANGE at sf0.001. Since the oracle SQL is fixed, a changed Spark
  * result is exactly a driver hash-gate failure; a mutation that
  * passes silently is a dead gate.
  *
  * Complements (not replaces) LateDataReplaySpec's watermark-
  * sensitivity proof for sr11: here the streaming family's mutation
  * is sr14's dedup KEY (adding event_id resurrects every planted
  * duplicate), exercising gate-liveness of the cross-batch state path.
  */
class MutationSpec extends SparkSpecBase {

  /** The driver-compare canonical multiset: sorted column names,
    * stringified values, sorted rows. Two frames with equal canon
    * would hash-match in the driver; unequal canon means the gate
    * fires.
    */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(v => String.valueOf(v)).mkString(""))
      .sorted.toSeq
  }

  private def assertLive(name: String, family: String, mutation: String)
                        (mutated: => DataFrame): Unit =
    test(s"[$family] gate is live: $name differs under mutated $mutation") {
      val base = canon(SparkEntry.queries(name)(spark, Sf))
      assert(base.nonEmpty, s"$name returned no rows at $Sf — nothing gated")
      val mut = canon(mutated)
      assert(base != mut,
        s"DEAD GATE: mutating $mutation left $name's canonical result " +
          s"unchanged (${base.size} rows) — the oracle cannot detect this parameter")
    }

  private def silver: DataFrame = SparkEntry.silverDf(spark, Sf)

  private def goldMs(gold: DataFrame): DataFrame =
    gold.select(col("symbol"),
      unix_millis(col("window_start")).as("window_start_ms"),
      unix_millis(col("window_end")).as("window_end_ms"),
      col("open"), col("high"), col("low"), col("close"),
      col("volume"), col("trade_count"), col("vwap_e6"))

  // a — OHLCV window duration: 5 minutes → 7 minutes re-grids every bar.
  assertLive("a1_ohlcv_5m", "a", "window duration 5m→7m") {
    goldMs(Ohlcv.bars(silver, "7 minutes"))
  }

  // b — indicator period: RSI 14 → 7 changes every smoothed value.
  assertLive("b3_rsi", "b", "RSI period 14→7") {
    Indicators.rsi(silver, n = 7)
  }

  // c — cluster count: k 8 → 4 reassigns points and moves centroids.
  assertLive("c1_kmeans", "c", "k-means k 8→4") {
    KMeans.assignments(Tables.embeddings(spark, Sf), k = 4, iters = 3)
  }

  // d — LSH banding: 8 bands of 2 rows → 16 bands of 1 row loosens the
  // candidate criterion to "any single minhash collides".
  assertLive("d4_minhash_candidates", "d", "LSH bands 8→16") {
    Dedup.minhashCandidates(
      Tables.documents(spark, Sf).filter(pmod(col("doc_id"), lit(10)) === 0),
      shingleN = 3, k = 16, bands = 16)
  }

  // f (silver filter) — the future-event cutoff moved into the data
  // range drops every trade after Jan 15.
  assertLive("f1_silver", "f", "future-event cutoff 2024-02-01→2024-01-15") {
    Medallion.dedupAgg(
        Medallion.toSilver(Tables.trades(spark, Sf),
          lit("2024-01-15 00:00:00").cast("timestamp")),
        payloadCols = Seq("price", "volume", "trade_date"))
      .select(col("event_id"), col("symbol"), col("price"), col("volume"),
        unix_millis(col("event_time")).as("event_time_ms"), col("trade_date"))
  }

  // f (validation rules) — the same cutoff moved 15 days earlier
  // reclassifies the back half of the corpus as future_timestamp.
  assertLive("f3_validation_metrics", "f", "validation cutoff −15 days") {
    Validation.metrics(
      Validation.validate(Tables.trades(spark, Sf),
        SparkEntry.CutoffMs - 15L * 86400000L))
  }

  // g — gap-fill grid step: 1h → 30m doubles the grid and makes every
  // odd half-hour a filled gap.
  assertLive("g1_gap_fill", "g", "grid step 1h→30m") {
    val bars = Ohlcv.bars1h(silver)
      .select(col("symbol"), unix_millis(col("window_start")).as("ts_ms"),
        col("close"))
    Resample.gapFillForward(bars, keyCol = "symbol", timeMsCol = "ts_ms",
      valueCol = "close", stepMs = 1800000L)
  }

  // h — the pricing-summary ship-date cutoff pulled below the data's
  // upper range changes every aggregate.
  assertLive("h1_pricing_summary", "h", "shipdate cutoff 2000-12-01→1995-01-01") {
    def dec(c: String) = col(c).cast("decimal(18,2)")
    Tables.lineitem(spark, Sf)
      .filter(col("l_shipdate") <= lit("1995-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("double").as("sum_disc_price"),
        sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")) * (lit(1) + dec("l_tax")))
          .cast("double").as("sum_charge"),
        round(sum(dec("l_quantity")).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(sum(dec("l_extendedprice")).cast("double") / count(lit(1)), 6).as("avg_price"),
        round(sum(dec("l_discount")).cast("double") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  // mm — frame-sampling stride 2 → 3 selects a different frame subset.
  assertLive("mm2_frame_sample", "mm", "frame stride 2→3") {
    Multimodal.sampleFrames(
      Multimodal.extractFeatures(spark, Multimodal.asMediaTable(
        Tables.documents(spark, Sf).filter(col("doc_id") < 300))), stride = 3)
  }

  // p — event-time derivation in µs instead of ms (the P2 semantic;
  // the classic unit bug class the parse gate must catch).
  assertLive("p1_parse_trades", "p", "event-time derivation ms→µs") {
    Tables.trades(spark, Sf).select(col("event_id"), col("symbol"),
      col("price"), col("volume"),
      unix_micros(col("event_time")).as("event_time_ms"), col("trade_date"))
  }

  // q — the price band [50,100] → [60,90] changes membership and extrema.
  assertLive("q11_price_band", "q", "price band [50,100]→[60,90]") {
    MarketQueries.priceBand(silver, 60.0, 90.0)
  }

  // s — ANN k 5 → 3 truncates every ranked neighbor list.
  assertLive("s1_knn_brute", "s", "top-k 5→3") {
    val e = Tables.embeddings(spark, Sf)
    Similarity.bruteForceTopK(e.filter(col("vec_id") < 5), e, k = 3)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  // t — vocabulary top-k 50 → 10 truncates the per-group token ranking.
  assertLive("t7_vocab_topk", "t", "vocab top-k 50→10") {
    TextAnalysis.vocabTopK(Tables.documents(spark, Sf), k = 10)
  }

  // v — the incremental-MV bar duration 5m → 10m re-grids the
  // partial-bar store the merge reads.
  assertLive("v1_incremental_ohlcv", "v", "bar duration 5m→10m") {
    val split = lit("2024-01-15 00:00:00").cast("timestamp")
    val base = Incremental.partialBars(silver.filter(col("event_time") < split), "10 minutes")
    val delta = Incremental.partialBars(silver.filter(col("event_time") >= split), "10 minutes")
    Incremental.mergeBars(base.unionByName(delta))
      .select(col("symbol"),
        unix_millis(col("window_start")).as("window_start_ms"),
        unix_millis(col("window_end")).as("window_end_ms"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("trade_count"), col("vwap_e6"))
  }

  // x — the session gap 30m → 60m merges adjacent sessions.
  assertLive("x2_sessions", "x", "session gap 30m→60m") {
    Sessions.sessionStats(
      Tables.eventsNorm(spark, Sf).select(col("user_id"), col("value"),
        col("event_time")),
      keyCol = "user_id", timeCol = "event_time", valueCol = "value",
      gap = "60 minutes")
  }

  // z — Z-order cell granularity: dropping from 2^24 to 2^16 per cell
  // re-buckets every row's interleaved key.
  assertLive("z1_zorder_cluster", "z", "cell granularity z div 2^24 → 2^16") {
    import graft.functions.ZOrderFunctions.morton
    val px = pmod((col("price").cast("decimal(18,4)") * 10000).cast("long"), lit(65536L))
    val ty = pmod(expr("unix_millis(event_time) div 60000"), lit(65536L))
    silver
      .withColumn("z", morton(px, ty))
      .withColumn("cell", expr("z div 65536"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_rows"),
        min(px).as("min_px"), max(px).as("max_px"),
        min(ty).as("min_ty"), max(ty).as("max_ty"))
  }

  // sr — the streaming family: sr14's dedup KEY widened with event_id
  // resurrects every planted cross-batch duplicate (they differ only
  // in event_id), so the drained row count and multiset change. Runs
  // the REAL multi-batch drain with the mutated key against the same
  // shared staged feed (same frame ⇒ the staging-cache schema check
  // passes), private checkpoint/out.
  test("[sr] gate is live: sr14 differs under mutated dedup key (symbol, ts)→(symbol, ts, event_id)") {
    val base = canon(SparkEntry.queries("sr14_stream_dedup_replay")(spark, Sf))
    assert(base.nonEmpty)
    val cleaned = Medallion
      .toSilver(Tables.trades(spark, Sf), lit(SparkEntry.CutoffTs).cast("timestamp"))
      .withColumn("timestamp", unix_millis(col("event_time")))
    val feed = cleaned.unionByName(
      cleaned.filter(col("event_id") % 5 === 0)
        .withColumn("event_id", col("event_id") + 10000000L))
    val staging = graft.streaming.ReplayStaging.customSlices(s"dedup_feed|$Sf", feed,
      Seq(col("event_id") < 10000000L, col("event_id") >= 10000000L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_mut_sr14_")
    val stream = spark.readStream.schema(feed.schema)
      .option("maxFilesPerTrigger", "1").parquet(staging)
      .withWatermark("event_time", "3 days")
    val q = stream.dropDuplicatesWithinWatermark(Seq("symbol", "timestamp", "event_id"))
      .select(col("symbol"), col("timestamp").as("ts_ms"),
        col("price"), col("volume"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmp.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", tmp.resolve("out").toString)
      .start()
    q.awaitTermination()
    val mut = canon(spark.read.parquet(tmp.resolve("out").toString))
    assert(base != mut,
      "DEAD GATE: widening the dedup key did not change sr14's drained rows — " +
        "the cross-batch dedup gate cannot detect its own key")
    // And in the expected direction: the mutation RESURRECTS the
    // planted duplicates, so the mutated drain has more rows.
    assert(mut.size > base.size)
  }

  // ------------------------------------------------------------------
  // COMPARE-side liveness (r13 verdict item #7): every test above
  // perturbs the ENGINE; the symmetric failure is a comparator that
  // ignores what it should compare. The end-to-end oracle-side pass —
  // one query per family, the ORACLE SQL perturbed (projection
  // widened, a row dropped, one numeric column bumped) and the
  // driver-replica compare required to fail with the RIGHT gate —
  // lives in scripts/oracle_mutation_check.py (runs in check.sh after
  // every verify sweep; DuckDB is driver-side tooling, not a JVM
  // dependency). The tests below pin the same three sensitivities on
  // the in-JVM canonical form these gate tests are built on, so a
  // canon() regression cannot silently defang the whole suite.
  // ------------------------------------------------------------------

  test("[compare] canon is live to a widened projection") {
    val df = SparkEntry.queries("q1_count_day")(spark, Sf)
    assert(canon(df) != canon(df.withColumn("graft_extra", lit(1))),
      "DEAD COMPARE: an extra column left the canonical form unchanged")
  }

  test("[compare] canon is live to a single-row count change") {
    val df = SparkEntry.queries("q5_volume_by_symbol")(spark, Sf)
    assert(canon(df) != canon(df.limit(math.max(0, df.count().toInt - 1))),
      "DEAD COMPARE: dropping a row left the canonical form unchanged")
  }

  test("[compare] canon is live to a one-ulp-scale value bump in one column") {
    val df = SparkEntry.queries("q2_volume_day")(spark, Sf)
    val num = df.schema.fields.find(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.DoubleType).get.name
    assert(canon(df) != canon(df.withColumn(num, col(num) + 1)),
      s"DEAD COMPARE: bumping $num left the canonical form unchanged")
  }
}
