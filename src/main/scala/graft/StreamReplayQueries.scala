package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.TextAnalysis
import graft.sources.Tables
import graft.streaming.{CurationStream, IncrementalGoldStream, LatestPriceStream, OrderFlowStream, VpinStream}

/** Driver-visible queries that actually EXECUTE `writeStream` — the
  * streaming runtimes replayed deterministically over the static sf
  * parquet in `Trigger.AvailableNow` mode, so the DuckDB oracle gate
  * covers the streaming code path itself, not just its batch-
  * equivalent spec (the round-9 verdict's "oracle-check two streaming
  * paths via deterministic replay").
  *
  * Replay discipline: the input is staged to a multi-file parquet
  * directory and consumed with `maxFilesPerTrigger=1`, so the run
  * exercises REAL multi-micro-batch execution (checkpointing, state
  * handoff between batches, the sink's idempotent upsert) — not a
  * single batch that happens to flow through streaming APIs. Both
  * queries are chosen because their results are independent of the
  * micro-batch slicing:
  *  - sr1: bar partials form a commutative monoid, so the merge-on-
  *    read store equals the batch gold_5m frame for ANY slicing.
  *  - sr2: the admission gate is a pure per-document function and the
  *    output is keyed by content fingerprint (score is invariant
  *    under the fingerprint's whitespace/case normalization), so the
  *    admitted (fp, score) SET is slicing- and order-independent even
  *    though the dedup survivor row is not.
  *
  * Scale note: `AvailableNow` + file listing is exactly how a 100 TB
  * backfill re-enters the streaming path (SPARK_STREAMING.md:69-77's
  * once/available-now modes); this is that path at sf size.
  */
object StreamReplayQueries {

  /** Recursive delete for the per-invocation scratch dirs (unique via
    * createTempDirectory, removed once results are materialized).
    */
  private def deleteRecursively(root: Path): Unit = {
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  /** SR1 — the IncrementalGoldStream runtime end-to-end: silver →
    * AvailableNow stream (one file per micro-batch) → foreachBatch
    * partial-bar upsert store → merge-on-read. Result = gold_5m
    * exactly (v1's oracle), no matter how the stream was sliced.
    */
  def streamGoldReplay(s: SparkSession, dir: String): DataFrame = {
    val silver = SparkEntry.silverDf(s, dir)
    val tmp = Files.createTempDirectory("graft_sr1_")
    try {
      val staging = tmp.resolve("staging").toString
      silver.repartition(2).write.parquet(staging)
      val stream = s.readStream.schema(silver.schema)
        .option("maxFilesPerTrigger", "1").parquet(staging)
      val q = IncrementalGoldStream.writer(stream,
        path = tmp.resolve("store").toString,
        checkpoint = tmp.resolve("ckpt").toString,
        duration = "5 minutes",
        trigger = Trigger.AvailableNow(),
        nBuckets = 8).start()
      q.awaitTermination()
      // Materialize before the scratch store is deleted: the returned
      // frame must not lazily re-read files that no longer exist.
      IncrementalGoldStream.read(s, tmp.resolve("store").toString)
        .select(col("symbol"),
          unix_millis(col("window_start")).as("window_start_ms"),
          unix_millis(col("window_end")).as("window_end_ms"),
          col("open"), col("high"), col("low"), col("close"),
          col("volume"), col("trade_count"), col("vwap_e6"))
        .localCheckpoint(eager = true)
    } finally deleteRecursively(tmp)
  }

  /** SR2 — the CurationStream runtime end-to-end: documents →
    * AvailableNow stream → pure-function quality gate → watermark-
    * bounded streaming dedup → parquet sink. Emits the admitted
    * (content fingerprint, score) set; the constant event-time keeps
    * every document inside one watermark window so the stream's dedup
    * scope equals the batch DISTINCT the oracle computes.
    */
  def streamCurationReplay(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .withColumn("event_time", lit("2024-01-15 00:00:00").cast("timestamp"))
    val tmp = Files.createTempDirectory("graft_sr2_")
    try {
      val staging = tmp.resolve("staging").toString
      docs.repartition(2).write.parquet(staging)
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(staging)
      val outDir = tmp.resolve("out").toString
      val q = CurationStream.admit(stream, minScoreMilli = 0L, delay = "7 days")
        .select(TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"),
          col("score_milli"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", outDir)
        .start()
      q.awaitTermination()
      s.read.parquet(outDir).distinct().localCheckpoint(eager = true)
    } finally deleteRecursively(tmp)
  }

  /** SR3 — the LatestPriceStream `transformWithState` runtime
    * end-to-end (the A6 stateful path, r10 verdict item #2): silver →
    * chronologically-staged AvailableNow stream (one file per
    * micro-batch) → per-symbol ValueState fold (RocksDB provider) →
    * update-mode foreachBatch parquet append → newest snapshot per
    * symbol. Result = the batch a6_latest_prices window EXACTLY
    * (shared oracle SQL): the staged slices preserve event-time order
    * across micro-batches — file NAME and MTIME order both follow the
    * slice's time range, and silver's dedup makes event_time unique
    * per symbol — so the fold's final (last event, previous event)
    * pair is the batch LEAD pair, and the JVM change/pct arithmetic
    * is the same IEEE op sequence the batch column expressions run.
    */
  /** Stage `frame` into `tmp/staging` as three chronological slices,
    * each ONE parquet file with ascending name and mtime, so the
    * file-source ordering (mtime, with path as tiebreak) replays them
    * in event-time order no matter which key it uses. Returns the
    * staging directory path.
    */
  private def stageChronoSlices(tmp: Path, frame: DataFrame): String = {
    val staging = Files.createDirectory(tmp.resolve("staging"))
    val cuts = Seq("2024-01-10", "2024-01-20")
    val slices = Seq(
      col("event_time") < lit(cuts(0)).cast("timestamp"),
      col("event_time") >= lit(cuts(0)).cast("timestamp") &&
        col("event_time") < lit(cuts(1)).cast("timestamp"),
      col("event_time") >= lit(cuts(1)).cast("timestamp"))
    slices.zipWithIndex.foreach { case (cond, i) =>
      val part = tmp.resolve(s"slice$i")
      frame.filter(cond).coalesce(1).write.parquet(part.toString)
      val one = Files.list(part)
      val src =
        try one.filter(p => p.getFileName.toString.endsWith(".parquet"))
          .findFirst().orElseThrow()
        finally one.close()
      val dst = staging.resolve(f"slice-$i%04d.parquet")
      Files.move(src, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    staging.toString
  }

  def streamLatestReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val silver = SparkEntry.silverDf(s, dir)
    val tmp = Files.createTempDirectory("graft_sr3_")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = s.conf.getOption(providerKey)
    try {
      val staging = stageChronoSlices(tmp, silver)
      val stream = s.readStream.schema(silver.schema)
        .option("maxFilesPerTrigger", "1").parquet(staging)
      val trades = stream
        .select(col("symbol"), col("price"), col("volume"), col("event_time"))
        .as[LatestPriceStream.TradeEvent]
      s.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val outDir = tmp.resolve("out").toString
      val q = LatestPriceStream.snapshotsTws(s, trades)
        .writeStream.outputMode("update")
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.model.LatestPrice], _: Long) =>
          batch.write.mode("append").parquet(outDir); ()
        }
        .start()
      q.awaitTermination()
      // Update-mode emissions accumulate one snapshot per (symbol,
      // micro-batch-with-fresh-events); the newest per symbol is the
      // final state. last_trade_time is unique per symbol (silver
      // dedup), so the argmax is total.
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("symbol"))
        .orderBy(col("last_trade_time").desc)
      s.read.parquet(outDir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("symbol"), col("last_price"), col("last_volume"),
          unix_millis(col("last_trade_time")).as("last_trade_time_ms"),
          round(col("price_change"), 6).as("price_change"),
          round(col("price_change_pct"), 6).as("price_change_pct"))
        .localCheckpoint(eager = true)
    } finally {
      prevProvider match {
        case Some(p) => s.conf.set(providerKey, p)
        case None => s.conf.unset(providerKey)
      }
      deleteRecursively(tmp)
    }
  }

  /** A tick with its classification grouping key (sr4's replay input:
    * k = "symbol|trade_date" so tick-test state resets at day
    * boundaries exactly like batch b21's per-(symbol, trade_date)
    * window frame).
    */
  final case class KeyedTick(k: String, symbol: String, px: Long,
                             volume: Long, ts: Long, eventId: Long)

  /** SR4 — the CHAINED microstructure runtimes end-to-end: silver →
    * chronologically-staged AvailableNow stream → OrderFlowStream
    * tick-test classification (`transformWithState`, keyed
    * "symbol|trade_date" so state resets at day boundaries like the
    * batch window frame) → VpinStream fixed-bucket volume clock
    * (`transformWithState`, keyed symbol — the clock is continuous
    * across days in batch b21 too) → append-mode parquet. Two
    * stateful operators back to back in ONE streaming query. The
    * emitted rows are exactly batch b21's COMPLETED buckets (the
    * stream only emits a bucket once a later trade lands past it, so
    * each symbol's final still-filling bucket stays in state): the
    * oracle reuses b21's CTE chain and filters `bucket < max(bucket)
    * per symbol`. Slicing-independence: the chronological staging
    * preserves per-key event-time order across micro-batches, within
    * a micro-batch both processors fold in (ts, eventId) order, and
    * silver's dedup makes event_time unique per symbol — so the fold
    * is the batch window pass exactly.
    */
  def streamVpinReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val silver = SparkEntry.silverDf(s, dir)
    val tmp = Files.createTempDirectory("graft_sr4_")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = s.conf.getOption(providerKey)
    try {
      val staging = stageChronoSlices(tmp, silver)
      val stream = s.readStream.schema(silver.schema)
        .option("maxFilesPerTrigger", "1").parquet(staging)
      val keyed = stream.select(
          concat(col("symbol"), lit("|"), col("trade_date").cast("string")).as("k"),
          col("symbol"),
          graft.operators.Indicators.ticksE4(col("price")).as("px"),
          col("volume"),
          unix_micros(col("event_time")).as("ts"),
          col("event_id").as("eventId"))
        .as[KeyedTick]
      val grouped = keyed.groupByKey(_.k)
        .mapValues(t => OrderFlowStream.Tick(t.symbol, t.px, t.volume, t.ts, t.eventId))
      val verdicts = OrderFlowStream.verdictsGrouped(s, grouped)
      val buckets = VpinStream.buckets(s, verdicts, bucketVolume = 2000L, window = 10)
      s.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val outDir = tmp.resolve("out").toString
      val q = buckets.writeStream.outputMode("append")
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", outDir)
        .start()
      q.awaitTermination()
      // Append mode + the (ts, eventId) high-water guard emit each
      // completed bucket exactly once; no distinct needed.
      s.read.parquet(outDir)
        .select(col("symbol"), col("bucket"), col("buy"), col("sell"),
          col("vol"), col("n_in_window"), col("vpin_roll_e6"))
        .localCheckpoint(eager = true)
    } finally {
      prevProvider match {
        case Some(p) => s.conf.set(providerKey, p)
        case None => s.conf.unset(providerKey)
      }
      deleteRecursively(tmp)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sr1_stream_gold_replay" -> (streamGoldReplay _),
    "sr2_stream_curation_replay" -> (streamCurationReplay _),
    "sr3_stream_latest_replay" -> (streamLatestReplay _),
    "sr4_stream_vpin_replay" -> (streamVpinReplay _))

  val oracles: Map[String, String] = Map(
    // The streamed merge-on-read store must equal batch gold_5m.
    "sr1_stream_gold_replay" -> MaintenanceQueries.incrementalOhlcvSql,
    "sr2_stream_curation_replay" -> PipelineQueries.streamCurationReplaySql,
    // The streamed stateful snapshot must equal batch a6 — literally
    // the same oracle string.
    "sr3_stream_latest_replay" -> SparkEntry.latestPricesSql,
    // The chained classify→bucket stream must equal batch b21 on
    // COMPLETED buckets: b21's own CTE chain, filtered to rows below
    // each symbol's final (still-filling) bucket.
    "sr4_stream_vpin_replay" -> (IndicatorQueries.vpinRollingPb + """, roll AS (
      SELECT symbol, bucket, buy, sell, vol,
             COUNT(*) OVER w AS n_in_window,
             SUM(ABS(CAST(buy AS HUGEINT) - sell)) OVER w * 1000000 AS absdiff_e6,
             SUM(vol) OVER w AS w_vol,
             MAX(bucket) OVER (PARTITION BY symbol) AS maxb
      FROM pb
      WINDOW w AS (PARTITION BY symbol ORDER BY bucket
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    )
    SELECT symbol, CAST(bucket AS BIGINT) AS bucket, CAST(buy AS BIGINT) AS buy,
           CAST(sell AS BIGINT) AS sell, CAST(vol AS BIGINT) AS vol,
           CAST(n_in_window AS BIGINT) AS n_in_window,
           CAST(absdiff_e6 // w_vol AS BIGINT) AS vpin_roll_e6
    FROM roll WHERE bucket < maxb"""))
}
