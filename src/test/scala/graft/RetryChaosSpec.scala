package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._
import graft.sources.Tables

/** TASK-RETRY determinism (r12 verdict item #3): exactly-once was
  * proven under QUERY restart (RestartReplaySpec) but never under
  * task retry — Spark's other recompute path, where a failed task
  * attempt reruns on the same live query. A retry-sensitive
  * expression (a nondeterministic column feeding a filter/join, a
  * non-idempotent write) produces a silently different result here,
  * which no clean-run gate can catch.
  *
  * Mechanics: the suite runs in its OWN forked JVM (build.sbt
  * testGrouping) because local mode only grants task retries via the
  * `local[N, F]` master string and a second SparkContext per JVM is
  * an error. [[RetryChaos.chaosOnce]] injects a first-attempt failure
  * into EVERY task of the stage it lands in; with maxFailures = 3 the
  * job survives and each scenario asserts (a) the chaos fired and
  * (b) the result is IDENTICAL to the clean run — one query shape per
  * risk class, prioritizing the two the verdict named:
  * `monotonically_increasing_id` (SkewJoin's placement-only salt) and
  * the foreachBatch upsert sink.
  *
  * What this cannot reach in one JVM: shuffle-FETCH failure recompute
  * of a committed map stage (needs a lost executor; local shuffle is
  * in-process). The retried unit here is the full fused task pipeline
  * — the same recompute semantics, driven from the scheduler's retry
  * path.
  */
object RetryChaos {
  /** Counts injected failures — a plain static works because local-
    * mode executors share the JVM. (An accumulator would not: updates
    * from failed task attempts are dropped for user accumulators.)
    */
  val fired = new AtomicInteger(0)

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4, 3]") // 4 threads, tasks may fail twice
      .appName("graft-retry-chaos")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR") // injected failures spam WARN
    s
  }

  /** Make every task of the enclosing stage FAIL its first attempt.
    * Runs the frame through an RDD boundary so the failure lands in
    * the fused stage that computes `df`'s rows plus whatever narrow
    * work follows, then re-encodes under the same schema.
    */
  def chaosOnce(df: DataFrame): DataFrame = {
    val schema = df.schema
    val rdd = df.rdd.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0) {
        fired.incrementAndGet()
        throw new RuntimeException("chaos: injected first-attempt task failure")
      }
      it
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}

class RetryChaosSpec extends AnyFunSuite {
  import RetryChaos.{chaosOnce, spark}

  private val Sf = "/root/testdata/sf0.001"

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(v => String.valueOf(v)).mkString(""))
      .sorted.toSeq
  }

  /** Assert `mk(input)` computes the same rows whether or not every
    * task of the input stage is failed once.
    */
  private def assertRetrySafe(tag: String, input: => DataFrame)
                             (mk: DataFrame => DataFrame): Unit = {
    val clean = canon(mk(input))
    assert(clean.nonEmpty, s"$tag: empty clean result — nothing exercised")
    val before = RetryChaos.fired.get()
    val chaosed = canon(mk(chaosOnce(input)))
    assert(RetryChaos.fired.get() > before,
      s"$tag: chaos never fired — the retry path was not exercised")
    assert(chaosed == clean,
      s"$tag: result differs under task retry — a retry-sensitive " +
        "expression or non-idempotent stage is in the plan")
  }

  private lazy val silver = SparkEntry.silverDf(spark, Sf).localCheckpoint(true)

  test("windowed aggregation (a1 shape) is task-retry deterministic") {
    assertRetrySafe("ohlcv", silver)(df => Ohlcv.bars5m(df))
  }

  test("salted join survives partial-stage retry: monotonically_increasing_id is placement-only (x44 shape)") {
    // THE named risk: the salt column is nondeterministic across
    // recomputes in general; result identity must not depend on it.
    // Chaos lands in the salted (skewed) side's stage, so its salt
    // values are assigned on the RETRIED attempt.
    val dim = silver.select(col("symbol")).distinct()
      .withColumn("dim_tag", length(col("symbol")))
    assertRetrySafe("salted-join", silver) { df =>
      SkewJoin.saltedJoin(df, dim, keys = Seq("symbol"), factor = 8)
        .groupBy(col("symbol"), col("dim_tag"))
        .agg(count(lit(1)).as("n"), sum(col("volume")).as("vol"))
    }
  }

  test("rank/top-k (q4 shape) is task-retry deterministic") {
    assertRetrySafe("candles", Ohlcv.bars5m(silver))(bars =>
      MarketQueries.candles(bars, "click", "2024-01-15", 50))
  }

  test("session windows (x2 shape) are task-retry deterministic") {
    val ev = Tables.eventsNorm(spark, Sf)
      .select(col("user_id"), col("value"), col("event_time"))
    assertRetrySafe("sessions", ev)(df =>
      Sessions.sessionStats(df, keyCol = "user_id", timeCol = "event_time",
        valueCol = "value", gap = "30 minutes"))
  }

  test("MinHash/LSH candidates (d4 shape) are task-retry deterministic") {
    val docs = Tables.documents(spark, Sf)
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id"), col("text"))
    assertRetrySafe("minhash", docs)(df =>
      Dedup.minhashCandidates(df, shingleN = 3, k = 16, bands = 8))
  }

  test("iterative k-means (c1 shape) is task-retry deterministic across per-iteration jobs") {
    // Every Lloyd iteration runs its own job over the chaos input, so
    // EACH iteration's first attempts fail — the centroid sequence
    // must still be the clean run's exactly (integer arithmetic,
    // deterministic seeds).
    val embs = Tables.embeddings(spark, Sf)
    assertRetrySafe("kmeans", embs)(df =>
      KMeans.assignments(df, k = 8, iters = 3))
  }

  test("foreachBatch upsert converges under task retry INSIDE the batch (sr1/K1 shape)") {
    // The other named risk: the idempotent store write, re-entered not
    // by a query restart but by the scheduler retrying the write
    // stage's tasks mid-batch.
    val root = java.nio.file.Files.createTempDirectory("graft_chaos_upsert_")
    val staging = root.resolve("staging").toString
    silver.repartition(3).write.parquet(staging)
    val store = root.resolve("gold").toString
    val before = RetryChaos.fired.get()
    val q = spark.readStream.schema(silver.schema)
      .option("maxFilesPerTrigger", "1").parquet(staging)
      .writeStream.outputMode("append")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.streaming.IncrementalGoldStream
          .mergeBatch(chaosOnce(batch), batchId, store, "5 minutes")
      }
      .start()
    q.awaitTermination()
    assert(RetryChaos.fired.get() > before, "chaos never fired inside the batch")
    val barCols = Seq("symbol", "window_start", "window_end", "open", "high",
      "low", "close", "volume", "trade_count", "vwap_e6").map(col)
    val got = canon(graft.streaming.IncrementalGoldStream.read(spark, store)
      .select(barCols: _*))
    val expected = canon(Ohlcv.bars5m(silver).select(barCols: _*))
    assert(got == expected,
      "upsert store diverged from batch bars under in-batch task retry")
  }
}
