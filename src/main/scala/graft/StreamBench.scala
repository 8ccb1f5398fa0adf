package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming throughput benchmark against the reference's operational
  * envelope (BASELINE.md: ingest->silver end-to-end alert at 10 s,
  * 10 s micro-batch trigger, ~50 symbols at WebSocket rates).
  *
  * Converts the events table into Kafka-shaped JSON trade messages,
  * replays them through the full production graph (graft.App.start:
  * parse -> watermark -> bronze/silver/gold branches with real parquet
  * sinks + checkpoints), and reports wall-clock + rows/sec. One run =
  * one "catch-up" micro-batch, i.e. the worst-case burst the 10 s
  * trigger must absorb.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.StreamBench"
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // HotSpot refuses to JIT methods >8000 bytecodes (DontCompileHuge
      // Methods): a whole-stage-codegen'd multi-level aggregate cascade
      // can exceed that and run INTERPRETED (~3.5x slower on a8's fused
      // stage, round 9). At 8000 Spark falls back to per-operator
      // execution for oversized stages, which the JIT does compile.
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Optional wave count: waves > 1 feeds the input in chunks with a
    // processAllAvailable() barrier between them, so every wave after
    // the first exercises the gold sink's STEADY-STATE path — the
    // bucketed read-back merge against an existing store — not just
    // the store-creation append the single catch-up batch hits.
    val waves = args.headOption.map(_.toInt).getOrElse(1)

    val work = Files.createTempDirectory("graft_streambench").toString
    // Kafka-shaped JSON values from the events table. Waves are split
    // by EVENT TIME (ntile over timestamp), not row id: an
    // interleaved split would let wave 1 advance the watermark past
    // the whole month and every later wave would arrive "late" and be
    // dropped — real replay feeds the stream in time order. (The
    // no-partition ntile window is one-time bench STAGING over a
    // bounded table, outside the timed region.)
    val base = graft.sources.Tables.eventsNorm(spark, sfDir).select(
      col("event_type").as("symbol"),
      col("value").as("price"),
      get_json_object(col("props"), "$.k").cast("long").as("volume"),
      expr("ts_us div 1000").as("timestamp"),
      array().cast("array<string>").as("conditions"),
      expr("ts_us div 1000").as("ingestion_time"))
    val withWave =
      if (waves == 1) base.withColumn("__wave", lit(0))
      else base.withColumn("__wave",
        ntile(waves).over(org.apache.spark.sql.expressions.Window.orderBy(col("timestamp"))) - 1)
    val json = withWave.select(
      to_json(struct(base.columns.map(col).toIndexedSeq: _*)).as("value"), col("__wave"))
    (0 until waves).foreach { w =>
      json.filter(col("__wave") === w).select(col("value"))
        .write.parquet(s"$work/staged/$w")
    }

    Files.createDirectories(java.nio.file.Paths.get(s"$work/in"))
    // SPARK_GRAFT_STREAM_MOR=1 adds the merge-on-read gold layer to
    // the topology, so the run prices BOTH gold paths (stateful
    // upsert + stateless partial-bar store) side by side. Off by
    // default to keep the headline comparable across rounds.
    val withMor = sys.env.get("SPARK_GRAFT_STREAM_MOR").exists(_ == "1")
    val cfg = App.Config(out = s"$work/out", checkpoint = s"$work/ckp",
      layers = Set("bronze", "silver", "gold5m") ++
        (if (withMor) Set("gold5m_mor") else Set.empty),
      trigger = "0 seconds")
    val raw = spark.readStream
      .schema("value STRING").parquet(s"$work/in")
    val mgr = App.start(spark, raw, cfg)
    val waveSecs = (0 until waves).map { w =>
      // Reveal this wave's files to the file source, then drain.
      val src = new java.io.File(s"$work/staged/$w")
      src.listFiles().filter(f => f.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$work/in/${w}_${f.getName}"))
      }
      val t0 = System.nanoTime()
      mgr.processAllAvailable()
      (System.nanoTime() - t0) / 1e9
    }
    mgr.stopAll()

    val n = spark.read.parquet(s"$work/out/bronze").count()
    val silverN = spark.read.parquet(s"$work/out/silver").count()
    val goldN = spark.read.parquet(s"$work/out/gold5m").count()
    val secs = waveSecs.sum
    val wavesJson = waveSecs.map(s => f"$s%.3f").mkString("[", ",", "]")
    // Merge-on-read extras: partial-row count (the read amplification
    // the store carries before compaction), merged bar count (must
    // equal the stateful layer's), and the merge-at-read wall.
    val morJson = if (withMor) {
      val partials = spark.read.parquet(s"$work/out/gold5m_mor").count()
      val t0 = System.nanoTime()
      val morBars = graft.streaming.IncrementalGoldStream
        .read(spark, s"$work/out/gold5m_mor").count()
      val readSec = (System.nanoTime() - t0) / 1e9
      f""","mor_partials":$partials,"mor_bars":$morBars,"mor_read_sec":$readSec%.3f"""
    } else ""
    println(f"""{"metric":"stream_catchup","value":$secs%.3f,"unit":"sec","rows":$n,"rows_per_sec":${n / secs}%.0f,"waves":$wavesJson,"silver_rows":$silverN,"gold_bars":$goldN$morJson}""")
    spark.stop()
  }
}
