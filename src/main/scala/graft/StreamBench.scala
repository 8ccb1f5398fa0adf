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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = Files.createTempDirectory("graft_streambench").toString
    // Kafka-shaped JSON values from the events table.
    val json = graft.sources.Tables.events(spark, sfDir).select(
      to_json(struct(
        col("event_type").as("symbol"),
        col("value").as("price"),
        get_json_object(col("props"), "$.k").cast("long").as("volume"),
        expr("ts div 1000000").as("timestamp"),
        array().cast("array<string>").as("conditions"),
        expr("ts div 1000000").as("ingestion_time"))).as("value"))
    json.write.parquet(s"$work/in")
    val n = spark.read.parquet(s"$work/in").count()

    val cfg = App.Config(out = s"$work/out", checkpoint = s"$work/ckp",
      layers = Set("bronze", "silver", "gold5m"), trigger = "0 seconds")
    val raw = spark.readStream
      .schema("value STRING").parquet(s"$work/in")
    val t0 = System.nanoTime()
    val mgr = App.start(spark, raw, cfg)
    mgr.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    mgr.stopAll()

    val silverN = spark.read.parquet(s"$work/out/silver").count()
    val goldN = spark.read.parquet(s"$work/out/gold5m").count()
    println(f"""{"metric":"stream_catchup","value":$secs%.3f,"unit":"sec","rows":$n,"rows_per_sec":${n / secs}%.0f,"silver_rows":$silverN,"gold_bars":$goldN}""")
    spark.stop()
  }
}
