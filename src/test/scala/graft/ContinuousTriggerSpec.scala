package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Validation

/** Trigger.Continuous coverage — the one trigger mode the suite did
  * not exercise (docs/research/SPARK_STREAMING.md:69-77 contemplates
  * continuous alongside processing-time and once modes). Continuous
  * processing only admits stateless map-like plans, which is exactly
  * the engine's per-record hot path: the parse→validate projection.
  * The built-in rate source is the only in-sandbox continuous-capable
  * source (Kafka needs a broker + connector jar); the memory sink is
  * continuous-capable per the Spark docs.
  */
class ContinuousTriggerSpec extends SparkSpecBase {

  test("stateless validate projection runs under Trigger.Continuous") {
    // numPartitions must not exceed the master's cores: continuous
    // tasks are long-running and ALL schedule at once — local[4]
    // with the default 5 partitions would deadlock, not run.
    val src = spark.readStream.format("rate")
      .option("rowsPerSecond", "200")
      .option("numPartitions", "2")
      .load()
      .select(col("value").cast("string").as("event_id"),
        concat(lit("SYM"), (col("value") % 5).cast("string")).as("symbol"),
        (col("value") % 900 + 50).cast("double").as("price"),
        (col("value") % 100 + 1).cast("long").as("volume"),
        col("timestamp").as("event_time"))
    // Fixed far-future bound: current_timestamp() is a micro-batch
    // concept; continuous plans must be fully deterministic.
    val validated = Validation.validate(src,
      maxEventTimeMs = Long.MaxValue / 2, filterZeroVolume = true)
    val q = validated.writeStream.format("memory").queryName("cont_out")
      .trigger(Trigger.Continuous("1 second"))
      .start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        n = spark.table("cont_out").count()
      }
      assert(n > 0, "continuous query produced no rows within 60 s")
      // The synthesized trades are all in-range: every row must pass
      // the full rule bundle (and the columns flow through intact).
      val out = spark.table("cont_out")
      assert(out.filter(!col("is_valid")).count() === 0)
      assert(out.filter(size(col("errors")) =!= 0).count() === 0)
      assert(out.select(col("symbol")).distinct().count() <= 5)
    } finally q.stop()
  }
}
