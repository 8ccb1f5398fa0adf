package graft

import java.nio.file.Files
import java.time.Duration

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, Trigger, TimerValues, TTLConfig, ValueState}

/** State TTL, EXECUTED (r13): the repo's long-uptime posture describes
  * transformWithState state as "TTL-capable" (SCALE.md §4,
  * LatestPriceStream), and the reference expires serving rows by TTL
  * (CASSANDRA_MODELING's TTLs, expressed read-side in v6) — but every
  * production processor passes TTLConfig.NONE, so until this spec the
  * TTL execution path had never run. Here a ValueState with a real
  * TTLConfig expires between micro-batches — ACROSS a query restart,
  * proving expiry is a state-store property, not a session artifact —
  * while an identical long-TTL control survives, pinning both
  * directions of the semantics (processing-time TTL requires
  * TimeMode.ProcessingTime; generous margins — 2s elapsed vs 100ms
  * TTL — keep the wall-clock dependence unflakeable).
  */
object StateTtlSpec {
  /** Count-per-key with a caller-chosen TTL: state lost to expiry
    * restarts the count at zero, so the emitted count SEES expiry.
    */
  class TtlCountProcessor(ttlMs: Long)
      extends StatefulProcessor[String, String, (String, Long)] {
    @transient private var count: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl = if (ttlMs <= 0) TTLConfig.NONE
        else new TTLConfig(Duration.ofMillis(ttlMs))
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, ttl)
    }
    override def handleInputRows(key: String, rows: Iterator[String],
                                 tv: TimerValues): Iterator[(String, Long)] = {
      val prev = if (count.exists()) count.get() else 0L
      val n = prev + rows.size
      count.update(n)
      Iterator((key, n))
    }
  }
}

class StateTtlSpec extends SparkSpecBase {
  import spark.implicits._

  /** Drain the staging through a TtlCountProcessor on `ckpt`,
    * returning the latest count per key. ONE batch per call
    * (Trigger.Once, deprecated but the only trigger that terminates
    * unconditionally): in TimeMode.ProcessingTime a TTL'd stateful
    * operator reports "another batch could expire state" forever, so
    * Trigger.AvailableNow never terminates — measured as 700+ empty
    * micro-batches before this harness was killed. The production
    * posture is a ProcessingTime trigger that never drains to empty;
    * for a bounded test, one batch per restart IS the semantics under
    * test (expiry across a down-time gap).
    */
  private def drain(staging: String, ckpt: String, out: String,
                    ttlMs: Long): Map[String, Long] = {
    val stream = spark.readStream.schema("key STRING")
      .parquet(staging)
      .as[String](Encoders.STRING)
      .groupByKey(identity)(Encoders.STRING)
      .transformWithState(new StateTtlSpec.TtlCountProcessor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Update(),
        implicitly[Encoder[(String, Long)]])
    val q = stream.toDF("key", "n")
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.Once(): @annotation.nowarn("cat=deprecation"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$out/batch=$batchId")
      }
      .start()
    q.awaitTermination()
    // Latest emission per key (update mode re-emits on every batch).
    spark.read.parquet(out)
      .groupBy(col("key")).agg(max(struct(col("batch"), col("n"))).as("last"))
      .select(col("key"), col("last.n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def scenario(ttlMs: Long): (Map[String, Long], Map[String, Long]) = {
    val root = Files.createTempDirectory("graft_ttl").toString
    val staging = s"$root/staging"
    Seq("a", "a", "b").toDF("key").coalesce(1).write.parquet(staging)
    val first = drain(staging, s"$root/ckpt", s"$root/out", ttlMs)
    // The TTL clock is PROCESSING time: let it pass while the query is
    // down, then deliver more rows through the same checkpoint.
    Thread.sleep(2000)
    Seq("a", "b").toDF("key").coalesce(1)
      .write.mode("append").parquet(staging)
    val second = drain(staging, s"$root/ckpt", s"$root/out", ttlMs)
    (first, second)
  }

  test("ValueState TTL expires state across batches and restarts (processing-time)") {
    withRocksDbState {
      val (first, second) = scenario(ttlMs = 100L)
      assert(first === Map("a" -> 2L, "b" -> 1L))
      // 2s >> 100ms: the restored store must treat the entries as
      // expired, so the counts RESTART instead of accumulating.
      assert(second === Map("a" -> 1L, "b" -> 1L),
        s"state outlived its 100ms TTL across a 2s gap: $second")
    }
  }

  test("long-TTL control: same pipeline, state survives the same gap") {
    withRocksDbState {
      val (first, second) = scenario(ttlMs = 3600L * 1000L)
      assert(first === Map("a" -> 2L, "b" -> 1L))
      assert(second === Map("a" -> 3L, "b" -> 2L),
        s"state with a 1h TTL vanished across a 2s gap: $second")
    }
  }
}
