package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.FunnelStream.UserEvent
import graft.streaming.TransitionStream
import graft.streaming.TransitionStream.Transition

/** Pins the streaming x39 (per-user last-event ValueState) to the
  * batch transition matrix under arbitrary micro-batch slicings and
  * replays.
  */
class TransitionStreamSpec extends SparkSpecBase {
  import spark.implicits._

  // 9 users, unique timestamps per user (the ordering-contract
  // precondition), mixed event vocabularies.
  private val events: Seq[UserEvent] = (0L until 9L).flatMap { u =>
    val base = u * 100
    u % 3 match {
      case 0 => Seq(UserEvent(u, "view", base + 1), UserEvent(u, "click", base + 2),
        UserEvent(u, "view", base + 3), UserEvent(u, "purchase", base + 4))
      case 1 => Seq(UserEvent(u, "view", base + 1), UserEvent(u, "error", base + 2))
      case _ => Seq(UserEvent(u, "click", base + 1))
    }
  }.sortBy(e => (e.ts, e.user_id))

  /** The batch operator's pair multiset on the same data (the x39
    * derivation: lead over (ts) per user).
    */
  private def batchPairs: Map[(String, String), Long] = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.toDF("user_id", "event_type", "ts", "event_id")
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type")).count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  private def runSliced(slices: Seq[Seq[UserEvent]], name: String): Seq[Transition] =
    withRocksDbState {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[UserEvent]
      val q = TransitionStream.transitions(spark, mem.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[Transition].collect().toSeq
    }

  test("streamed transition counts equal the batch matrix under any slicing") {
    val want = batchPairs
    assert(want.nonEmpty)
    val slicings = Seq(
      ("one", Seq(events)),
      ("tiny", events.grouped(4).toSeq),
      ("skew", Seq(events.take(3), events.slice(3, 10), events.drop(10))))
    for ((tag, s) <- slicings) {
      val got = runSliced(s, s"trans_$tag")
        .groupBy(t => (t.from_type, t.to_type)).view.mapValues(_.size.toLong).toMap
      assert(got === want, s"slicing $tag")
    }
  }

  test("replaying a batch emits no duplicate transitions") {
    val rows = runSliced(Seq(events, events), "trans_replay")
    val got = rows.groupBy(t => (t.from_type, t.to_type)).view.mapValues(_.size.toLong).toMap
    assert(got === batchPairs)
  }

  test("distinct same-timestamp events survive the replay guard; exact replays do not") {
    // Two events at ts=10 with different event_ids split across
    // micro-batches: the old ts-only high-water mark would drop the
    // second; the (ts, event_id) mark must keep it. A third batch
    // replaying both must emit nothing new.
    val b1 = Seq(UserEvent(1L, "view", 10L, event_id = 1L))
    val b2 = Seq(UserEvent(1L, "click", 10L, event_id = 2L),
      UserEvent(1L, "purchase", 11L, event_id = 3L))
    val rows = runSliced(Seq(b1, b2, b1 ++ b2), "trans_same_ts")
    val got = rows.map(t => (t.from_type, t.to_type)).sorted
    assert(got === Seq(("click", "purchase"), ("view", "click")))
  }
}
