package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.{FunnelTransition, UserEvent}

class FunnelStreamSpec extends SparkSpecBase {
  import spark.implicits._

  // 12 users with deterministic mixed histories: some complete the
  // funnel, some stall at view/click, some fire stages out of funnel
  // order (click before any view — must not count).
  private val events: Seq[UserEvent] = (0L until 12L).flatMap { u =>
    val base = u * 100
    u % 4 match {
      case 0 => Seq( // full funnel, with noise events
        UserEvent(u, "view", base + 1), UserEvent(u, "error", base + 2),
        UserEvent(u, "click", base + 3), UserEvent(u, "view", base + 4),
        UserEvent(u, "purchase", base + 5))
      case 1 => Seq( // stalls after click
        UserEvent(u, "view", base + 1), UserEvent(u, "click", base + 2),
        UserEvent(u, "click", base + 3))
      case 2 => Seq( // click precedes every view: stage 2 never fires
        UserEvent(u, "click", base + 1), UserEvent(u, "view", base + 2),
        UserEvent(u, "purchase", base + 3))
      case _ => Seq( // view only
        UserEvent(u, "view", base + 1), UserEvent(u, "error", base + 2))
    }
  }.sortBy(e => (e.ts, e.user_id))

  /** Driver-side reference: the batch funnel's stage user sets. */
  private def refStages: Map[String, Set[Long]] = {
    val byUser = events.groupBy(_.user_id)
    val v = byUser.flatMap { case (u, es) =>
      es.filter(_.event_type == "view").map(_.ts).minOption.map(u -> _)
    }
    val c = v.flatMap { case (u, tv) =>
      byUser(u).filter(e => e.event_type == "click" && e.ts > tv)
        .map(_.ts).minOption.map(u -> _)
    }
    val p = c.flatMap { case (u, tc) =>
      byUser(u).filter(e => e.event_type == "purchase" && e.ts > tc)
        .map(_.ts).minOption.map(u -> _)
    }
    Map("1_view" -> v.keySet.toSet, "2_click" -> c.keySet.toSet,
      "3_purchase" -> p.keySet.toSet)
  }

  private def runSliced(slices: Seq[Seq[UserEvent]], name: String): Seq[FunnelTransition] =
    withRocksDbState {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[UserEvent]
      val q = FunnelStream.transitions(spark, mem.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[FunnelTransition].collect().toSeq
    }

  test("streamed stage sets equal the batch funnel under any slicing") {
    val want = refStages
    val slicings = Seq(
      ("one", Seq(events)),
      ("tiny", events.grouped(5).toSeq),
      ("skew", Seq(events.take(2), events.slice(2, 30), events.drop(30))))
    for ((tag, s) <- slicings) {
      val got = runSliced(s, s"funnel_$tag")
        .groupBy(_.stage).view.mapValues(_.map(_.user_id).toSet).toMap
      assert(got === want, s"slicing $tag")
    }
  }

  test("replaying a batch emits no duplicate transitions") {
    val rows = runSliced(Seq(events, events), "funnel_replay")
    assert(rows.size === rows.map(r => (r.user_id, r.stage)).distinct.size)
    assert(rows.groupBy(_.stage).view.mapValues(_.map(_.user_id).toSet).toMap === refStages)
  }

  test("distinct same-timestamp events are not conflated with replays") {
    // view and an error share ts=10 but differ in event_id, split
    // across micro-batches: the (ts, event_id) high-water mark must
    // process both (the view registers stage 1) while a full replay
    // emits nothing new. The click at the same ts as the view does NOT
    // advance stage 2 (stages require strictly-later ts) — pinned.
    val b1 = Seq(UserEvent(7L, "error", 10L, event_id = 1L))
    val b2 = Seq(UserEvent(7L, "view", 10L, event_id = 2L),
      UserEvent(7L, "click", 10L, event_id = 3L))
    val rows = runSliced(Seq(b1, b2, b1 ++ b2), "funnel_same_ts")
    assert(rows.map(_.stage) === Seq("1_view"))
  }
}
