package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Engine-side observability for the streaming graph — the analog of
  * the reference's Prometheus/Grafana monitoring and its one hard SLO
  * (ingest→silver batch latency alert at 10 s; BASELINE.md). The
  * reference scrapes executor metrics; here the engine itself records
  * per-micro-batch progress through a `StreamingQueryListener`, which
  * is the Spark-native source for exactly those numbers — rows,
  * throughput, trigger latency, state size — with no polling and no
  * second system.
  *
  * Scale posture: the listener is driver-side by construction (query
  * progress events ARE driver events) and bounded — a ring of the
  * last `capacity` batch records across all queries, a few hundred
  * bytes each. Snapshots materialize to a DataFrame for the same
  * serving queries everything else uses; alert evaluation is a plain
  * filter over it.
  */
object Monitoring {

  /** One micro-batch's operational record. */
  case class BatchMetric(
      query: String,
      batch_id: Long,
      ts: String,
      input_rows: Long,
      input_rows_per_sec: Double,
      processed_rows_per_sec: Double,
      batch_duration_ms: Long,
      state_rows: Long)

  /** Bounded per-batch progress recorder. Thread-safe: listener
    * callbacks arrive on the streams bus thread while readers
    * snapshot from user code.
    */
  final class ProgressListener(capacity: Int = 1024) extends StreamingQueryListener {
    require(capacity > 0, s"need capacity > 0, got $capacity")
    private val buf = mutable.ArrayDeque.empty[BatchMetric]

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val m = BatchMetric(
        query = Option(p.name).getOrElse(p.id.toString),
        batch_id = p.batchId,
        ts = p.timestamp,
        input_rows = p.numInputRows,
        input_rows_per_sec = nanSafe(p.inputRowsPerSecond),
        processed_rows_per_sec = nanSafe(p.processedRowsPerSecond),
        batch_duration_ms =
          Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
        state_rows = p.stateOperators.map(_.numRowsTotal).sum)
      synchronized {
        buf.append(m)
        while (buf.size > capacity) buf.removeHead()
      }
    }

    private def nanSafe(d: Double): Double = if (d.isNaN || d.isInfinite) 0.0 else d

    def snapshot: Seq[BatchMetric] = synchronized { buf.toSeq }

    /** The recorded batches as a DataFrame, for the serving-query
      * surface (and parquet export for dashboards).
      */
    def metrics(spark: SparkSession): DataFrame = {
      import spark.implicits._
      snapshot.toDF()
    }

    /** Batches over the latency SLO — the reference's 10 s
      * ingest→silver alert expressed engine-side.
      */
    def slowBatches(thresholdMs: Long = 10000L): Seq[BatchMetric] =
      snapshot.filter(_.batch_duration_ms > thresholdMs)
  }

  /** Attach a fresh listener to the session's streams bus. Caller
    * owns removal (`spark.streams.removeListener`).
    */
  def attach(spark: SparkSession, capacity: Int = 1024): ProgressListener = {
    val l = new ProgressListener(capacity)
    spark.streams.addListener(l)
    l
  }
}
