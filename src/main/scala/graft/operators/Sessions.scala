package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session windows — gap-based event sessionization
  * (`session_window`, the windowing mode the reference documents but
  * does not use, SPARK_STREAMING.md:49; a training-data pipeline uses
  * it for user-activity segmentation).
  *
  * Works identically in batch and streaming (with a watermark). Sum
  * columns go through DECIMAL so the per-session aggregates are
  * aggregation-order-independent.
  */
object Sessions {

  /** Per-key session aggregate: events closer than `gap` merge into
    * one session; session_end = last event + gap.
    */
  def sessionStats(events: DataFrame, keyCol: String, timeCol: String,
                   valueCol: String, gap: String): DataFrame =
    events
      .groupBy(col(keyCol), session_window(col(timeCol), gap).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col(keyCol),
        unix_millis(col("w.start")).as("session_start_ms"),
        unix_millis(col("w.end")).as("session_end_ms"),
        col("n_events"), col("sum_value"))
}
