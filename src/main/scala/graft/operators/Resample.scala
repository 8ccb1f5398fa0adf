package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling with forward fill — the charting/feature
  * op the reference's dashboard needs for every thinly-traded symbol
  * (a 5m candle chart with holes, an indicator over "latest known
  * close per hour"): bars exist only where trades happened, but the
  * consumer wants one row per (symbol, grid step) with the last known
  * value carried across the gaps.
  *
  * Scale shape: the grid is generated per symbol with `sequence()` —
  * O(symbols × steps) rows, the same magnitude as the bar layer it
  * fills, never O(trades) — and the fill is one `last(_, ignoreNulls)`
  * running window per symbol ordered by grid time: a single shuffle on
  * symbol, no self-join, no as-of join against the bar set. Spark's
  * running-frame window keeps O(1) state per partition row (the last
  * non-null seen), so a symbol's full history streams through one
  * sorted pass.
  */
object Resample {

  /** One row per `stepMs` grid point per key, between each key's own
    * min and max observed `timeMs`, with `valueCol` forward-filled
    * across gaps. Output: key, grid time, the original value where a
    * row existed (null in gaps), the filled value, and an is_gap flag.
    *
    * Grid points are per-key (not a global span): a symbol that
    * listed mid-month must not emit a week of leading nulls no fill
    * can reach.
    */
  def gapFillForward(df: DataFrame, keyCol: String, timeMsCol: String,
                     valueCol: String, stepMs: Long): DataFrame = {
    require(stepMs > 0, s"stepMs must be positive, got $stepMs")
    // Off-grid observations would silently miss the equi-join and read
    // as gaps with their value lost — enforced, not documented, per
    // the rollup-guard convention (assert_true survives optimization).
    val aligned = df.filter(
      assert_true(col(timeMsCol) % stepMs === 0,
        lit(s"gapFillForward: $timeMsCol must be aligned to stepMs=$stepMs")).isNull)
    val grid = aligned
      .groupBy(col(keyCol))
      .agg(min(col(timeMsCol)).as("__lo"), max(col(timeMsCol)).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), lit(stepMs))).as(timeMsCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeMsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(aligned.select(col(keyCol), col(timeMsCol), col(valueCol)),
        Seq(keyCol, timeMsCol), "left")
      .select(col(keyCol), col(timeMsCol), col(valueCol),
        last(col(valueCol), ignoreNulls = true).over(w).as(s"${valueCol}_filled"),
        col(valueCol).isNull.as("is_gap"))
  }
}
