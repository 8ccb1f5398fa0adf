package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-price snapshot per symbol with change vs the previous trade
  * (A6 — declared in the reference's keyspace.cql:132-141 and the
  * UPDATE statement cassandra_client.py:105-114, but never wired to a
  * writer; a reference gap we fill, SURVEY.md §2.5).
  *
  * Batch form: one window over (symbol) ordered by event time —
  * a single shuffle on symbol. Symbol cardinality is small relative to
  * rows, so at 100 TB this wants AQE skew handling if one symbol
  * dominates; the window itself only materializes two rows of state
  * per partition (row_number + lead), not the full history.
  *
  * Streaming form: graft.streaming.LatestPriceStream keeps one small
  * state record per symbol via flatMapGroupsWithState.
  */
object LatestPrices {

  def snapshot(silver: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol"))
      .orderBy(col("event_time").desc, col("event_id").desc)
    silver
      .withColumn("rn", row_number().over(w))
      // In descending order, the next row is the previous trade.
      .withColumn("prev_price", lead(col("price"), 1).over(w))
      .filter(col("rn") === 1)
      .select(
        col("symbol"),
        col("price").as("last_price"),
        col("volume").as("last_volume"),
        unix_millis(col("event_time")).as("last_trade_time_ms"),
        round(col("price") - col("prev_price"), 6).as("price_change"),
        when(col("prev_price").isNull || col("prev_price") === 0, lit(null))
          .otherwise(round((col("price") - col("prev_price")) / col("prev_price") * 100, 6))
          .as("price_change_pct"))
  }
}
