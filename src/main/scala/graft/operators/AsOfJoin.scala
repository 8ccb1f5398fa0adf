package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to each left row the latest right row with
  * right.time <= left.time per key (the canonical market-data
  * operation: trade enriched with the prevailing quote; the reference
  * declares a quote stream it never consumes — quote.avsc,
  * SURVEY.md §1.1 — this operator is what consuming it looks like).
  *
  * Spark-first implementation (preference order (a) of the build
  * rules): no custom physical node — tag both sides, union, and carry
  * the last right payload forward with an unbounded-preceding window
  * ordered by (time, side). One shuffle on the key, one sort within
  * partitions — the same cost profile as a sort-merge join, and the
  * window state is O(payload), not O(history). At equal timestamps the
  * right row sorts first, giving the standard at-or-before semantics
  * (matches DuckDB/kdb ASOF).
  *
  * `toleranceMs`: right rows older than left.time - tolerance are
  * nulled out (stale-quote guard).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           rightPayload: Seq[String], prefix: String = "asof_",
           toleranceMs: Option[Long] = None): DataFrame = {
    val payloadRenamed = rightPayload.map(p => p -> s"$prefix$p")
    val r = right.select(
      (keys.map(col) :+ col(rightTime).as("__t")) ++
        payloadRenamed.map { case (p, a) => col(p).as(a) }: _*)
      .withColumn("__side", lit(0))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry the matched right row as ONE struct, not per-column: with
    // independent last(_, ignoreNulls) carries, a NULL field in the
    // matched quote would silently backfill from an OLDER quote,
    // blending two right rows. The struct is non-null for every right
    // row (even all-NULL payloads), so the whole match stands or falls
    // together — single-row ASOF semantics as in DuckDB/kdb.
    val carryFields = payloadRenamed.map { case (_, a) => col(a) } :+
      col("__t").as(s"${prefix}time")
    val carried = unioned.withColumn("__carry",
      last(when(col("__side") === 0, struct(carryFields: _*)), ignoreNulls = true).over(w))

    val gated = toleranceMs match {
      case Some(tol) =>
        // Age in ms for timestamp time columns; in the column's own
        // unit for numeric time columns.
        val isTs = left.schema(leftTime).dataType ==
          org.apache.spark.sql.types.TimestampType
        val matchT = col("__carry")(s"${prefix}time")
        val age =
          if (isTs) unix_millis(col("__t")) - unix_millis(matchT)
          else col("__t") - matchT
        carried.withColumn("__carry", when(age <= tol, col("__carry")))
      case None => carried
    }
    val outNames = payloadRenamed.map(_._2) :+ s"${prefix}time"
    val expanded = outNames.foldLeft(gated)((df, name) =>
      df.withColumn(name, col("__carry")(name)))
    expanded.filter(col("__side") === 1).drop("__t", "__side", "__carry")
  }
}
