package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Streaming document deduplication — the SURVEY §7.6 combination of
  * content hashing with watermark-bounded streaming dedup state:
  * fingerprint each arriving document, then
  * `dropDuplicatesWithinWatermark` on the fingerprint. State holds one
  * entry per distinct fingerprint seen within the lateness window and
  * evicts at the watermark — the posture that survives unbounded
  * streams (an unbounded `dropDuplicates` would grow forever).
  *
  * Two grades:
  *  - exact: md5 of the normalized text — whitespace/case-insensitive
  *    exact dedup.
  *  - near: 32-bit SimHash — collapses near-duplicates whose
  *    fingerprints collide (small text edits flip few hash bits; for
  *    Hamming-distance > 0 matching, band the fingerprint like the
  *    batch LSH path).
  */
object StreamingDedup {

  /** Exact streaming dedup on normalized content. `df` must carry an
    * event-time column; `delay` is the allowed lateness.
    */
  private def requireFree(df: DataFrame, name: String): Unit =
    require(!df.columns.contains(name),
      s"input already has a column named $name; rename it first " +
        "(the dedup helper column would silently clobber it)")

  def exactWithinWatermark(df: DataFrame, textCol: String, timeCol: String,
                           delay: String = "10 minutes"): DataFrame = {
    requireFree(df, "__fp")
    df.withColumn("__fp", TextAnalysis.fingerprintMd5(col(textCol)))
      .withWatermark(timeCol, delay)
      .dropDuplicatesWithinWatermark(Seq("__fp"))
      .drop("__fp")
  }

  /** Near-duplicate streaming dedup via SimHash collision. */
  def nearWithinWatermark(df: DataFrame, textCol: String, timeCol: String,
                          delay: String = "10 minutes"): DataFrame = {
    requireFree(df, "__simhash")
    val hashed = Dedup.withSimhash(df, textCol, out = "__simhash")
    hashed
      .withWatermark(timeCol, delay)
      .dropDuplicatesWithinWatermark(Seq("__simhash"))
      .drop("__simhash")
  }
}
