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

  /** Near-duplicate streaming dedup for EMBEDDING rows via product-
    * quantization code collision: each arriving vector is encoded to
    * its m nibble codes against an offline-trained codebook (the
    * batch-side Pq.codebooks artifact, shipped as a literal), and
    * `dropDuplicatesWithinWatermark` keys on the code tuple. Vectors
    * that quantize identically — exact copies and near-copies within
    * the codeword cells — collapse to the first arrival; state is one
    * entry per distinct code tuple in the lateness window, bounded by
    * kCode^m regardless of stream volume. This is the embedding
    * analog of the SimHash text path below, with the quantization
    * granularity tunable via (m, kCode) instead of hash bits.
    */
  def embeddingNearWithinWatermark(df: DataFrame, books: Seq[Seq[Seq[Double]]],
                                   vecCol: String, timeCol: String,
                                   delay: String = "10 minutes"): DataFrame = {
    requireFree(df, "__pq")
    df.withColumn("__pq", graft.operators.Pq.encodeExpr(col(vecCol), books))
      .withWatermark(timeCol, delay)
      .dropDuplicatesWithinWatermark(Seq("__pq"))
      .drop("__pq")
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
