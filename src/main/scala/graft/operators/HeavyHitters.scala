package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact heavy hitters over an unbounded-cardinality column — the
  * "which tokens/domains/symbols exceed φ of all traffic" question a
  * curation pipeline asks where a full `groupBy(item)` would shuffle
  * O(distinct items) rows (for web-scale token or URL columns, itself
  * a giant intermediate).
  *
  * Two passes, both with memory and shuffle volume bounded by the
  * sketch size k rather than the item cardinality:
  *
  *  1. a mergeable Misra-Gries summary (k counters per partition,
  *     merged pairwise) finds a candidate superset in one scan. After
  *     ANY reduce/merge tree the undercount of every counter is at
  *     most n/(k+1) (Agarwal et al., "Mergeable Summaries", PODS'12),
  *     so with k ≥ 2/φ every item of true frequency ≥ φn is
  *     guaranteed present — no false negatives, deterministically,
  *     regardless of partitioning.
  *  2. the ≤ k surviving candidates are counted EXACTLY in a second
  *     scan (broadcast isin filter → hash aggregate over ≤ k keys)
  *     and thresholded.
  *
  * The output is therefore exact and partitioning-independent even
  * though pass 1 is a sketch: run-to-run variation in which
  * sub-threshold candidates pass 1 emits is erased by the exact
  * count + threshold. The one driver-side materialization is the
  * sketch itself — ≤ k counters, by construction small (same contract
  * as Sampling.selectSmallestK's histogram).
  */
object HeavyHitters {

  /** Mergeable Misra-Gries summary: ≤ k counters + processed total. */
  case class MG(counters: Map[String, Long], total: Long, k: Int)

  /** The sketch as a typed Aggregator, usable standalone (e.g. per
    * group via KeyValueGroupedDataset.agg for per-partition-key heavy
    * hitters).
    */
  def sketch(k: Int): Aggregator[String, MG, MG] = new Aggregator[String, MG, MG] {
    require(k >= 1, s"need k >= 1, got $k")

    override def zero: MG = MG(Map.empty, 0L, k)

    override def reduce(b: MG, item: String): MG = {
      val c = b.counters
      c.get(item) match {
        case Some(v) => MG(c.updated(item, v + 1), b.total + 1, k)
        case None if c.size < k => MG(c.updated(item, 1L), b.total + 1, k)
        case None =>
          // Decrement-all: drop one occurrence of every tracked item
          // AND the new item. O(k), amortized O(1) per input.
          MG(c.transform((_, v) => v - 1).filter(_._2 > 0), b.total + 1, k)
      }
    }

    override def merge(a: MG, b: MG): MG = {
      val combined = b.counters.foldLeft(a.counters) { case (m, (item, v)) =>
        m.updated(item, m.getOrElse(item, 0L) + v)
      }
      val trimmed =
        if (combined.size <= k) combined
        else {
          // Subtract the (k+1)-th largest count from everything and
          // drop the non-positive — the merge rule that preserves the
          // n/(k+1) undercount bound (Mergeable Summaries §3.1).
          val d = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
          combined.transform((_, v) => v - d).filter(_._2 > 0)
        }
      MG(trimmed, a.total + b.total, k)
    }

    override def finish(r: MG): MG = r
    override def bufferEncoder: Encoder[MG] = Encoders.product[MG]
    override def outputEncoder: Encoder[MG] = Encoders.product[MG]
  }

  /** All items whose frequency is ≥ phiE6/1e6 of all non-null rows,
    * with exact counts, ordered by (tf desc, item). `k` defaults to
    * 2/φ + 1, the smallest sketch honoring the no-false-negative
    * guarantee; raise it to shrink pass-1's candidate surplus.
    */
  def exactHeavyHitters(df: DataFrame, itemCol: String, phiE6: Long,
                        k: Int = 0): DataFrame = {
    require(phiE6 > 0 && phiE6 <= 1000000L, s"need 0 < phiE6 <= 1e6, got $phiE6")
    val kk = if (k > 0) k else (2000000L / phiE6 + 1).toInt
    // Guarantee needs undercount bound n/(kk+1) < threshold φn.
    require((kk + 1).toLong * phiE6 > 1000000L,
      s"sketch k=$kk too small for phiE6=$phiE6 (needs k+1 > 1e6/phiE6)")
    // The "metadata-sized driver collect" contract is only true if k
    // is actually metadata-sized: a tiny φ (or an explicit huge k)
    // would turn the sketch into a multi-million-entry driver Map and
    // a same-sized In predicate. Fail loudly instead.
    require(kk <= 1000000,
      s"sketch k=$kk exceeds the 1e6 bound — phiE6=$phiE6 is too small " +
        "for an exact heavy-hitter pass; use a plain groupBy for that regime")
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(itemCol).cast("string")).na.drop().as[String]
    val mg = items.select(sketch(kk).toColumn).head()
    // tf·1e6 ≥ total·φE6  ⟺  tf ≥ ⌈total·φE6 / 1e6⌉ — computed in
    // BigInt so web-scale totals (total·φE6 > 2⁶³) cannot wrap (the
    // b8 overflow class; tf itself is bounded by total, a Long).
    val minTf = ((BigInt(mg.total) * phiE6 + 999999) / 1000000).toLong
    // Empty sketch ⇒ the MG bound already proves no item can reach
    // the threshold: emit the empty result without a sentinel probe
    // (lit(false) folds to an empty LocalRelation — no second scan).
    val survivors =
      if (mg.counters.isEmpty) df.filter(lit(false))
      else df.filter(col(itemCol).isInCollection(mg.counters.keys.toSeq))
    survivors
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("tf"))
      .filter(col("tf") >= minTf)
      .orderBy(col("tf").desc, col(itemCol))
  }
}
