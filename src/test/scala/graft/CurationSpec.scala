package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation
import graft.sources.Tables

/** Library-level contract for the composed curation pipeline: the
  * full chain (quality → dedup → decontaminate → caps → shards) must
  * be deterministic under any input partitioning — the property that
  * makes a 1000-executor curation run reproducible — and each stage's
  * invariants must survive composition.
  */
class CurationSpec extends SparkSpecBase {

  private val bench = pmod(col("doc_id"), lit(97)) === 0
  private val cfg = Curation.Config(perSourceCap = 5, shardTokenBudget = 2000L)

  private def run(parts: Int): Set[(Long, String, Long, Long)] =
    Curation.curate(Tables.documents(spark, Sf).repartition(parts), bench, cfg)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("shard_id")))
      .toSet

  test("pipeline output is identical at different parallelism") {
    val a = run(3)
    val b = run(17)
    assert(a.nonEmpty)
    assert(a === b)
  }

  test("optional LM-quality gate shrinks the corpus and stays deterministic") {
    // Uncapped on both sides: under a per-source cap (or when the gate
    // drops a dup cluster's min-id survivor) the gated run can admit
    // docs the ungated run capped out, so set-inclusion of final
    // outputs is NOT an invariant — corpus shrinkage is.
    def runWith(parts: Int, drop: Boolean) =
      Curation.curate(Tables.documents(spark, Sf).repartition(parts), bench,
          Curation.Config(shardTokenBudget = 2000L, dropLmTail = drop))
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard_id"))).toSet
    val gated = runWith(3, drop = true)
    assert(gated === runWith(11, drop = true)) // still partitioning-invariant
    assert(gated.nonEmpty)
    // The tail tercile is nonempty by construction (≥ ⌈n/3⌉ docs score
    // ≤ p33), so the gated corpus must be strictly smaller.
    assert(gated.size < runWith(3, drop = false).size)
  }

  test("composed invariants: bench excluded, caps respected, shards budget-bounded") {
    val out = run(7)
    // The held-out eval slice never reaches the corpus.
    assert(out.forall(_._1 % 97 != 0))
    // Per-source caps hold after all upstream filtering.
    out.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.size <= cfg.perSourceCap, s"source $src over cap")
    }
    // Shard packing: each shard's token sum exceeds the budget by at
    // most its largest single document (the prefix-cut rule's bound).
    out.groupBy(_._4).foreach { case (shard, rows) =>
      val total = rows.toSeq.map(_._3).sum
      val maxDoc = rows.toSeq.map(_._3).max
      assert(total <= cfg.shardTokenBudget + maxDoc,
        s"shard $shard holds $total tokens (budget ${cfg.shardTokenBudget}, max doc $maxDoc)")
    }
  }
}
