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

  test("c2 oracle-checked chain: dups collapse, non-en dropped, quotas bite, buckets monotone") {
    import spark.implicits._
    val base = Tables.documents(spark, Sf)
    // Plant: a case-variant duplicate of doc 0 (id 90001, must lose to
    // the lower id) and a German doc (stopword hits -> lang_pred=de,
    // must be filtered).
    val d0 = base.filter(col("doc_id") === 0).select(col("text")).collect().head.getString(0)
    val planted = Seq(
      (90001L, d0.toUpperCase, "en", "synth", d0.length.toLong),
      (90002L, "der hund und die katze ist nicht ein tier", "de", "synth", 41L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.PipelineQueries.curationPipelineOn(base.unionByName(planted))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(90001L), "case-variant duplicate must lose exact dedup to doc 0")
    assert(!ids.contains(90002L), "German doc must not pass the en gate")
    val rows = out.collect()
    // Bucket thresholds are a pure function of the score.
    assert(rows.forall { r =>
      val (s, b) = (r.getAs[Long]("score_milli"), r.getAs[String]("bucket"))
      (b == "head" && s > 5000) || (b == "middle" && s >= -2500 && s <= 5000) ||
        (b == "tail" && s < -2500)
    })
    // Sampling quotas: head keeps every doc whose hash admits 10000/10000.
    val quotas = Map("head" -> 10000L, "middle" -> 5000L, "tail" -> 1000L)
    val hashOk = rows.forall { r =>
      val id = r.getAs[Long]("doc_id")
      val h = ((id % 1000000007L) * 2654435761L % 1000000007L * 40503L) % 1000000007L % 10000L
      h < quotas(r.getAs[String]("bucket"))
    }
    assert(hashOk, "every surviving row must satisfy its bucket's hash quota")
    assert(rows.nonEmpty)
  }

  test("score calibration: pct_rank spans [0,1] per source and is monotone in score") {
    val rows = graft.PipelineQueries.scoreCalibration(spark, Sf)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("score_milli"), r.getAs[Double]("pct_rank")))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      assert(sorted.head._3 === 0.0, s"$src: lowest score must rank 0")
      assert(sorted.last._3 === 1.0, s"$src: highest score must rank 1")
      assert(sorted.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        s"$src: pct_rank must be monotone in score")
    }
  }

  test("source overlap: planted cross-source copy yields exactly its shingle count") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon"
    val d = Seq(
      (1L, shared, "en", "srcA", 30L),
      (2L, "zeta eta theta iota kappa", "en", "srcA", 25L),
      (3L, shared, "en", "srcB", 30L),
      (4L, "lambda mu nu xi omicron", "en", "srcB", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.PipelineQueries.sourceOverlapOn(d).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("source_a") === "srcA" && r.getAs[String]("source_b") === "srcB")
    // 5 tokens -> 3 distinct 3-gram shingles, all and only from the copy.
    assert(r.getAs[Long]("n_shared") === 3L)
  }

  test("ngram novelty: duplicate doc scores 0, disjoint doc scores 1e6, first owner wins") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta", "en", "s", 22L),
      (2L, "alpha beta gamma delta", "en", "s", 22L), // exact copy, higher id
      (3L, "zeta eta theta iota", "en", "s", 19L),    // fully novel
      (4L, "beta gamma delta zeta", "en", "s", 21L))  // 1 shared shingle of 2
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.PipelineQueries.ngramNoveltyOn(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === ((2L, 2L, 1000000L)), "first owner keeps full novelty")
    assert(out(2L) === ((2L, 0L, 0L)), "exact copy is all re-seen")
    assert(out(3L) === ((2L, 2L, 1000000L)), "disjoint doc is fully novel")
    // doc 4: shingles (beta gamma delta) seen in doc 1, (gamma delta zeta) new.
    assert(out(4L) === ((2L, 1L, 500000L)))
  }

  test("incremental novelty: batch measured against the corpus index only") {
    import spark.implicits._
    val corpus = Seq((0L, "alpha beta gamma delta", "en", "s", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val batch = Seq(
      (1L, "alpha beta gamma delta", "en", "s", 22L),  // fully indexed
      (3L, "zeta eta theta iota", "en", "s", 19L),     // fully novel
      (5L, "zeta eta theta iota", "en", "s", 19L))     // dup WITHIN batch: still novel vs corpus
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.PipelineQueries.incrementalNoveltyOn(corpus, batch).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((2L, 0L, 0L)))
    assert(out(3L) === ((2L, 2L, 1000000L)))
    // Incremental semantics: novelty is vs the CORPUS index — batch-
    // internal dups don't consume each other's novelty (dedup within
    // the batch is d16's job, run before or after by policy).
    assert(out(5L) === ((2L, 2L, 1000000L)))
  }

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
