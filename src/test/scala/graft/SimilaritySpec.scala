package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("cosine: identical vectors 1, orthogonal 0, opposite -1") {
    val df = Seq(
      (1L, Seq(1f, 0f), Seq(1f, 0f)),
      (2L, Seq(1f, 0f), Seq(0f, 1f)),
      (3L, Seq(1f, 0f), Seq(-1f, 0f))).toDF("id", "a", "b")
      .select(col("id"), Similarity.cosine(col("a"), col("b")).as("cos"))
    val m = df.collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("cos")).toMap
    assert(math.abs(m(1L) - 1.0) < 1e-12)
    assert(math.abs(m(2L)) < 1e-12)
    assert(math.abs(m(3L) + 1.0) < 1e-12)
  }

  test("bq: sign codes pack all 64 bits; hamming 0 for twins, 64 for negation") {
    // v has every sign pattern; -v flips every bit (no zero entries,
    // so the > 0 test is symmetric); bit 63 (Long.MinValue) must pack.
    val v = (0 until 64).map(i => if (i % 3 == 0) 1.0f else -1.0f)
    val allPos = Seq.fill(64)(1.0f)
    val df = Seq((1L, v), (2L, v.map(-_)), (3L, v), (4L, allPos))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.bqCode(col("embedding")).as("code"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === m(3L))
    assert(java.lang.Long.bitCount(m(1L) ^ m(2L)) === 64)
    assert(m(4L) === -1L, "all 64 bits set = -1 (bit 63 is the sign bit)")
    assert(java.lang.Long.bitCount(m(1L)) === (0 until 64).count(_ % 3 == 0))
  }

  test("bq top-k: a planted twin is hamming-0 and survives the exact rerank at rank 1") {
    val rnd = new scala.util.Random(7)
    def vec() = Seq.fill(64)(rnd.nextFloat() * 2 - 1)
    val corpus = (10L to 49L).map(i => (i, vec()))
    val qv = vec()
    val all = ((1L, qv) +: (5L, qv) +: corpus).toDF("vec_id", "embedding")
    val out = Similarity.bqTopK(all.filter(col("vec_id") === 1), all, k = 3, rerank = 4)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.head.getAs[Long]("neighbor_id") === 5L)
    assert(out.head.getAs[Int]("hamming") === 0)
    assert(out.head.getAs[Double]("cos") === 1.0)
    assert(out.length === 3)
  }

  test("native CosineSim is bit-identical to the fold-based form") {
    val e = Tables.embeddings(spark, Sf).limit(100)
    val a = e.as("a"); val b = e.as("b")
    val both = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .select(
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("native"),
        Similarity.cosineFold(col("a.embedding"), col("b.embedding")).as("fold"))
    assert(both.filter(col("native") =!= col("fold")).count() === 0)
  }

  test("brute-force top-1 of a duplicated vector is its twin") {
    val e = Tables.embeddings(spark, Sf)
    // Duplicate vec 0 as id 10000.
    val dup = e.filter(col("vec_id") === 0)
      .select(lit(10000L).as("vec_id"), col("embedding"), col("label"))
    val cands = e.unionByName(dup)
    val top = Similarity.bruteForceTopK(e.filter(col("vec_id") === 0), cands, k = 1)
      .collect().head
    assert(top.getAs[Long]("neighbor_id") === 10000L)
    assert(math.abs(top.getAs[Double]("cos_sim") - 1.0) < 1e-6)
  }

  test("IVF probes recover a meaningful fraction of true neighbors; duplicate lands in same cell") {
    val e = Tables.embeddings(spark, Sf)
    val queries = e.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(queries, e, k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = graft.operators.Ivf.ivfTopK(queries, e, k = 5, nCentroids = 16, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // Probing 4 of 16 cells scans ~25% of the corpus; on unclustered
    // random vectors recall tracks the scan fraction.
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall > 0.12, s"recall=$recall")
    // An exact duplicate always assigns to the same cell as its twin
    // and must be retrieved as the top neighbor.
    val dup = e.filter(col("vec_id") === 0)
      .select(lit(10000L).as("vec_id"), col("embedding"), col("label"))
    val top = graft.operators.Ivf.ivfTopK(e.filter(col("vec_id") === 0),
        e.unionByName(dup), k = 1).collect().head
    assert(top.getAs[Long]("neighbor_id") === 10000L)
  }

  test("PQ: codes are compact, duplicate reconstructions collide, ADC recall is sane") {
    import graft.operators.Pq
    val e = Tables.embeddings(spark, Sf)
    val books = Pq.codebooks(e, m = 8, kCode = 16)
    assert(books.length === 8 && books.forall(_.length === 16) &&
      books.forall(_.forall(_.length === 8)))
    // The compressed index: 8 codes, each in [0, 16) — a nibble per
    // subspace, 64x smaller than the 64-float vector.
    val enc = Pq.encode(e, books).collect()
    assert(enc.forall(_.getSeq[Int](1).length === 8))
    assert(enc.flatMap(_.getSeq[Int](1)).forall(c => c >= 0 && c < 16))
    // Byte-identical vectors encode to identical codes (quantization
    // is a pure function of the vector), so an exact duplicate is
    // always retrieved with the same approx score as its twin.
    val dup = e.filter(col("vec_id") === 0)
      .select(lit(10000L).as("vec_id"), col("embedding"), col("label"))
    val encDup = Pq.encode(e.filter(col("vec_id") === 0).unionByName(dup), books)
      .collect().map(_.getSeq[Int](1).toList).distinct
    assert(encDup.length === 1)
    // ADC ranking approximates the exact ranking: 16 codewords per
    // 8-dim subspace is a coarse quantizer, but recall@5 must beat
    // chance (~1%) by a wide margin on the 1000-vector corpus.
    val queries = e.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(queries, e, k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val pq = Pq.pqTopK(queries, e, k = 5, m = 8, kCode = 16)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute intersect pq).size.toDouble / brute.size
    assert(recall > 0.10, s"recall=$recall")
  }

  test("IVF-PQ: results are the probed-cell subset of full-scan PQ; duplicate still found") {
    import graft.operators.Pq
    val e = Tables.embeddings(spark, Sf)
    val queries = e.filter(col("vec_id") < 20)
    // Composition invariant: every IVF-PQ pair must also appear in the
    // full-scan PQ ranking's candidate scores (same codebooks, same
    // ADC) — cell pruning can only REMOVE candidates, never re-score.
    val ivfpq = Pq.ivfPqTopK(queries, e, k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("approx_cos"))).toSet
    val books = Pq.codebooks(e, m = 8, kCode = 16)
    val recon = e.select(col("vec_id").as("neighbor_id"),
      Pq.reconstructExpr(Pq.encodeExpr(col("embedding"), books), books).as("rv"))
    val allScores = recon.join(
        queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("qv"), col("rv")), 6).as("approx_cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ivfpq.subsetOf(allScores), "IVF-PQ scores must agree with full-scan ADC")
    // An exact duplicate quantizes to the same cell AND the same codes:
    // retrieved first with the twin's own reconstruction score.
    val dup = e.filter(col("vec_id") === 0)
      .select(lit(10000L).as("vec_id"), col("embedding"), col("label"))
    val top = Pq.ivfPqTopK(e.filter(col("vec_id") === 0), e.unionByName(dup), k = 1)
      .collect().head
    assert(top.getAs[Long]("neighbor_id") === 10000L)
  }

  test("PQ on an empty corpus returns an empty, correctly-shaped frame") {
    import graft.operators.Pq
    val e = Tables.embeddings(spark, Sf)
    val out = Pq.pqTopK(e.filter(col("vec_id") < 5), e.limit(0), k = 5)
    assert(out.columns.toSeq === Seq("query_id", "neighbor_id", "approx_cos", "rank"))
    assert(out.count() === 0)
  }

  test("streaming embedding dedup: PQ-code collisions collapse to first arrival, batch-consistent") {
    import graft.operators.Pq
    implicit val sqlCtx = spark.sqlContext
    val e = Tables.embeddings(spark, Sf)
    val books = Pq.codebooks(e, m = 8, kCode = 16)
    // Candidate stream rows: vec 0, its exact copy, its ±0.01% scaled
    // near-copy, and a different base vector.
    val v0 = e.filter(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0).toList
    val near = v0.map(x => (x * 1.0001f))
    val v7 = e.filter(col("vec_id") === 7).select("embedding")
      .collect().head.getSeq[Float](0).toList
    val rows = Seq((1L, v0, "2024-01-01 00:00:00"), (2L, v0, "2024-01-01 00:01:00"),
      (3L, near, "2024-01-01 00:02:00"), (4L, v7, "2024-01-01 00:03:00"))
    // Batch-side expectation: which rows share a code tuple?
    import spark.implicits._
    val batchCodes = Pq.encode(
        rows.toDF("vec_id", "embedding", "ts").select(col("vec_id"), col("embedding")), books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val expectedSurvivors = rows.map(_._1).groupBy(batchCodes).map(_._2.min).toSet
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, List[Float], String)]
    val docs = mem.toDF().toDF("vec_id", "embedding", "ts")
      .withColumn("event_time", col("ts").cast("timestamp"))
    val q = graft.streaming.StreamingDedup
      .embeddingNearWithinWatermark(docs, books, "embedding", "event_time", "1 hour")
      .writeStream.format("memory").queryName("sembdedup_out").outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("sembdedup_out").collect().map(_.getAs[Long]("vec_id")).toSet
    assert(kept === expectedSurvivors, s"stream survivors must match batch code groups")
    // The exact copy NEVER survives, and an unrelated vector always does.
    assert(!kept.contains(2L) && kept.contains(4L) && kept.contains(1L))
  }

  test("LSH buckets preserve exact duplicates and recall is sane") {
    val e = Tables.embeddings(spark, Sf)
    val queries = e.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(queries, e, k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val lsh = Similarity.lshTopK(queries, e, k = 5, dim = 64, planes = 6, tables = 8)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // Random 64-d vectors are near-orthogonal (top-5 cos ~0.3), the
    // hardest case for sign-LSH: one 6-plane table recalls ~5%. Eight
    // tables lift that to ~1-(1-0.05)^8 ~ 0.33. Assert well above the
    // single-table rate and far above chance (~1%).
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall > 0.15, s"recall=$recall")
    // And every LSH result must share the query's bucket by construction:
    // verified implicitly — lshTopK only scores same-bucket pairs.
  }

  test("LSH embedding-dup pairs equal the all-pairs baseline on planted near-dups") {
    import graft.operators.Dedup
    val base = Tables.embeddings(spark, Sf).filter(col("vec_id") < 50)
    val origs = base.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val copies = base.select(col("vec_id"),
      transform(col("embedding"), (x, d) =>
        x.cast("double") * (lit(1.0) + (pmod(col("vec_id") + d, lit(7)) - 3).cast("double") / 100.0))
        .as("embedding"))
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val vecs = origs.unionByName(copies)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = rows(Dedup.embeddingDupPairsLsh(vecs, minCos = 0.9, dim = 64))
    val brute = rows(Dedup.embeddingDupPairs(vecs, minCos = 0.9))
    assert(lsh === brute)
    assert(lsh.size === 50) // exactly the planted (orig, copy) pairs
  }

  test("semantic decontamination flags planted contamination, not clean eval members") {
    import graft.operators.Dedup
    val base = Tables.embeddings(spark, Sf).filter(col("vec_id") < 60)
    val corpus = base.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    // Contaminated eval rows: perturbed twins of corpus ids 0..9;
    // clean eval rows: reversed vectors of ids 30..39.
    val contaminated = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100L).as("vec_id"),
        transform(col("embedding"), (x, d) =>
          x.cast("double") * (lit(1.0) + (pmod(col("vec_id") + d, lit(7)) - 3).cast("double") / 100.0))
          .as("embedding"))
    val clean = base.filter(col("vec_id") >= 30 && col("vec_id") < 40)
      .select((col("vec_id") + 200L).as("vec_id"),
        transform(reverse(col("embedding")), x => x.cast("double")).as("embedding"))
    val out = Dedup.semanticDecontam(corpus, contaminated.unionByName(clean),
        minCos = 0.9, dim = 64).collect()
      .map(r => r.getAs[Long]("corpus_id") ->
        (r.getAs[Long]("n_matches"), r.getAs[Long]("min_eval_id"))).toMap
    // Exactly the 10 contaminated corpus docs flagged, each by its twin.
    assert(out.keySet === (0L until 10L).toSet)
    (0L until 10L).foreach { id =>
      assert(out(id) === ((1L, id + 100L)), s"corpus doc $id")
    }
    // Plan shape: eval side broadcast, candidate join is an equi-join.
    val plan = Dedup.semanticDecontam(corpus, contaminated, minCos = 0.9, dim = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "decontamination must never go all-pairs over the corpus")
  }

  test("SQ8: codes bounded, duplicate reconstructions collide, recall near-exact") {
    val e = Tables.embeddings(spark, Sf)
    val (mins, maxs) = Similarity.sq8Grid(e)
    assert(mins.size === 64 && maxs.size === 64)
    assert(mins.zip(maxs).forall { case (mn, mx) => mn <= mx })
    // Codes are uint8-range ints.
    val codes = e.limit(50)
      .select(Similarity.sq8Encode(col("embedding"), mins, maxs).as("c"))
      .collect().flatMap(_.getSeq[Int](0))
    assert(codes.forall(c => c >= 0 && c <= 255))
    // An exact duplicate encodes (hence reconstructs) identically, so
    // it is the top-1 with approx_cos exactly 1.0 after rounding.
    val dup = e.filter(col("vec_id") === 0)
      .select(lit(10000L).as("vec_id"), col("embedding"), col("label"))
    val top = Similarity.sq8TopK(e.filter(col("vec_id") === 0),
      e.unionByName(dup), k = 1).collect().head
    assert(top.getAs[Long]("neighbor_id") === 10000L)
    assert(math.abs(top.getAs[Double]("approx_cos") - 1.0) < 1e-4)
    // 8 bits per dim keeps the quantization error tiny (step/2 per
    // dim), so SQ8 recall@5 should be near-exact — far above any of
    // the sub-byte codecs (PQ recalls ~0.1-0.3 here).
    val queries = e.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(queries, e, k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val sq8 = Similarity.sq8TopK(queries, e, k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute intersect sq8).size.toDouble / brute.size
    assert(recall > 0.8, s"recall=$recall")
  }

  test("SQ8: fused native round trip is bit-identical to the HOF encode∘reconstruct") {
    val e = Tables.embeddings(spark, Sf).limit(200)
    val (mins, maxs) = Similarity.sq8Grid(Tables.embeddings(spark, Sf))
    val hof = e.select(col("vec_id"), Similarity.sq8Reconstruct(
        Similarity.sq8Encode(col("embedding"), mins, maxs), mins, maxs).as("rv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val fused = e.select(col("vec_id"),
        graft.functions.VectorFunctions.sq8RoundTrip(col("embedding"), mins, maxs).as("rv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(fused.keySet === hof.keySet)
    // Bit-identity, not approximate equality: the fused loop must
    // replay the HOF arithmetic op-for-op (oracle hashes depend on it).
    fused.foreach { case (id, v) =>
      assert(v.map(java.lang.Double.doubleToLongBits) ===
        hof(id).map(java.lang.Double.doubleToLongBits), s"vec $id")
    }
    // Grid-length mismatch fails loudly instead of silently nulling —
    // and with THE length-mismatch error, not any incidental failure.
    val short = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val err = intercept[Exception] {
      short.select(graft.functions.VectorFunctions
        .sq8RoundTrip(col("embedding"), mins, maxs)).collect()
    }
    val msgs = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgs.contains("sq8_roundtrip"), s"unexpected failure: $msgs")
    // NaN elements converge on code 0 (→ mn) in BOTH paths, as the
    // Sq8RoundTrip scaladoc documents: the HOF's long-returning floor
    // turns the NaN quotient into 0, and the native loop's
    // (int)Math.min(NaN, 255.0) is also 0. The assertion below is
    // bit-identity, pinning that shared convergence.
    val nanV = Seq((1L, (0 until mins.size).map(i => if (i == 0) Float.NaN else 0.5f)))
      .toDF("vec_id", "embedding")
    val nanHof = nanV.select(Similarity.sq8Reconstruct(
        Similarity.sq8Encode(col("embedding"), mins, maxs), mins, maxs).as("rv"))
      .collect().head.getSeq[Double](0)
    val nanFused = nanV.select(graft.functions.VectorFunctions
        .sq8RoundTrip(col("embedding"), mins, maxs).as("rv"))
      .collect().head.getSeq[Double](0)
    assert(nanFused.map(java.lang.Double.doubleToLongBits) ===
      nanHof.map(java.lang.Double.doubleToLongBits))
  }

  test("SQ8: constant dimensions quantize cleanly (no NaN, no div-by-zero)") {
    val vecs = Seq(
      (1L, Seq(1.0f, 5.0f, 0.0f)),
      (2L, Seq(1.0f, 2.0f, 0.0f)),
      (3L, Seq(1.0f, 8.0f, 0.0f))).toDF("vec_id", "embedding")
    val (mins, maxs) = Similarity.sq8Grid(vecs)
    assert(mins(0) === 1.0 && maxs(0) === 1.0) // constant dim
    val out = Similarity.sq8TopK(vecs.filter(col("vec_id") === 1), vecs, k = 2).collect()
    assert(out.length === 2)
    assert(out.forall(r => !r.getAs[Double]("approx_cos").isNaN))
    // Reconstruction of the constant dim is the constant itself.
    val rv = vecs.select(Similarity.sq8Reconstruct(
        Similarity.sq8Encode(col("embedding"), mins, maxs), mins, maxs).as("rv"))
      .collect().map(_.getSeq[Double](0))
    assert(rv.forall(v => v(0) === 1.0 && v(2) === 0.0))
  }

  test("parameter guards reject degenerate LSH/MinHash configs") {
    val e = Tables.embeddings(spark, Sf)
    intercept[IllegalArgumentException] {
      Similarity.lshKey(col("embedding"), planes = 65, dim = 64)
    }
    intercept[IllegalArgumentException] {
      graft.functions.LshFunctions.signLshKeys(col("embedding"), planes = 65, tables = 2, dim = 64)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.minhashCandidates(
        Tables.documents(spark, Sf), k = 16, bands = 5)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.embeddingDupPairs(e, minCos = 0.9, maxRows = 10L)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.jaccardPairs(
        Tables.documents(spark, Sf), minJaccardE6 = 500000L, maxRows = 10L)
    }
  }
}
