package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the memory-compression
  * path of the ANN surface. The D-dim embedding is split into `m`
  * subvectors; each subvector is replaced by the index of its nearest
  * codeword from a per-subspace codebook of `kCode` entries. With
  * m=8, kCode=16 a 64-dim float32 vector (256 bytes) compresses to
  * 8 nibble codes — a 64× reduction that is the difference between
  * "the corpus index fits in cluster RAM" and "it does not" at 100 TB.
  *
  * Search is ADC (asymmetric distance computation) phrased Spark-first:
  * the candidate side is reconstructed from its codes + the broadcast
  * codebook literal inside a projection (no shuffle, no join for the
  * decode), and the exact query vector is scored against the
  * reconstruction. Everything on the big side is a single scan:
  *   encode (projection) -> reconstruct (projection) -> broadcast-join
  *   the tiny query set -> per-query top-k window.
  *
  * Determinism: codebooks come from the same smallest-id-hash sample
  * as Ivf's centroids; nearest-codeword assignment compares
  * 6-decimal-rounded left-fold L2² with codeword-index tie-break, so
  * codes — and therefore scores — are bit-identical on 1 core or 1000
  * executors, and reproducible by other engines (the DuckDB oracle
  * replays the whole pipeline in SQL).
  *
  * Complements the existing ANN family: s1 brute (exact baseline),
  * s2 sign-LSH (stateless bucketing), s3 IVF (cell pruning), s5 PQ
  * (memory compression). A production IVF-PQ composes s3's cell
  * assignment with this file's encode/ADC unchanged — both are
  * scan-side projections over the same pass.
  */
object Pq {

  /** Left-fold squared-L2 between two double arrays — strict
    * accumulation order, same as Similarity's cosine fold.
    */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Train per-subspace codebooks from a deterministic sample: the
    * `kCode` candidates with the smallest (id-hash, id) — the same
    * quantizer-training sample Ivf uses for centroids. Collected to
    * the driver (kCode rows, KBs) and shipped back as a broadcast
    * literal; the corpus itself is never collected. Returns
    * books(subspace)(codeword)(dim) with dim = D/m.
    */
  def codebooks(candidates: DataFrame, m: Int, kCode: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Seq[Double]]] = {
    val rows = Sampling.smallestByHash(candidates, kCode, idCol)
      .select(col(idCol), col(vecCol))
      .sort(col(idCol))
      .collect()
    if (rows.isEmpty) return Seq.empty
    val vecs: Seq[Seq[Double]] = rows.toIndexedSeq.map(_.getSeq[Any](1).map {
      case f: Float => f.toDouble
      case d: Double => d
      case other => throw new IllegalArgumentException(s"non-numeric vector element $other")
    }.toSeq)
    val d = vecs.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    (0 until m).map(mi => vecs.map(_.slice(mi * dsub, (mi + 1) * dsub)))
  }

  /** Encode a vector column to its `m` codes: for each subspace, the
    * index of the codeword minimizing (rounded L2², index). A pure
    * projection over the scan, evaluated by the native codegen'd
    * `PqCodes` expression — one fused loop per row instead of m*kCode
    * interpreted lambda folds. `encodeExprFold` below is the original
    * higher-order-function form, kept as the cross-checking reference
    * (PqSpec pins native === fold on real data).
    */
  def encodeExpr(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    graft.functions.PqFunctions.pqCodes(vec, books)

  /** Fold-form reference implementation of encodeExpr — array_min on
    * (dist, idx) structs uses lexicographic struct ordering, so ties
    * break to the smallest codeword index exactly like the oracle's
    * ROW_NUMBER.
    */
  def encodeExprFold(vec: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    val m = books.length
    val dsub = books.head.head.length
    val kCode = books.head.length
    val booksLit = typedLit(books)
    transform(sequence(lit(0), lit(m - 1)), mi => {
      val sub = transform(slice(vec, mi * lit(dsub) + 1, lit(dsub)), x => x.cast("double"))
      val cws = element_at(booksLit, mi + 1)
      val scored = zip_with(
        transform(cws, cw => round(l2sq(sub, cw), 6)),
        sequence(lit(0), lit(kCode - 1)),
        (dist, i) => struct(dist.as("d"), i.as("i")))
      array_min(scored)("i")
    })
  }

  /** Reconstruct the quantized vector from its codes: concatenate the
    * chosen codewords. Also a pure projection; native `PqReconstruct`
    * (single arraycopy per subspace).
    */
  def reconstructExpr(codes: Column, books: Seq[Seq[Seq[Double]]]): Column =
    graft.functions.PqFunctions.pqReconstruct(codes, books)

  /** Fold-form reference implementation of reconstructExpr. */
  def reconstructExprFold(codes: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    val booksLit = typedLit(books)
    flatten(zip_with(codes, sequence(lit(0), lit(books.length - 1)),
      (c, mi) => element_at(element_at(booksLit, mi + 1), c + 1)))
  }

  /** The compressed index: (id, codes). What a real deployment would
    * persist — m small ints per vector instead of D floats.
    */
  def encode(candidates: DataFrame, books: Seq[Seq[Seq[Double]]],
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    candidates.select(col(idCol), encodeExpr(col(vecCol), books).as("codes"))

  /** IVF-PQ top-k — the FAISS IndexIVFPQ arrangement, composed from
    * the library's own stages: Ivf's coarse quantizer prunes the
    * probe set to nProbe of nCentroids cells, and within the probed
    * cells the PQ codes stand in for the vectors (ADC against the
    * codeword reconstruction). This is THE production ANN shape at
    * 100 TB: cell pruning bounds how much is scanned, PQ bounds how
    * much memory what's scanned occupies. Codebooks here encode raw
    * vectors (IVFFlat+PQ) rather than cell residuals — residual
    * encoding adds a per-cell codebook without changing any join
    * shape, and raw-vector codes keep the DuckDB oracle a direct
    * composition of the s3 and s5 replays. Both quantizers train on
    * the same deterministic smallest-id-hash sample.
    */
  def ivfPqTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                nCentroids: Int = 16, nProbe: Int = 4,
                m: Int = 8, kCode: Int = 16,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (centIds, centVecs) = Ivf.sampleCentroids(candidates, nCentroids, idCol, vecCol)
    val books = codebooks(candidates, m, kCode, idCol, vecCol)
    if (centVecs.isEmpty || books.isEmpty) {
      return queries.select(col(idCol).as("query_id"), col(idCol).as("neighbor_id"),
        lit(0.0).as("approx_cos"), lit(0).as("rank")).limit(0)
    }
    val idsArr = array(centIds.map(lit): _*)
    // Candidate side: one scan computes both the cell and the codes;
    // the exact vector is dropped — downstream only sees the index
    // artifacts (cell id + m nibbles), exactly what a deployment
    // persists.
    val cAssigned = Ivf.withCells(
        candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv")), "nv", 1, centVecs)
      .withColumn("centroid_id",
        element_at(idsArr, element_at(col("__cells"), 1)("i") + 1))
      .withColumn("codes", encodeExpr(col("nv"), books))
      .select("neighbor_id", "centroid_id", "codes")
      .withColumn("rv", reconstructExpr(col("codes"), books))
    val qAssigned = Ivf.withCells(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv",
        math.min(nProbe, centVecs.length), centVecs)
      .withColumn("centroid_id",
        explode(transform(col("__cells"), c => element_at(idsArr, c("i") + 1))))
      .select("query_id", "qv", "centroid_id")
    val scored = cAssigned.join(broadcast(qAssigned), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("qv"), col("rv")), 6).as("approx_cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** ADC top-k: exact query vector vs PQ-reconstructed candidates.
    * Output (query_id, neighbor_id, approx_cos, rank); approximation
    * quality vs s1's exact ranks is pinned in SimilaritySpec.
    */
  def pqTopK(queries: DataFrame, candidates: DataFrame, k: Int,
             m: Int = 8, kCode: Int = 16,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val books = codebooks(candidates, m, kCode, idCol, vecCol)
    if (books.isEmpty) {
      return queries.select(col(idCol).as("query_id"), col(idCol).as("neighbor_id"),
        lit(0.0).as("approx_cos"), lit(0).as("rank")).limit(0)
    }
    val recon = candidates
      .select(col(idCol).as("neighbor_id"), encodeExpr(col(vecCol), books).as("codes"))
      .withColumn("rv", reconstructExpr(col("codes"), books))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = recon.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("qv"), col("rv")), 6).as("approx_cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
