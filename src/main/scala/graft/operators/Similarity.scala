package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]) — the
  * approximate-nearest-neighbor surface of the training-data pipeline
  * (north-star extensions, SURVEY.md §7.6).
  *
  *  - bruteForceTopK: the exact baseline — broadcast the (small) query
  *    set against all candidates; per-query top-k via window rank.
  *    Scales linearly in candidates on any cluster; the broadcast
  *    avoids shuffling the big side entirely.
  *  - lshTopK: the scale path — random-hyperplane (sign) LSH buckets
  *    both sides, only same-bucket pairs are scored. Sub-linear probe
  *    cost at the price of recall; recall is tested against the
  *    brute-force baseline in SimilaritySpec.
  *
  * Cosine is computed as a strict left-fold over the element products
  * in double precision: associativity-free, so the score is identical
  * on 1 core or 1000 executors (and reproducible by other engines).
  */
object Similarity {

  /** Strict left-fold sum — deterministic order, unlike a parallel
    * reduction.
    */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm(a: Column): Column = sqrt(foldSum(transform(a, x => x.cast("double") * x.cast("double"))))

  /** Reference fold-based cosine (kept for cross-checking the native
    * expression in tests; same accumulation order).
    */
  def cosineFold(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Production cosine: the codegen'd native expression — one fused
    * loop per pair, no array allocation (graft.functions.CosineSim).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineSim(a, b)

  /** Exact top-k cosine neighbors for each query vector.
    * `queries` and `candidates` both carry (idCol, vecCol); the query
    * side is assumed small and is broadcast. Ranking is on the
    * 6-decimal-rounded score with id tie-break, so the result set is
    * stable under float noise.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dimension d): a fixed-seed integer hash mapped to [-1, 1). Keeps
    * the LSH reproducible with no RNG state.
    */
  private def planeComponent(p: Int, d: Int): Double =
    graft.functions.LshWeights.component(p, d)

  /** Sign-LSH bucket key for one hash table: `planes` random
    * hyperplanes -> one long key of sign bits. `table` offsets the
    * plane seed so tables are independent.
    */
  def lshKey(vec: Column, planes: Int, dim: Int, table: Int = 0): Column = {
    require(planes >= 1 && planes <= 64,
      s"planes must be in [1, 64], got $planes — the key packs one sign bit " +
        "per plane into a long, and the t*64+p seed stride assumes <= 64")
    (0 until planes).foldLeft(lit(0L): Column) { (acc, p) =>
      val proj = foldSum(zip_with(vec,
        array((0 until dim).map(d => lit(planeComponent(table * 64 + p, d))): _*),
        (x, w) => x.cast("double") * w))
      acc + when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
  }

  /** All table bucket keys, computed by the native SignLshKeys
    * expression (one codegen'd loop; bit-identical to folding lshKey
    * per table — SimilaritySpec compares recall against brute force).
    */
  private def lshKeys(vec: Column, planes: Int, dim: Int, tables: Int): Column =
    graft.functions.LshFunctions.signLshKeys(vec, planes, tables, dim)

  /** S6 — hard-negative mining for embedding-model training
    * (DPR/contrastive-retrieval style): for each query, the top-k most
    * similar candidates that are NOT positives. A candidate is a
    * positive when its rounded cosine reaches `posThr` (near-dups,
    * exact dups, the query itself) — those are what a contrastive loss
    * must NOT see as negatives, and naive random negatives are too
    * easy; the band just below the positive threshold is where the
    * training signal lives. Same scale shape as bruteForceTopK: the
    * query side broadcasts, the corpus is scanned once, the filter
    * runs inside the scan projection, top-k is a per-query window. At
    * production scale the scoring stage composes with lshTopK/ivfTopK/
    * pqTopK unchanged — mine from the ANN candidate set instead of the
    * full scan.
    */
  def hardNegatives(queries: DataFrame, candidates: DataFrame, k: Int,
                    posThr: Double = 0.9,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos_sim"))
      .filter(col("cos_sim") < posThr)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Approximate top-k via multi-table sign-LSH: a candidate is scored
    * iff it shares a bucket with the query in ANY of the `tables`
    * independent hash tables. One table of p planes finds a
    * cos-similar neighbor with probability (1 - theta/pi)^p; T tables
    * lift recall to 1-(1-r)^T while probe cost stays ~|bucket|*T.
    * This is the standard recall/cost dial for ANN at scale — at 100 TB
    * the exploded candidate side shuffles on (table, bucket), so the
    * quadratic scoring is confined to bucket-sized groups.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int, dim: Int,
              planes: Int = 6, tables: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      posexplode(lshKeys(col(vecCol), planes, dim, tables)).as(Seq("tbl", "bkt")))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      posexplode(lshKeys(col(vecCol), planes, dim, tables)).as(Seq("tbl", "bkt")))
    val paired = c.join(broadcast(q), Seq("tbl", "bkt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = paired.select(col("query_id"), col("neighbor_id"),
      round(cosine(col("qv"), col("cv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Per-dimension [min, max] quantization grid over the candidate
    * corpus — the shared codec state of SQ8 scalar quantization
    * (FAISS `ScalarQuantizer` QT_8bit; Lucene's int8 HNSW storage
    * uses the same per-dim affine form). One aggregation over
    * (dim, value) pairs, then a dim-sized collect: the grid is
    * 2·dim doubles (~1 KB at dim 64) regardless of corpus size, the
    * Ivf/Pq codebook-collect posture.
    */
  def sq8Grid(candidates: DataFrame,
              vecCol: String = "embedding"): (Seq[Double], Seq[Double]) = {
    val rows = candidates
      .select(posexplode(col(vecCol)).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .orderBy(col("d"))
      .collect() // dim rows — bounded by the embedding width, not the corpus
    (rows.map(_.getDouble(1)).toSeq, rows.map(_.getDouble(2)).toSeq)
  }

  /** uint8 code per dimension: floor((x − min) · 255 / (max − min)),
    * clamped to 255 (float noise at x = max can push the quotient a
    * ulp above 255). A constant dimension (max = min) codes to 0.
    * Exactly this arithmetic — same operation order — is replayed by
    * the DuckDB oracle, so codes are bit-identical cross-engine
    * (IEEE − , ·, / are correctly rounded; floor of equal doubles
    * agrees everywhere).
    */
  def sq8Encode(vec: Column, mins: Seq[Double], maxs: Seq[Double]): Column =
    transform(vec, (x, i) => {
      val mn = element_at(typedLit(mins), i + 1)
      val mx = element_at(typedLit(maxs), i + 1)
      when(mx === mn, lit(0))
        .otherwise(least(
          floor((x.cast("double") - mn) * lit(255.0) / (mx - mn)),
          lit(255.0)).cast("int"))
    })

  /** Dequantized vector from uint8 codes: min + code · ((max − min)/255)
    * per dimension — the value the asymmetric distance computation
    * scores against.
    */
  def sq8Reconstruct(codes: Column, mins: Seq[Double], maxs: Seq[Double]): Column =
    transform(codes, (c, i) => {
      val mn = element_at(typedLit(mins), i + 1)
      val mx = element_at(typedLit(maxs), i + 1)
      mn + c.cast("double") * ((mx - mn) / lit(255.0))
    })

  /** S9 — scalar-quantized (SQ8) ANN with asymmetric scoring: the
    * corpus is stored as uint8 codes (4× smaller than float32 — at
    * 100 TB of embeddings that is the difference between the index
    * fitting executor storage memory or not), queries stay full
    * precision, and each candidate is scored as cos(query,
    * dequantize(codes)). The grid is trained on the candidate corpus
    * itself (one pass + a KB-sized collect); encode, reconstruct and
    * score all fuse into the single corpus scan — same
    * broadcast-queries / per-query-window shape as [[bruteForceTopK]],
    * no extra shuffle. Recall vs the exact baseline is pinned in
    * SimilaritySpec and reported first-class by s7_ann_recall.
    *
    * Quantization error is bounded by step/2 per dimension
    * (step = (max−min)/255), so with well-spread dims SQ8 recall sits
    * far above PQ's at the same asymptotic cost — the standard
    * accuracy-per-byte tradeoff between the two codecs.
    */
  /** 64-bit sign code of a 64-dim embedding: bit i set iff v[i] > 0 —
    * 1-bit (binary) quantization, 32× smaller than float32. Bits OR
    * together (never add), so bit 63 = Long.MinValue needs no
    * ordering care. Contract: exactly 64 dims (the corpus schema);
    * higher dims pack ⌈d/64⌉ longs the same way.
    */
  def bqCode(vec: Column): Column = {
    val packed = (0 until 64).map(i =>
      when(element_at(vec, i + 1).cast("double") > 0.0,
        lit(graft.operators.Multimodal.SigPowers(i))).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    // Enforce the 64-dim contract loudly (the Sq8RoundTrip posture):
    // with ANSI off a short vector's element_at returns null → the
    // when() silently leaves bits unset, and a longer vector's dims
    // 65+ silently vanish — both degrade the Hamming shortlist with
    // no error. Fail instead.
    when(size(vec) =!= 64,
      raise_error(concat(lit("bq_code: expected exactly 64 dims, got "),
        size(vec).cast("string"))))
      .otherwise(packed)
  }

  /** S10 — binary-quantized (1-bit) ANN: the cheapest point on the
    * quantization ladder (float32 → SQ8 4× → PQ 64× → BQ here at 32×
    * with ONE xor+popcount per candidate). The corpus index is one
    * long per vector; each query Hamming-scans the codes (codegen'd
    * bit_count(xor) — the mm5 verify kernel), keeps the `k·rerank`
    * closest codes, then reranks ONLY those by exact cosine after a
    * point-fetch equi-join back to the float vectors — the
    * shortlist-then-fetch topology a 100 TB deployment runs (the code
    * scan touches 8 bytes/vector; floats are read for queries×k·rerank
    * rows total). Deterministic end to end: (hamming, neighbor_id)
    * shortlist order, (cos, neighbor_id) final order.
    */
  def bqTopK(queries: DataFrame, candidates: DataFrame, k: Int, rerank: Int = 4,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && rerank >= 1, s"need k >= 1 and rerank >= 1, got k=$k rerank=$rerank")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      bqCode(col(vecCol)).as("qc"))
    val codes = candidates.select(col(idCol).as("neighbor_id"), bqCode(col(vecCol)).as("cc"))
    val wH = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("neighbor_id"))
    val shortlist = codes.join(broadcast(q.select(col("query_id"), col("qc"))),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("hamming", bit_count(col("qc").bitwiseXOR(col("cc"))).cast("int"))
      .withColumn("hrank", row_number().over(wH))
      .filter(col("hrank") <= k * rerank)
      .select(col("query_id"), col("neighbor_id"), col("hamming"))
    val wC = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    shortlist
      .join(candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        "neighbor_id")
      .join(broadcast(q.select(col("query_id"), col("qv"))), "query_id")
      .select(col("query_id"), col("neighbor_id"), col("hamming"),
        round(cosine(col("qv"), col("cv")), 6).as("cos"))
      .withColumn("rank", row_number().over(wC))
      .filter(col("rank") <= k)
  }

  def sq8TopK(queries: DataFrame, candidates: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (mins, maxs) = sq8Grid(candidates, vecCol)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // Fused native encode→dequantize (one codegen'd loop; replays the
    // sq8Encode∘sq8Reconstruct arithmetic op-for-op, so the oracle
    // hash is unchanged — Sq8RoundTrip's scaladoc + SimilaritySpec
    // pin the equivalence).
    val c = candidates.select(col(idCol).as("neighbor_id"),
      graft.functions.VectorFunctions.sq8RoundTrip(col(vecCol), mins, maxs).as("rv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("rv")), 6).as("approx_cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
