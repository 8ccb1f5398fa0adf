package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** Session extension registering the engine's custom Catalyst
  * expressions as SQL functions, so `spark.sql` users get them too:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT cosine_sim(a.embedding, b.embedding) FROM ...
  *   SELECT min_by_ord2(price, ts_us, event_id) FROM ... GROUP BY ...
  *
  * `GraftExtensions.register(spark)` does the same on an already-built
  * session (test/REPL convenience).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectOptimizerRule(_ => graft.plans.IntersectSizeRule)
  }
}

object GraftExtensions {

  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def litInt(e: Expression, what: String): Int = {
    val v = litLong(e, what)
    require(v.isValidInt, s"$what must fit in Int, got $v")
    v.toInt
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", "", name, usage, "", "", "", "", "", "", "built-in")

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim",
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float/double arrays"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))),
    ("sorted_intersect_size",
      info("sorted_intersect_size", "sorted_intersect_size(a, b) - |a ∩ b| of two sorted bigint arrays"),
      (es: Seq[Expression]) => SortedIntersectSize(es(0), es(1))),
    ("min_by_ord2",
      info("min_by_ord2", "min_by_ord2(value, ord1, ord2) - value at the smallest (ord1, ord2)"),
      (es: Seq[Expression]) => MinByOrd2(es(0), es(1), es(2))),
    ("max_by_ord2",
      info("max_by_ord2", "max_by_ord2(value, ord1, ord2) - value at the largest (ord1, ord2)"),
      (es: Seq[Expression]) => MaxByOrd2(es(0), es(1), es(2))),
    ("sign_lsh_keys",
      info("sign_lsh_keys", "sign_lsh_keys(vec, planes, tables, dim) - multi-table sign-LSH bucket keys"),
      (es: Seq[Expression]) => SignLshKeys(es(0), litInt(es(1), "planes"),
        litInt(es(2), "tables"), litInt(es(3), "dim"))),
    ("morton",
      info("morton", "morton(x, y) - Z-order interleave of the low 32 bits of two bigints"),
      (es: Seq[Expression]) => MortonInterleave(es(0), es(1))),
    ("poly_hash",
      info("poly_hash", "poly_hash(s, mult, mod) - polynomial codepoint hash of a string"),
      (es: Seq[Expression]) => PolyHash(es(0), litLong(es(1), "mult"), litLong(es(2), "mod"))),
    ("shingle_hashes",
      info("shingle_hashes", "shingle_hashes(token_hashes, n) - distinct sorted word-n-gram hashes"),
      (es: Seq[Expression]) => ShingleHashes(es(0), litInt(es(1), "n"))),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(shingles, k) - k-permutation MinHash signature"),
      (es: Seq[Expression]) => MinHashSig(es(0), litInt(es(1), "k"))),
    ("ahash64",
      info("ahash64", "ahash64(s) - 64-bit perceptual aHash signature (mm5's " +
        "mean-thresholded window-hash pixels) of a string payload"),
      (es: Seq[Expression]) => AHash64(es(0))),
    ("pq_codes",
      info("pq_codes", "pq_codes(vec, books) - product-quantization codes; books is a " +
        "foldable array<array<array<double>>> codebook literal"),
      (es: Seq[Expression]) => PqCodes(es(0), litBooks(es(1)))),
    ("pq_reconstruct",
      info("pq_reconstruct", "pq_reconstruct(codes, books) - concatenated codewords for PQ codes"),
      (es: Seq[Expression]) => PqReconstruct(es(0), litBooks(es(1)))),
    ("count_in_set",
      info("count_in_set", "count_in_set(toks, words) - how many elements of a string " +
        "array are in the foldable word-array literal"),
      (es: Seq[Expression]) => CountInSet(es(0), litWords(es(1))))
  )

  /** Evaluate a foldable array<string> expression into the CountInSet
    * word set (the stopword lists are prompt-sized literals; nulls are
    * rejected loudly for the same reason as litBooks).
    */
  private def litWords(e: Expression): Seq[String] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    require(e.foldable, s"words must be a foldable array<string> literal, got $e")
    e.dataType match {
      case ArrayType(StringType, _) =>
      case other => throw new IllegalArgumentException(
        s"words must be array<string>, got $other")
    }
    val arr = e.eval().asInstanceOf[ArrayData]
    require(arr != null, "words must not be NULL")
    (0 until arr.numElements()).map { i =>
      require(!arr.isNullAt(i), s"words must not contain nulls (index $i)")
      arr.getUTF8String(i).toString
    }
  }

  /** Evaluate a foldable nested-array expression into the PQ codebook
    * shape books(subspace)(codeword)(dim). The codebook is index
    * metadata (KBs), so a constant-foldable argument — `array(array(
    * array(...)))` or a typed literal — is the natural SQL carrier.
    */
  private def litBooks(e: Expression): Seq[Seq[Seq[Double]]] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    require(e.foldable, s"books must be a foldable codebook literal, got $e")
    val elemT = e.dataType match {
      case ArrayType(ArrayType(ArrayType(t @ (DoubleType | FloatType | IntegerType | LongType), _), _), _) => t
      case other => throw new IllegalArgumentException(
        s"books must be array<array<array<numeric>>>, got $other")
    }
    val outer = e.eval().asInstanceOf[ArrayData]
    require(outer != null, "books must not be NULL")
    (0 until outer.numElements()).map { i =>
      require(!outer.isNullAt(i), s"books must not contain null subspaces (subspace $i)")
      val sub = outer.getArray(i)
      (0 until sub.numElements()).map { j =>
        require(!sub.isNullAt(j), s"books must not contain null codewords (subspace $i, code $j)")
        val cw = sub.getArray(j)
        (0 until cw.numElements()).map { d =>
          // ArrayData.getDouble on a null slot silently yields 0.0 —
          // a corrupted codebook, not an error — so fail loudly here.
          require(!cw.isNullAt(d),
            s"books must not contain nulls (subspace $i, code $j, dim $d)")
          elemT match {
            case DoubleType => cw.getDouble(d)
            case FloatType => cw.getFloat(d).toDouble
            case IntegerType => cw.getInt(d).toDouble
            case _ => cw.getLong(d).toDouble
          }
        }
      }
    }
  }

  /** Register on an existing session (functions + the intersect-size
    * optimizer rule via experimental extraOptimizations).
    */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.IntersectSizeRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.IntersectSizeRule
  }
}
