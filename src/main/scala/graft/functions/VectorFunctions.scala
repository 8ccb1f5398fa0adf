package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over float-vector
  * columns (Array[Float] embeddings) — the hot inner loop of
  * similarity search and embedding dedup.
  *
  * The composable form (`zip_with` + `aggregate` higher-order
  * functions) is interpreted: per pair it allocates a zipped array and
  * walks lambda closures per element. This expression generates a
  * single fused loop (dot product + both norms in one pass over the
  * backing arrays) inside whole-stage codegen — no allocation, no
  * virtual calls.
  *
  * Numerical contract: accumulation is strictly index-ascending in
  * double precision, then dot / (sqrt(na) * sqrt(nb)) with a
  * zero-norm guard — bit-identical to the fold-based form and to the
  * DuckDB oracle's list_reduce, on one core or a thousand executors.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "cosine_sim"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> inputs, got ${left.dataType}, ${right.dataType}")
  }

  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val af = elemType(left) == FloatType
    val bf = elemType(right) == FloatType
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, af); val y = elem(b, i, bf)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val bGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val d = ctx.freshName("d")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $x = (double) $a.$aGet($i);
          double $y = (double) $b.$bGet($i);
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        double $d = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        ${ev.value} = ($d == 0.0) ? 0.0 : $dot / $d;
      """
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused SQ8 encode→dequantize round trip (r10 verdict item #6): one
  * codegen'd loop replaces the two interpreted `transform` HOFs of
  * Similarity.sq8Encode∘sq8Reconstruct on s9's corpus scan. The grid
  * (per-dim mins/maxs) is plan-time literal state — the CountInSet /
  * pq-codebook posture — shipped to executors as codegen reference
  * objects.
  *
  * Arithmetic is REPLAYED OP-FOR-OP from the HOF pair so the result
  * is bit-identical (and therefore the s9/s7 oracle hashes are
  * unchanged): code = min(floor((x − mn)·255/(mx − mn)), 255) as int
  * (0 when mx = mn), value = mn + code·((mx − mn)/255); null elements
  * pass through as null, and a vector longer than the grid reads null
  * grid entries in the HOF form — here it is rejected loudly instead
  * (embeddings are fixed-width; a length mismatch is a bug upstream).
  */
case class Sq8RoundTrip(child: Expression, mins: Seq[Double], maxs: Seq[Double])
    extends UnaryExpression with Serializable {
  require(mins.length == maxs.length && mins.nonEmpty,
    "sq8 grid mins/maxs must be same non-zero length")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "sq8_roundtrip"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double> input, got $t")
    }

  @transient private lazy val mnArr: Array[Double] = mins.toArray
  @transient private lazy val mxArr: Array[Double] = maxs.toArray

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    require(n == mnArr.length,
      s"sq8_roundtrip: vector has $n dims but the grid has ${mnArr.length}")
    val out = new Array[Any](n)
    val fl = isFloat
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = if (fl) a.getFloat(i).toDouble else a.getDouble(i)
        val mn = mnArr(i); val mx = mxArr(i)
        out(i) =
          if (mx == mn) mn
          else {
            // NaN: Spark's floor(double) RETURNS LONG, so the HOF path
            // turns a NaN quotient into 0 before least() ever sees it
            // (code 0 → mn). math.min(NaN, 255).toInt is also 0 — the
            // same value by a different route — and ±Inf agree too
            // (floor→Long.Max/Min vs (int)±Inf saturation). Pinned by
            // SimilaritySpec's NaN bit-identity case.
            val code = math.min(math.floor((x - mn) * 255.0 / (mx - mn)), 255.0).toInt
            mn + code.toDouble * ((mx - mn) / 255.0)
          }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("sq8Mins", mnArr, "double[]")
    val mxRef = ctx.addReferenceObj("sq8Maxs", mxArr, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out"); val x = ctx.freshName("x")
      val mn = ctx.freshName("mn"); val mx = ctx.freshName("mx")
      val code = ctx.freshName("code")
      s"""
        int $n = $a.numElements();
        if ($n != $mnRef.length) {
          throw new IllegalArgumentException(
            "sq8_roundtrip: vector has " + $n + " dims but the grid has " + $mnRef.length);
        }
        Object[] $out = new Object[$n];
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            double $x = (double) $a.$get($i);
            double $mn = $mnRef[$i]; double $mx = $mxRef[$i];
            if ($mx == $mn) {
              $out[$i] = java.lang.Double.valueOf($mn);
            } else {
              // (int) Math.min(NaN, 255) = 0 — the same code Spark's
              // long-returning floor() produces for a NaN quotient in
              // the HOF path (see the eval comment).
              int $code = (int) java.lang.Math.min(
                java.lang.Math.floor(($x - $mn) * 255.0 / ($mx - $mn)), 255.0);
              $out[$i] = java.lang.Double.valueOf($mn + ((double) $code) * (($mx - $mn) / 255.0));
            }
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Cosine similarity between two float/double array columns. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Fused SQ8 encode+dequantize against a literal per-dim grid. */
  def sq8RoundTrip(v: Column, mins: Seq[Double], maxs: Seq[Double]): Column =
    ColumnBridge.column(Sq8RoundTrip(ColumnBridge.expression(v), mins, maxs))
}
