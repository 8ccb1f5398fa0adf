package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the product-quantization hot loop
  * (Pq.encodeExpr / Pq.reconstructExpr were higher-order-function
  * compositions — interpreted lambdas that allocate a zipped array per
  * (subspace, codeword) pair, i.e. m*kCode=128 allocations and ~1k
  * closure calls per row). These generate one fused loop inside
  * whole-stage codegen: encode walks the backing array once per
  * codeword with zero allocation; reconstruct emits a single
  * concatenated copy of the chosen codewords.
  *
  * Bit-compatibility contract with the fold form (pinned in PqSpec):
  *  - squared-L2 accumulates strictly index-ascending in double
  *    precision, `acc + (x - y)*(x - y)` — identical association order
  *    to `aggregate(zip_with(...), 0.0, _ + _)`;
  *  - each distance is rounded exactly as Spark's `round(d, 6)` on
  *    DoubleType: `java.math.BigDecimal.valueOf(d).setScale(6,
  *    HALF_UP)` (NaN/Infinity pass through unrounded, as RoundBase
  *    guards them);
  *  - argmin tie-breaks to the smallest codeword index, matching
  *    `array_min` over (dist, idx) structs;
  *  - a subspace whose window runs past the vector's end or contains a
  *    null element yields code 0, matching the fold form where every
  *    codeword distance folds to NULL and the struct ordering (nulls
  *    first, then idx asc) selects index 0.
  *
  * The codebook rides along as a literal constructor argument
  * (Seq for structural equality, so semanticEquals/subexpression
  * elimination still work) and reaches generated code through
  * `ctx.addReferenceObj` — same pattern as a broadcast literal: KBs on
  * the driver, never shuffled.
  */
object PqCodecUtil {
  /** Round exactly like Spark's RoundBase on DoubleType. */
  @inline def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Encode one vector into its m codes. `books(mi)(cw)(j)`; vector
    * elements read through the accessor to cover float and double
    * arrays with one loop.
    */
  def encode(vec: ArrayData, isFloat: Boolean, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val dsub = books(0)(0).length
    val n = vec.numElements()
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val base = mi * dsub
      // Degenerate window (short vector / null element) -> the fold
      // form's all-NULL distances -> code 0.
      var degenerate = base + dsub > n
      if (!degenerate) {
        var j = 0
        while (j < dsub && !degenerate) {
          if (vec.isNullAt(base + j)) degenerate = true
          j += 1
        }
      }
      if (degenerate) {
        codes(mi) = 0
      } else {
        val cws = books(mi)
        var best = 0.0
        var bestIdx = -1
        var cw = 0
        while (cw < cws.length) {
          val cwArr = cws(cw)
          var acc = 0.0
          var j = 0
          while (j < dsub) {
            val x = if (isFloat) vec.getFloat(base + j).toDouble else vec.getDouble(base + j)
            val d = x - cwArr(j)
            acc += d * d
            j += 1
          }
          val rd = round6(acc)
          if (bestIdx < 0 || java.lang.Double.compare(rd, best) < 0) {
            best = rd; bestIdx = cw
          }
          cw += 1
        }
        codes(mi) = bestIdx
      }
      mi += 1
    }
    new GenericArrayData(codes)
  }

  /** Concatenate the chosen codewords. Codes outside [0, kCode) fail
    * loudly, matching ANSI element_at.
    */
  def reconstruct(codes: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val dsub = books(0)(0).length
    val nm = math.min(m, codes.numElements())
    val out = new Array[Double](nm * dsub)
    var mi = 0
    while (mi < nm) {
      if (codes.isNullAt(mi)) {
        throw new IllegalArgumentException(s"pq_reconstruct: null code at subspace $mi")
      }
      val c = codes.getInt(mi)
      if (c < 0 || c >= books(mi).length) {
        throw new IllegalArgumentException(
          s"pq_reconstruct: code $c out of range [0, ${books(mi).length}) at subspace $mi")
      }
      System.arraycopy(books(mi)(c), 0, out, mi * dsub, dsub)
      mi += 1
    }
    new GenericArrayData(out)
  }
}

/** codes(vec) — array<int> of length m. See PqCodecUtil for the
  * contract. Cited reference behavior: the reference engine has no ANN
  * surface; this serves SURVEY §7.6's similarity-search extension.
  */
case class PqCodes(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with Serializable {

  require(books.nonEmpty && books.head.nonEmpty && books.head.head.nonEmpty,
    "pq_codes requires a non-empty codebook")

  @transient private lazy val bookArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  /** A NULL vector encodes to all-zero codes, not NULL: in the fold
    * form the outer `transform` runs over a constant `sequence(0,m-1)`
    * so the NULL input never reaches the top — every subspace folds to
    * NULL distances and the struct-min tie-break picks codeword 0.
    * Pinned in PqSpec.
    */
  override def nullable: Boolean = false

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got $other")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(new Array[Int](books.length))
    else PqCodecUtil.encode(v.asInstanceOf[ArrayData], isFloat, bookArr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val booksRef = ctx.addReferenceObj("pqBooks", bookArr, "double[][][]")
    val f = isFloat
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value};
        if (${childGen.isNull}) {
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new int[${books.length}]);
        } else {
          ${ev.value} = graft.functions.PqCodecUtil.encode(${childGen.value}, $f, $booksRef);
        }
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** reconstruct(codes) — array<double> of length m*dsub. */
case class PqReconstruct(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with Serializable {

  require(books.nonEmpty && books.head.nonEmpty && books.head.head.nonEmpty,
    "pq_reconstruct requires a non-empty codebook")

  @transient private lazy val bookArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pq_reconstruct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<int>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    PqCodecUtil.reconstruct(input.asInstanceOf[ArrayData], bookArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", bookArr, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        ${ev.value} = graft.functions.PqCodecUtil.reconstruct($v, $booksRef);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object PqFunctions {
  def pqCodes(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqCodes(ColumnBridge.expression(vec), books))

  def pqReconstruct(codes: Column, books: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqReconstruct(ColumnBridge.expression(codes), books))
}
