package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass aHash: the 64-bit perceptual signature of mm5
  * (operators/Multimodal.perceptualDedup).
  *
  * Semantics are byte-identical to the composable HOF form it
  * replaced (and to the DuckDB oracle's unrolled replay):
  *   step   = max(numChars div 64, 1)
  *   pix[j] = poly_hash(substr(s, 1 + j*step, step), 31, 256)
  *   mean   = (Σ pix) div 64
  *   sig    = Σ_{pix[j] > mean} 2^j   (signed long; bit 63 is the
  *            sign bit, so the sum lands exactly on the long range)
  *
  * Why native: the HOF form (`transform` + `aggregate` + `zip_with`
  * lambdas) was correct but catastrophically slow once Catalyst
  * *duplicated* it — the join's inferred `isnotnull(key)` pushed a
  * copy of the full signature tree below the projection, and inside
  * that copy the collapsed `mean_px` sub-aggregate re-evaluated all
  * 64 window hashes PER zip_with ELEMENT: O(64·len) interpreted work
  * per row, turning a 0.3 s scan into a 30 s one (round-9 bench).
  * As a single cheap Expression the same pushdown duplication costs
  * one extra O(len) compiled pass — harmless — and the whole
  * signature stays inside whole-stage codegen.
  */
object AHashUtil {
  def ahash64(s: UTF8String): Long = {
    val n = s.numChars()
    val step = math.max(n / 64, 1)
    val pix = new Array[Long](64)
    var sum = 0L
    var j = 0
    while (j < 64) {
      val start = j * step
      // UTF8String.substring clamps: start beyond the end yields the
      // empty string, whose poly_hash is 0 — same as Spark substr.
      val h = PolyHashUtil.hash(s.substring(start, start + step), 31L, 256L)
      pix(j) = h
      sum += h
      j += 1
    }
    val mean = sum / 64
    var sig = 0L
    j = 0
    while (j < 64) {
      if (pix(j) > mean) sig += (1L << j)
      j += 1
    }
    sig
  }
}

case class AHash64(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def prettyName: String = "ahash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    AHashUtil.ahash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AHashUtil.ahash64($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object AHashFunctions {
  def ahash64(s: Column): Column =
    ColumnBridge.column(AHash64(ColumnBridge.expression(s)))
}
