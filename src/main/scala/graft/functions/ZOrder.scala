package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Shared Morton (Z-order) bit-interleave, called from both the
  * interpreted eval and the generated code.
  *
  * Z-ordering is THE data-layout tool for multi-dimensional locality
  * at 100 TB: sorting a write by `morton(dim_a, dim_b)` before
  * splitting into files gives every file a small min/max rectangle in
  * BOTH dimensions, so per-file min/max statistics prune scans with a
  * predicate on either dimension — a plain sort by one column only
  * prunes that column. (Same construction the public Delta Lake
  * OPTIMIZE ZORDER and Iceberg sort orders use; the interleave
  * recurrence is the textbook shift-mask spread.)
  */
object ZOrderUtil {
  /** Spread the low 32 bits of x so bit i lands at bit 2i. */
  def spread32(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 64-bit Morton code of the low 32 bits of (x, y): x's bits land on
    * even positions, y's on odd. Strictly monotone in each argument
    * when the other is fixed, and order-embedding on 2^16-aligned
    * blocks — the property file pruning relies on.
    */
  def interleave32(x: Long, y: Long): Long =
    spread32(x) | (spread32(y) << 1)
}

/** Native `morton(x, y)` Catalyst expression (LongType × LongType →
  * LongType). A layout key is computed once per row on the full write
  * path of a re-clustering job, so it must stay inside whole-stage
  * codegen — the expression compiles to a static call, no boxing, no
  * UDF serialization.
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def prettyName: String = "morton"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint, bigint), got $other")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderUtil.interleave32(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrderUtil.interleave32($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderFunctions {
  /** Morton interleave of the low 32 bits of two long columns. */
  def morton(x: Column, y: Column): Column =
    ColumnBridge.column(
      MortonInterleave(ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
