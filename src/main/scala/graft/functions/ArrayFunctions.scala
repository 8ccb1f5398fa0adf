package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native set-intersection cardinality over two SORTED long arrays —
  * the inner loop of n-gram Jaccard verification.
  *
  * `size(array_intersect(a, b))` builds a hash set per pair per call;
  * on an O(pairs) verification stage that is hundreds of millions of
  * hash probes. With both sides sorted once per row (array_sort in the
  * projection, amortized over all pairs the row participates in), the
  * intersection cardinality is a single merge walk — no allocation, no
  * hashing — and fuses into whole-stage codegen.
  *
  * Precondition: both inputs sorted ascending. Duplicates are
  * counted once (set semantics — same result as
  * size(array_intersect(a, b)) for sorted inputs), which also makes
  * the expression a safe rewrite target for the optimizer rule in
  * graft.plans.IntersectSizeRule.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "sorted_intersect_size"

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left) && isLongArray(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> inputs, got ${left.dataType}, ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) {
        n += 1
        // skip duplicate runs on both sides (set semantics)
        while (i < na && a.getLong(i) == x) i += 1
        while (j < nb && b.getLong(j) == y) j += 1
      }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val n = ctx.freshName("n")
      s"""
        int $na = $a.numElements(); int $nb = $b.numElements();
        int $i = 0; int $j = 0; long $n = 0L;
        while ($i < $na && $j < $nb) {
          long $x = $a.getLong($i); long $y = $b.getLong($j);
          if ($x == $y) {
            $n++;
            while ($i < $na && $a.getLong($i) == $x) { $i++; }
            while ($j < $nb && $b.getLong($j) == $y) { $j++; }
          }
          else if ($x < $y) { $i++; } else { $j++; }
        }
        ${ev.value} = $n;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ArrayFunctions {
  /** |a ∩ b| for two ascending-sorted long arrays. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
