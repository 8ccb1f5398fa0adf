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

/** Native membership count: how many elements of a string array are
  * in a fixed literal word set — the stopword-hit primitive under
  * language-ID and the quality scorers.
  *
  * The HOF form `size(filter(toks, t => t.isin(words: _*)))` is
  * interpreted (higher-order functions never enter whole-stage
  * codegen) and re-binds a lambda variable per element; worse, an
  * expression tree that references the count k times re-EVALUATES all
  * of it k times (no subexpression elimination outside codegen) —
  * langId's decision chain paid ~15 interpreted filter passes per row
  * before staging. This expression is one codegen'd loop over the
  * array with a single shared HashSet<UTF8String> probe per element
  * (the set is a codegen reference object, built once per plan).
  *
  * NULL array → NULL; NULL elements don't count (same semantics as
  * the filter+isin form, whose isin is false for NULL).
  */
case class CountInSet(child: Expression, words: Seq[String])
    extends UnaryExpression with Serializable {
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = LongType
  override def prettyName: String = "count_in_set"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> input, got $t")
  }

  // java.util.HashSet rather than a Scala set: codegen calls
  // contains(Object) directly with no boxing indirection, and the
  // reference object serializes cleanly to executors.
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var i = 0; var cnt = 0L
    while (i < n) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      s"""
        int $n = $a.numElements();
        long $cnt = 0L;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $cnt++;
        }
        ${ev.value} = $cnt;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayFunctions {
  /** |a ∩ b| for two ascending-sorted long arrays. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Count of array elements contained in the literal word set. */
  def countInSet(a: Column, words: Seq[String]): Column =
    ColumnBridge.column(CountInSet(ColumnBridge.expression(a), words))
}
