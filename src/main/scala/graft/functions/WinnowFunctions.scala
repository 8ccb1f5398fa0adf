package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS algorithm): rolling k-gram hashes → sliding-window-of-w
  * minima → distinct, fused into one compiled pass over the token-hash
  * array.
  *
  * The composable form (a gram `transform` column referenced from a
  * second `transform` whose lambda slices it per window) re-evaluates
  * the O(m·k) gram tree per window once Catalyst inlines the staged
  * projection — O(m²·k) interpreted lambdas per document, measured at
  * ~0.15 s/doc (the ShingleHashes lesson, one level deeper). This
  * expression computes the grams once into a primitive array, takes
  * window minima with a monotonic deque (O(m) total, not O(m·w)), and
  * dedups through the ShingleFunctions-style open-addressed probe
  * table — first-occurrence order, bit-identical to the fold reference
  * form (spec-pinned).
  *
  * Contract: token hashes in [0, P) (PolyHash output); fewer than
  * k + w − 1 tokens → empty array (no full window). A null element
  * propagates to a null result, like ShingleHashes.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with Serializable {

  require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> token hashes, got $other")
  }

  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullable: Boolean = child.nullable || elementsNullable

  override def nullSafeEval(input: Any): Any =
    WinnowFunctions.compute(input.asInstanceOf[ArrayData], k, w, elementsNullable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, th => {
      val propagate =
        if (elementsNullable) s"if (${ev.value} == null) { ${ev.isNull} = true; }"
        else ""
      s"""
        ${ev.value} = graft.functions.WinnowFunctions.compute($th, $k, $w, $elementsNullable);
        $propagate
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WinnowFunctions {

  val P = 1000000007L

  private final val Empty = -1L

  /** Distinct sliding-window minima of the rolling k-gram hashes,
    * first-occurrence order. Null if any token hash is null.
    */
  def compute(th: ArrayData, k: Int, w: Int, elementsNullable: Boolean): GenericArrayData = {
    val m = th.numElements()
    if (elementsNullable) {
      var s = 0
      while (s < m) {
        if (th.isNullAt(s)) return null
        s += 1
      }
    }
    if (m < k + w - 1) return new GenericArrayData(Array.emptyLongArray)
    // Rolling k-gram hashes, one primitive pass.
    val cnt = m - k + 1
    val grams = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      var acc = 0L
      var j = 0
      while (j < k) {
        acc = (acc * 131L + th.getLong(i + j)) % P
        if (acc < 0) acc += P
        j += 1
      }
      grams(i) = acc
      i += 1
    }
    // Sliding-window minima via a monotonic index deque: amortized
    // O(1) per gram. Window j covers grams[j .. j+w-1]; the deque
    // front always holds the index of the window's minimum (leftmost
    // on ties — the min VALUE is what winnowing keeps, so the
    // tie-break never changes the output).
    val nWin = cnt - w + 1
    val deque = new Array[Int](cnt)
    var head = 0
    var tail = 0 // exclusive
    val mins = new Array[Long](nWin)
    i = 0
    while (i < cnt) {
      while (tail > head && grams(deque(tail - 1)) >= grams(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) mins(i - w + 1) = grams(deque(head))
      i += 1
    }
    // Distinct, first-occurrence order (the ShingleFunctions probe
    // table over primitive longs).
    var cap = 8
    while (cap < nWin * 2) cap <<= 1
    val table = new Array[Long](cap)
    java.util.Arrays.fill(table, Empty)
    val out = new Array[Long](nWin)
    val mask = cap - 1
    var size = 0
    i = 0
    while (i < nWin) {
      val v = mins(i)
      var idx = ((v * -7046029254386353131L) >>> 40).toInt & mask
      var dup = false
      var probing = true
      while (probing) {
        val slot = table(idx)
        if (slot == Empty) probing = false
        else if (slot == v) { dup = true; probing = false }
        else idx = (idx + 1) & mask
      }
      if (!dup) {
        table(idx) = v
        out(size) = v
        size += 1
      }
      i += 1
    }
    new GenericArrayData(
      if (size == nWin) out else java.util.Arrays.copyOf(out, size))
  }

  /** Winnowing fingerprints of a token-hash array column. */
  def winnowFingerprints(tokenHashes: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(tokenHashes), k, w))
}
