package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native word-shingle hashing: the distinct rolling n-gram hashes of
  * a token-hash array in one compiled pass.
  *
  * The composable form (`transform(sequence(...), i -> foldLeft of n
  * element_at calls)` followed by `array_distinct`) walks interpreted
  * lambda trees per shingle and allocates the undeduped array first.
  * This expression runs the n-window combination and the seen-set in
  * one loop over primitive longs (open-addressed probe table, no
  * boxing), first-occurrence order — bit-identical output to the fold
  * form for in-contract inputs (spec-pinned), and total (sign-fixed
  * pmod per step) for out-of-range token hashes where the fold form
  * raises under ANSI.
  *
  * Contract matches Dedup.shinglesFromTokenHashes: token hashes are
  * in [0, P) (PolyHash output), result hashes are pmod-P polynomial
  * combinations with multiplier 131; fewer than n tokens -> empty
  * array (too short to shingle).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with Serializable {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> token hashes, got $other")
  }

  /** A null token hash propagates to a null result (what the fold
    * reference form produces) rather than being read as an undefined
    * value and hashed into every shingle it overlaps.
    */
  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullable: Boolean = child.nullable || elementsNullable

  override def nullSafeEval(input: Any): Any =
    ShingleFunctions.compute(input.asInstanceOf[ArrayData], n, elementsNullable)

  // The whole kernel lives in the static helper (plain JVM-compiled
  // primitive loops — same machine code the inline template would
  // produce); generated code just calls it, keeping this expression
  // inside whole-stage codegen without a per-row interpreted boundary.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, th => {
      // compute returns null on a null element; ev.isNull is the
      // literal "false" when nullable is false, so only emit the
      // propagation branch when the input type allows null elements.
      val propagate =
        if (elementsNullable) s"if (${ev.value} == null) { ${ev.isNull} = true; }"
        else ""
      s"""
        ${ev.value} = graft.functions.ShingleFunctions.compute($th, $n, $elementsNullable);
        $propagate
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleFunctions {

  val P = 1000000007L

  /** Open-addressed probe-table slot sentinel — shingle hashes are
    * sign-fixed into [0, P), so -1 can never collide with a value.
    */
  private final val Empty = -1L

  /** Distinct rolling n-gram hashes, first-occurrence order. Called
    * from both the interpreted and generated paths. Returns null if
    * any token hash is null (null-element propagation); the null scan
    * is gated on the input type's containsNull so the common
    * non-nullable corpus path doesn't pay an extra O(m) sweep.
    */
  def compute(th: ArrayData, n: Int, elementsNullable: Boolean): GenericArrayData = {
    val m = th.numElements()
    if (elementsNullable) {
      var s = 0
      while (s < m) {
        if (th.isNullAt(s)) return null
        s += 1
      }
    }
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val cnt = m - n + 1
    var cap = 8
    while (cap < cnt * 2) cap <<= 1
    val table = new Array[Long](cap)
    java.util.Arrays.fill(table, Empty)
    val out = new Array[Long](cnt)
    val mask = cap - 1
    var size = 0
    var i = 0
    while (i < cnt) {
      var acc = 0L
      var j = 0
      while (j < n) {
        // pmod per step, like the fold form: no-op for in-contract
        // hashes in [0, P); keeps out-of-range inputs total and
        // non-negative instead of silently emitting negatives.
        acc = (acc * 131L + th.getLong(i + j)) % P
        if (acc < 0) acc += P
        j += 1
      }
      // Fibonacci-scrambled open addressing over primitive longs.
      var idx = ((acc * -7046029254386353131L) >>> 40).toInt & mask
      var dup = false
      var probing = true
      while (probing) {
        val slot = table(idx)
        if (slot == Empty) probing = false
        else if (slot == acc) { dup = true; probing = false }
        else idx = (idx + 1) & mask
      }
      if (!dup) {
        table(idx) = acc
        out(size) = acc
        size += 1
      }
      i += 1
    }
    new GenericArrayData(
      if (size == cnt) out else java.util.Arrays.copyOf(out, size))
  }

  /** Distinct rolling n-gram hashes of a token-hash array column. */
  def shingleHashes(tokenHashes: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokenHashes), n))
}
