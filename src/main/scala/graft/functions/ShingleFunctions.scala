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
  * This expression keeps the n-window combination and the seen-set in
  * one loop: O(shingles) work, first-occurrence order — bit-identical
  * output to the fold form (spec-pinned).
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

  override def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val m = th.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new java.util.ArrayList[Long](m - n + 1)
    val seen = new java.util.HashSet[Long]()
    var i = 0
    while (i <= m - n) {
      var acc = 0L
      var j = 0
      while (j < n) {
        acc = (acc * 131L + th.getLong(i + j)) % ShingleFunctions.P
        j += 1
      }
      if (seen.add(acc)) out.add(acc)
      i += 1
    }
    val arr = new Array[Long](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, th => {
      val m = ctx.freshName("m"); val out = ctx.freshName("out")
      val seen = ctx.freshName("seen"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val acc = ctx.freshName("acc")
      val arr = ctx.freshName("arr"); val k = ctx.freshName("k")
      s"""
        int $m = $th.numElements();
        long[] $arr;
        if ($m < $n) {
          $arr = new long[0];
        } else {
          java.util.ArrayList<Long> $out = new java.util.ArrayList<Long>($m - $n + 1);
          java.util.HashSet<Long> $seen = new java.util.HashSet<Long>();
          for (int $i = 0; $i <= $m - $n; $i++) {
            long $acc = 0L;
            for (int $j = 0; $j < $n; $j++) {
              $acc = ($acc * 131L + $th.getLong($i + $j)) % ${ShingleFunctions.P}L;
            }
            if ($seen.add($acc)) $out.add($acc);
          }
          $arr = new long[$out.size()];
          for (int $k = 0; $k < $arr.length; $k++) $arr[$k] = $out.get($k).longValue();
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleFunctions {

  val P = 1000000007L

  /** Distinct rolling n-gram hashes of a token-hash array column. */
  def shingleHashes(tokenHashes: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokenHashes), n))
}
