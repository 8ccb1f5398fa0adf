package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native MinHash signature: all k permutation minima in one fused
  * loop over the shingle-hash array.
  *
  * The composable form is k separate interpreted
  * `array_min(transform(sh, x -> (x*a+b) mod P))` trees — k array
  * allocations and k lambda walks per row. This expression keeps the
  * running minima in a local long[k] and visits each shingle once,
  * inside whole-stage codegen.
  *
  * Parameters are the deterministic Knuth-style (a_i, b_i) pairs
  * shared with the fold-based reference form (Dedup.minhashParams
  * delegates here); empty shingle sets yield the all-P sentinel
  * signature, identical to the fold form and the DuckDB oracle.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with Serializable {

  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> shingle hashes, got $other")
  }

  /** Whether the input array may carry null elements. A null element
    * propagates to a null signature (matching what the fold reference
    * form would produce) — silently reading it as 0 would fold an
    * arbitrary hash into every minimum.
    */
  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullable: Boolean = child.nullable || elementsNullable

  lazy val paramsA: Array[Long] = MinHashFunctions.params(k).map(_._1).toArray
  lazy val paramsB: Array[Long] = MinHashFunctions.params(k).map(_._2).toArray

  override def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    val n = sh.numElements()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, MinHashFunctions.P)
    var j = 0
    while (j < n) {
      if (sh.isNullAt(j)) return null
      val x = sh.getLong(j)
      var i = 0
      while (i < k) {
        // pmod, not %: identical for in-contract hashes in [0, P);
        // for out-of-range inputs like raw xxhash64 values, `%` alone
        // would go negative and silently poison every minimum, while
        // the sign-fix keeps the signature total and in [0, P) (the
        // fold form isn't even evaluable there — ANSI mode raises on
        // the wrapped multiply).
        var h = (x * paramsA(i) + paramsB(i)) % MinHashFunctions.P
        if (h < 0) h += MinHashFunctions.P
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", paramsA, "long[]")
    val bRef = ctx.addReferenceObj("mhB", paramsB, "long[]")
    nullSafeCodeGen(ctx, ev, sh => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val h = ctx.freshName("h")
      val nullElem = ctx.freshName("nullElem")
      // ev.isNull is the literal "false" when nullable is false, so
      // the null-element branch is only emitted when the input type
      // says elements can actually be null.
      val (nullCheck, finish) =
        if (elementsNullable)
          (s"if ($sh.isNullAt($j)) { $nullElem = true; break; }",
           s"""
            if ($nullElem) {
              ${ev.isNull} = true;
            } else {
              ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
            }""")
        else
          ("",
           s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);")
      s"""
        int $n = $sh.numElements();
        long[] $sig = new long[$k];
        boolean $nullElem = false;
        java.util.Arrays.fill($sig, ${MinHashFunctions.P}L);
        for (int $j = 0; $j < $n; $j++) {
          $nullCheck
          long $x = $sh.getLong($j);
          for (int $i = 0; $i < $k; $i++) {
            long $h = ($x * $aRef[$i] + $bRef[$i]) % ${MinHashFunctions.P}L;
            if ($h < 0) $h += ${MinHashFunctions.P}L;
            if ($h < $sig[$i]) $sig[$i] = $h;
          }
        }
        $finish
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashFunctions {

  val P = 1000000007L

  /** Deterministic (a,b) parameters for the k MinHash permutations.
    * Large well-mixed multipliers mod the prime — small odd a_i would
    * preserve magnitude ordering and bias the Jaccard estimator
    * (caught by TextDedupSpec in round 1).
    */
  def params(k: Int): Seq[(Long, Long)] =
    (1 to k).map(i => ((2654435761L * i + 1L) % P, (40503L * i.toLong * i + 17L) % P))

  /** Fused MinHash signature of a shingle-hash array column. */
  def minhashSig(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), k))
}
