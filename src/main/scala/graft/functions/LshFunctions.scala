package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native sign-LSH bucket keys for multi-table random-hyperplane
  * hashing: one fused loop computing all `tables` keys (each `planes`
  * sign bits) over the vector — replaces tables*planes interpreted
  * zip_with/aggregate folds per row.
  *
  * Hyperplane weights are deterministic (fixed integer hash of
  * (plane, dim), identical to Similarity.planeComponent) and are
  * materialized once per plan as a flat double[], referenced from the
  * generated code — no RNG state, reproducible everywhere.
  */
case class SignLshKeys(child: Expression, planes: Int, tables: Int, dim: Int)
    extends UnaryExpression with Serializable {

  // The key packs one sign bit per plane into a long, and the seed
  // convention strides tables by 64 (t * 64 + p): planes > 64 would
  // wrap the shift AND collide table seeds, silently degenerating the
  // buckets.
  require(planes >= 1 && planes <= 64, s"planes must be in [1, 64], got $planes")
  require(tables >= 1 && dim >= 1, s"tables=$tables and dim=$dim must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_lsh_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got $other")
  }

  /** Flat [ (t*planes + p)*dim + d ] weight table. */
  lazy val weights: Array[Double] = {
    val w = new Array[Double](tables * planes * dim)
    var idx = 0
    for (t <- 0 until tables; p <- 0 until planes; d <- 0 until dim) {
      w(idx) = LshWeights.component(t * 64 + p, d); idx += 1
    }
    w
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var p = 0
      while (p < planes) {
        val base = (t * planes + p) * dim
        var proj = 0.0
        var d = 0
        while (d < n) {
          val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
          proj += x * weights(base + d)
          d += 1
        }
        if (proj >= 0) key |= (1L << p)
        p += 1
      }
      keys(t) = key
      t += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("lshWeights", weights, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val keys = ctx.freshName("keys")
      val t = ctx.freshName("t"); val p = ctx.freshName("p")
      val d = ctx.freshName("d"); val proj = ctx.freshName("proj")
      val key = ctx.freshName("key"); val base = ctx.freshName("base")
      s"""
        int $n = java.lang.Math.min($v.numElements(), $dim);
        long[] $keys = new long[$tables];
        for (int $t = 0; $t < $tables; $t++) {
          long $key = 0L;
          for (int $p = 0; $p < $planes; $p++) {
            int $base = ($t * $planes + $p) * $dim;
            double $proj = 0.0;
            for (int $d = 0; $d < $n; $d++) {
              $proj += ((double) $v.$get($d)) * $wRef[$base + $d];
            }
            if ($proj >= 0) $key |= (1L << $p);
          }
          $keys[$t] = $key;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Deterministic pseudo-random hyperplane component shared by the
  * native expression and the fold-based reference implementation.
  */
object LshWeights {
  def component(p: Int, d: Int): Double = {
    var h = p * 2654435761L + d * 40503L + 12345L
    h ^= (h >>> 16); h *= 0x85ebca6bL; h &= 0xffffffffL
    h ^= (h >>> 13); h *= 0xc2b2ae35L; h &= 0xffffffffL
    h ^= (h >>> 16)
    (h & 0xffffffffL).toDouble / 2147483648.0 - 1.0
  }
}

object LshFunctions {
  /** All multi-table sign-LSH keys of a vector column as array<long>
    * (index = table).
    */
  def signLshKeys(vec: Column, planes: Int, tables: Int, dim: Int): Column =
    ColumnBridge.column(SignLshKeys(ColumnBridge.expression(vec), planes, tables, dim))
}
