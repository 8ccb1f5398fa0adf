package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared inner loop, called from both interpreted eval and generated
  * code: h = (h * mult + codepoint) mod m over the string's Unicode
  * codepoints — the exact recurrence of the fold-based tokenHash and
  * of the DuckDB oracle's list_reduce over ord(substr(...)).
  */
object PolyHashUtil {
  /** Allocation-free: decodes codepoints straight from the
    * UTF8String's backing bytes (no String copy per call — this runs
    * once per token per row in the text operators).
    */
  def hash(s: UTF8String, mult: Long, mod: Long): Long = {
    val n = s.numBytes
    var h = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if (b0 < 0xe0) { cp = b0 & 0x1f; len = 2 }
      else if (b0 < 0xf0) { cp = b0 & 0x0f; len = 3 }
      else { cp = b0 & 0x07; len = 4 }
      var j = 1
      while (j < len && i + j < n) {
        cp = (cp << 6) | (s.getByte(i + j) & 0x3f)
        j += 1
      }
      h = (h * mult + cp) % mod
      i += len
    }
    h
  }
}

/** Native polynomial rolling hash over a string column's codepoints.
  *
  * The composable form (`aggregate` over `split(s, "")` with an
  * `ascii` lambda) walks interpreted closures per character — it is
  * the hot inner loop of every text operator (token hashing,
  * fingerprints, SimHash). This expression runs the same recurrence
  * as one compiled loop; semantics are identical for ASCII and
  * *better* for non-ASCII (true codepoints, where split("") yields
  * UTF-16 code units).
  */
case class PolyHash(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    PolyHashUtil.hash(input.asInstanceOf[UTF8String], mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHashUtil.hash($c, ${mult}L, ${mod}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PolyHashFunctions {
  def polyHash(s: Column, mult: Long, mod: Long): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(s), mult, mod))
}
