package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst aggregates: min_by/max_by with a TWO-LEVEL ordering
  * key (primary + tie-break), declared over primitive buffer slots.
  *
  * Why not the built-in `min_by(value, struct(ord1, ord2))`: a struct
  * ordering key makes the aggregation buffer non-mutable in UnsafeRow
  * terms, so Spark falls back to SortAggregate — every group's rows
  * must be sorted before aggregating, an extra sort per shuffle side
  * at 100 TB. This DeclarativeAggregate keeps the buffer as three
  * primitive slots (ord1, ord2, value), so the planner uses
  * HashAggregate with whole-stage codegen and map-side partial
  * aggregation. (Observed on the OHLCV plan: SortAggregate ->
  * HashAggregate after switching.)
  *
  * Semantics: value at the smallest/largest (ord1, ord2) pair;
  * null-ord rows are ignored; empty group -> null.
  */
abstract class ExtremumByOrd2 extends DeclarativeAggregate with Serializable {

  def valueExpr: Expression
  def ord1: Expression
  def ord2: Expression
  /** true -> min_by; false -> max_by */
  def isMin: Boolean

  override def children: Seq[Expression] = Seq(valueExpr, ord1, ord2)
  override def nullable: Boolean = true
  override def dataType: DataType = valueExpr.dataType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ord1.dataType == LongType && ord2.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName ordering keys must be BIGINT, got ${ord1.dataType}, ${ord2.dataType}")

  protected lazy val bOrd1 = AttributeReference("bOrd1", LongType)()
  protected lazy val bOrd2 = AttributeReference("bOrd2", LongType)()
  protected lazy val bVal = AttributeReference("bVal", valueExpr.dataType)()
  // Explicit emptiness flag: using IsNull(bVal) as the marker would
  // make a NULL value at the winning ordering key reset the buffer,
  // turning the result row-order-dependent (found in review).
  protected lazy val bSet = AttributeReference("bSet", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bOrd1, bOrd2, bVal, bSet)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(if (isMin) Long.MaxValue else Long.MinValue, LongType),
    Literal(if (isMin) Long.MaxValue else Long.MinValue, LongType),
    Literal.create(null, valueExpr.dataType),
    Literal(false, BooleanType))

  private def better(o1: Expression, o2: Expression,
                     curO1: Expression, curO2: Expression): Expression =
    if (isMin) Or(LessThan(o1, curO1), And(EqualTo(o1, curO1), LessThan(o2, curO2)))
    else Or(GreaterThan(o1, curO1), And(EqualTo(o1, curO1), GreaterThan(o2, curO2)))

  override lazy val updateExpressions: Seq[Expression] = {
    val take = And(And(IsNotNull(ord1), IsNotNull(ord2)),
      Or(Not(bSet), better(ord1, ord2, bOrd1, bOrd2)))
    Seq(
      If(take, ord1, bOrd1),
      If(take, ord2, bOrd2),
      If(take, valueExpr, bVal),
      Or(bSet, take))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = And(bSet.right,
      Or(Not(bSet.left), better(bOrd1.right, bOrd2.right, bOrd1.left, bOrd2.left)))
    Seq(
      If(take, bOrd1.right, bOrd1.left),
      If(take, bOrd2.right, bOrd2.left),
      If(take, bVal.right, bVal.left),
      Or(bSet.left, bSet.right))
  }

  override lazy val evaluateExpression: Expression =
    If(bSet, bVal, Literal.create(null, valueExpr.dataType))
}

case class MinByOrd2(valueExpr: Expression, ord1: Expression, ord2: Expression)
    extends ExtremumByOrd2 {
  override def isMin: Boolean = true
  override def prettyName: String = "min_by_ord2"
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(valueExpr = c(0), ord1 = c(1), ord2 = c(2))
}

case class MaxByOrd2(valueExpr: Expression, ord1: Expression, ord2: Expression)
    extends ExtremumByOrd2 {
  override def isMin: Boolean = false
  override def prettyName: String = "max_by_ord2"
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(valueExpr = c(0), ord1 = c(1), ord2 = c(2))
}

object OrderedExtremum {
  private def e(c: Column) = ColumnBridge.expression(c)

  /** value at the smallest (ord1, ord2). */
  def minByOrd2(value: Column, ord1: Column, ord2: Column): Column =
    ColumnBridge.column(MinByOrd2(e(value), e(ord1), e(ord2)).toAggregateExpression())

  /** value at the largest (ord1, ord2). */
  def maxByOrd2(value: Column, ord1: Column, ord2: Column): Column =
    ColumnBridge.column(MaxByOrd2(e(value), e(ord1), e(ord2)).toAggregateExpression())
}
