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

/** Value at the SECOND-largest (ord1, ord2) pair; null when the group
  * has fewer than two rows with non-null ordering keys.
  *
  * Motivation (r17 optimization round): LatestPrices.snapshot needed
  * `lead(price, 1)` over a full per-symbol descending sort — a Sort +
  * Window pass over every silver row just to read the top two. With
  * this aggregate the query becomes a HashAggregate with map-side
  * partials: per-partition state is two (ord, value) slots per group
  * and the exchange ships two rows' worth of buffer per group per map
  * task instead of every trade. Same primitive-buffer discipline as
  * [[ExtremumByOrd2]] (a struct buffer would fall back to
  * SortAggregate).
  *
  * Correctness note for callers: "second largest by (ord1, ord2)"
  * equals `lead(value, 1) OVER (ORDER BY ord1 DESC, ord2 DESC)` read
  * at the top row ONLY when the ordering key is unique per group —
  * with duplicate keys the window form's tie order is arbitrary while
  * this aggregate is deterministic. The a6 call site orders by the
  * dedup key (symbol, event_time), unique by construction.
  */
case class SecondMaxByOrd2(valueExpr: Expression, ord1: Expression, ord2: Expression)
    extends DeclarativeAggregate with Serializable {

  override def children: Seq[Expression] = Seq(valueExpr, ord1, ord2)
  override def nullable: Boolean = true
  override def dataType: DataType = valueExpr.dataType
  override def prettyName: String = "second_max_by_ord2"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ord1.dataType == LongType && ord2.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName ordering keys must be BIGINT, got ${ord1.dataType}, ${ord2.dataType}")

  // Top-1 slots (a) and runner-up slots (b), each with the explicit
  // emptiness flag of the ExtremumByOrd2 pattern.
  private lazy val aO1 = AttributeReference("aO1", LongType)()
  private lazy val aO2 = AttributeReference("aO2", LongType)()
  private lazy val aV = AttributeReference("aV", valueExpr.dataType)()
  private lazy val aSet = AttributeReference("aSet", BooleanType, nullable = false)()
  private lazy val bO1 = AttributeReference("bO1", LongType)()
  private lazy val bO2 = AttributeReference("bO2", LongType)()
  private lazy val bV = AttributeReference("bV", valueExpr.dataType)()
  private lazy val bSet = AttributeReference("bSet", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(aO1, aO2, aV, aSet, bO1, bO2, bV, bSet)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(Long.MinValue, LongType), Literal(Long.MinValue, LongType),
    Literal.create(null, valueExpr.dataType), Literal(false, BooleanType),
    Literal(Long.MinValue, LongType), Literal(Long.MinValue, LongType),
    Literal.create(null, valueExpr.dataType), Literal(false, BooleanType))

  private def gt(o1: Expression, o2: Expression,
                 p1: Expression, p2: Expression): Expression =
    Or(GreaterThan(o1, p1), And(EqualTo(o1, p1), GreaterThan(o2, p2)))

  override lazy val updateExpressions: Seq[Expression] = {
    val valid = And(IsNotNull(ord1), IsNotNull(ord2))
    val beatsA = And(valid, Or(Not(aSet), gt(ord1, ord2, aO1, aO2)))
    val beatsB = And(valid, Or(Not(bSet), gt(ord1, ord2, bO1, bO2)))
    Seq(
      If(beatsA, ord1, aO1),
      If(beatsA, ord2, aO2),
      If(beatsA, valueExpr, aV),
      Or(aSet, beatsA),
      // New top demotes the old top into slot b; a row that only beats
      // b replaces b.
      If(beatsA, aO1, If(beatsB, ord1, bO1)),
      If(beatsA, aO2, If(beatsB, ord2, bO2)),
      If(beatsA, aV, If(beatsB, valueExpr, bV)),
      // A row that takes the top demotes the old top into b (set iff a
      // was set); otherwise it may take b directly.
      Or(bSet, Or(And(beatsA, aSet), And(Not(beatsA), beatsB))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    // Top-2 of {A_l, B_l, A_r, B_r} with B_x <= A_x invariant: the new
    // top is max(A_l, A_r); the new runner-up is max(losing A, winning
    // side's B).
    // aSet/bSet resolve to .left/.right attribute pairs.
    val rBeatsL = And(aSet.right, Or(Not(aSet.left), gt(aO1.right, aO2.right, aO1.left, aO2.left)))
    val newAO1 = If(rBeatsL, aO1.right, aO1.left)
    val newAO2 = If(rBeatsL, aO2.right, aO2.left)
    val newAV = If(rBeatsL, aV.right, aV.left)
    val newASet = Or(aSet.left, aSet.right)
    // Runner-up candidates: the losing top (set iff that side had a
    // top) and the winning side's runner-up.
    val candO1 = If(rBeatsL, aO1.left, aO1.right)
    val candO2 = If(rBeatsL, aO2.left, aO2.right)
    val candV = If(rBeatsL, aV.left, aV.right)
    val candSet = If(rBeatsL, aSet.left, aSet.right)
    val wbO1 = If(rBeatsL, bO1.right, bO1.left)
    val wbO2 = If(rBeatsL, bO2.right, bO2.left)
    val wbV = If(rBeatsL, bV.right, bV.left)
    val wbSet = If(rBeatsL, bSet.right, bSet.left)
    val candBeatsWb = And(candSet, Or(Not(wbSet), gt(candO1, candO2, wbO1, wbO2)))
    Seq(
      newAO1, newAO2, newAV, newASet,
      If(candBeatsWb, candO1, wbO1),
      If(candBeatsWb, candO2, wbO2),
      If(candBeatsWb, candV, wbV),
      Or(wbSet, candBeatsWb))
  }

  override lazy val evaluateExpression: Expression =
    If(bSet, bV, Literal.create(null, valueExpr.dataType))

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

  /** value at the second-largest (ord1, ord2); null if < 2 rows. */
  def secondMaxByOrd2(value: Column, ord1: Column, ord2: Column): Column =
    ColumnBridge.column(SecondMaxByOrd2(e(value), e(ord1), e(ord2)).toAggregateExpression())
}
