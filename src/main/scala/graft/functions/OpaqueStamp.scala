package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** A value-preserving optimizer barrier: evaluates to exactly its
  * child, but declares itself NON-FOLDABLE and NULLABLE so Catalyst
  * can never statically evaluate a predicate built over it.
  *
  * Exists for one load-bearing call site — the heartbeat strip filter
  * (graft.streaming.Heartbeats): its `!hb OR event_time IS NULL`
  * predicate must keep a live reference to the watermark column, or
  * PushPredicateThroughNonJoin moves it below the EventTimeWatermark
  * collector and the heartbeats silently die. Two optimizer rules can
  * erase that reference when a heartbeat-only micro-batch prunes the
  * union down to the heartbeat branch: FoldablePropagation +
  * ConstantFolding (a literal stamp) and NullPropagation's
  * `IsNull(non-nullable) → false` rewrite (ANY stamp built purely
  * from the rate source's non-nullable columns). Routing the stamp
  * through this barrier defeats both statically — the alias is
  * non-foldable, and `isnull` over a nullable-declared expression
  * cannot be rewritten — while the generated code remains the child's
  * (pass-through, whole-stage-codegen friendly; declaring nullability
  * the child lacks costs one generated null-flag, never a wrong
  * result).
  *
  * This is deliberately NOT a general-purpose hint: semantically it
  * weakens what the optimizer may assume, so every use must carry the
  * argument for why the barrier is load-bearing. Do not reach for it
  * to "fix" a plan shape a declarative rewrite could fix.
  */
case class OpaqueStamp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
  override def foldable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(newChild: Expression): OpaqueStamp =
    copy(child = newChild)
  override def prettyName: String = "opaque_stamp"
}

object OpaqueStamp {
  def apply(c: Column): Column = ColumnBridge.column(OpaqueStamp(ColumnBridge.expression(c)))
}

/** A value-preserving PUSHDOWN barrier: evaluates to exactly its
  * child but declares itself NON-DETERMINISTIC — the one property
  * every alias-substituting optimizer rule respects.
  *
  * Why it exists (r18 optimization round, guide §4.4 applied to
  * native expression trees): `PushPredicateThroughNonJoin` re-inlines
  * a Project's deterministic aliases into any filter condition it
  * pushes below the Project, COST-BLIND — so a filter over a staged
  * expensive column (a hashed-ngram score, a tokenization) re-
  * evaluates the whole producing tree at every reference, per row,
  * interpreted (HOF lambdas get no codegen CSE). Measured on
  * c2_curation_pipeline: the pushed quota filter carried FOUR copies
  * of the full score-aggregate tree and ~15 copies of the langId
  * tokenize into the parquet scan's filter (plans/r17/
  * c2_curation_pipeline_after.txt Filter(2)); warm wall 1.35 s where
  * the staged single-evaluation form costs ~0.4 s. Marking the staged
  * alias non-deterministic stops the substitution (and CollapseProject
  * duplication) while the value — a pure function of the row — is
  * unchanged, so results cannot move.
  *
  * The flag only FORFEITS optimizations (pushdown past the stage,
  * constant folding); it never licenses a wrong plan. Like
  * OpaqueStamp, this is not a general hint: each use must argue the
  * guarded tree is expensive enough that one blocked pushdown is the
  * cheaper side of the trade.
  */
case class StageBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def foldable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(newChild: Expression): StageBarrier =
    copy(child = newChild)
  override def prettyName: String = "stage_barrier"
}

object StageBarrier {
  def apply(c: Column): Column = ColumnBridge.column(StageBarrier(ColumnBridge.expression(c)))
}
