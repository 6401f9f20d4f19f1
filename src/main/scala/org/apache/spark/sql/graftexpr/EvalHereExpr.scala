package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.DataType

/** `eval_here(expr)` — an identity wrapper whose ONLY job is to pin its
  * child where it is written: it declares itself nondeterministic, so no
  * optimizer rule may substitute it into a moved predicate, fold it, or
  * collapse it into another operator. Primary use: wrapping an expensive
  * PROJECTED column (the fw scalar matcher) — Catalyst pushes filters
  * through deterministic projections regardless of the filter's own
  * determinism, substituting the projection's expression into the pushed
  * predicate and thereby evaluating it twice per row; a nondeterministic
  * project field fails the rule's `fields.forall(_.deterministic)` gate
  * and the filter stays above, testing the already-computed attribute.
  *
  * Why an opaque expression and not a `rand()` trick: the previous
  * incarnation of this barrier was `pred || rand(seed) < -1.0` on the
  * FILTER — always false and nondeterministic. Spark 4.1.2's
  * simplification is range-aware about `rand()` (∈ [0,1)): it folds
  * `rand(7) < -1.0` to `false`, BooleanSimplification drops the arm, and
  * a nondeterministic filter condition never blocked the through-Project
  * push in the first place — so the double evaluation silently returned
  * (caught by ExplainAudit's matcher-once count gate, measured 2.8× on
  * the fw count family). No optimizer version can make either move
  * against a foreign expression it cannot see into: this wrapper has no
  * known range, no foldability, and no algebraic identity to exploit.
  *
  * Execution cost is zero: interpreted eval delegates to the child, and
  * codegen emits exactly the child's code (same ExprCode, no extra
  * instructions), so the hot path stays inside whole-stage codegen.
  *
  * Cluster retry semantics (the accepted trade, same as any
  * nondeterministic predicate): a stage containing a nondeterministic
  * expression is not assumed reproducible, so a task/fetch failure may
  * recompute the stage rather than replay one task. The wrapped predicate
  * is in fact pure, so the recompute yields identical data; the cost is
  * bounded retry amplification vs. a steady-state 2× on every run.
  */
case class EvalHereExpr(child: Expression)
    extends UnaryExpression with Nondeterministic {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "eval_here"

  override protected def initializeInternal(partitionIndex: Int): Unit =
    child.foreach {
      case n: Nondeterministic => n.initialize(partitionIndex)
      case _ =>
    }

  override protected def evalInternal(input: InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): EvalHereExpr =
    copy(child = newChild)
}

/** Column↔Expression bridge for the public API (both are private[sql]). */
object EvalHereExpr {
  def column(c: Column): Column =
    ExpressionUtils.column(EvalHereExpr(ExpressionUtils.expression(c)))
}
