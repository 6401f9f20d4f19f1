package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** TEST-ONLY fixture (test sources, never on the production classpath)
  * for the codegen-fallback zero-gate (ExplainAuditSpec): an expression
  * whose generated Java is deliberately invalid, so codegen COMPILATION
  * fails while the interpreted path works. Under the default FALLBACK
  * factory mode the engine silently interprets it; under CODEGEN_ONLY
  * it must throw — exactly the non-vacuity witness the gate needs. */
case class BrokenCodegenExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "broken_codegen"

  override protected def nullSafeEval(v: Any): Any =
    v.asInstanceOf[Long] + 1L

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      // invalid Java on purpose: undefined symbol
      s"${ev.value} = this_symbol_does_not_exist($v);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object BrokenCodegenExpr {
  def column(c: Column): Column =
    ExpressionUtils.column(BrokenCodegenExpr(ExpressionUtils.expression(c)))
}
