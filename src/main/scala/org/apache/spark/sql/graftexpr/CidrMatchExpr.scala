package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, IntegerType, LongType}

/** `cidr_match(ip, net, prefix)` — IPv4-in-CIDR containment as a native
  * codegen'd Catalyst expression (SURVEY.md §2 A8 / B11.4).
  *
  * Semantics: `(ip >>> (32 - prefix)) == (net >>> (32 - prefix))` — the
  * first `prefix` bits agree; `prefix = 0` matches everything (a 32-bit
  * shift of the sub-2^32 inputs zeroes both sides). Inputs are longs
  * (dotted quads pre-converted via `graft.domain.LogParse.ipToLong`).
  *
  * The bit-op composition of built-ins covers the same semantics (SURVEY
  * §7.4); this expression fuses it into one generated comparison for the
  * hot path and gives it a SQL name. Lives under Spark's `sql` package —
  * the standard extension-library arrangement, since `ExpectsInputTypes`,
  * `AbstractDataType`, and the Column↔Expression bridge are `private[sql]`.
  * Public wiring (Column DSL, SQL registration, SparkSessionExtensions) is
  * in `graft.functions.CidrMatch`.
  */
case class CidrMatchExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, LongType, IntegerType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "cidr_match"

  override protected def nullSafeEval(ip: Any, net: Any, prefix: Any): Any = {
    val shift = 32 - prefix.asInstanceOf[Int]
    (ip.asInstanceOf[Long] >>> shift) == (net.asInstanceOf[Long] >>> shift)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ip, net, prefix) =>
      s"${ev.value} = (($ip >>> (32 - $prefix)) == ($net >>> (32 - $prefix)));")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Column↔Expression bridge for the public API (both are private[sql]). */
object CidrMatchExpr {
  def column(ip: Column, net: Column, prefix: Column): Column =
    ExpressionUtils.column(CidrMatchExpr(
      ExpressionUtils.expression(ip),
      ExpressionUtils.expression(net),
      ExpressionUtils.expression(prefix)))
}
