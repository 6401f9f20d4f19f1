package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** `dot_f64(a, b)` — double-array dot product as a native codegen'd loop
  * (SURVEY.md §2 B11.4; the hot kernel under every cosine in the
  * similarity/dedup stack).
  *
  * The composable form, `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, is a
  * pair of HigherOrderFunction expressions: no codegen (CodegenFallback
  * inside the stage), an intermediate product ARRAY allocated per row, and
  * a closure dispatch per element — multiplied by ~1.3M candidate pairs in
  * the label-blocked dedup join. This expression is the same arithmetic as
  * one generated loop.
  *
  * Bit-compatibility is load-bearing (see [[graft.sim.VectorMath]]): the
  * sum accumulates LEFT-TO-RIGHT from 0.0 — the identical IEEE operation
  * sequence as the aggregate() fold and as DuckDB's `list_reduce`, so
  * swapping this in changes no query result, only the plan. Edge semantics
  * also mirror the composed form: length mismatch → NULL (zip_with pads
  * with null and the fold absorbs it), any null element → NULL.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_f64"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column↔Expression bridge for the public API (both are private[sql]). */
object DotProductExpr {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductExpr(
      ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))
}
