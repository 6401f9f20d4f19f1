package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** `sq_dot(codes, weights)` — the scan kernel of SCALAR quantization
  * (SURVEY.md §2 B11.4; [[graft.sim.Sq]]): Σ_i weights[i] · codes[i], an
  * int-array × double-array weighted sum as one generated loop.
  *
  * Why it exists: an SQ8-encoded corpus stores each dimension as an 8-bit
  * level c_i with per-dimension affine params (min_i, step_i), so
  *
  *   ⟨q, decode(c)⟩ = Σ q_i · (min_i + step_i·c_i)
  *                  = ⟨q, min⟩  +  Σ (q_i·step_i) · c_i
  *
  * — the first term is a per-query constant and the second is THIS kernel
  * with weights_i = q_i·step_i, computed once per query. The composable
  * alternative (`codes.cast("array<double>")` + [[DotProductExpr]], or an
  * `aggregate(zip_with(...))` fold) allocates a converted array per
  * corpus row inside the scan; this is the same arithmetic with no
  * per-row allocation, accumulating left-to-right from 0.0 (the repo's
  * IEEE-sequence convention). Edge semantics mirror [[DotProductExpr]]:
  * length mismatch → NULL, any null element → NULL.
  */
case class SqDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += y.getDouble(i) * x.getInt(i)
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
         |    $s += $b.getDouble($i) * $a.getInt($i);
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
object SqDotExpr {
  def column(codes: Column, weights: Column): Column =
    ExpressionUtils.column(SqDotExpr(
      ExpressionUtils.expression(codes),
      ExpressionUtils.expression(weights)))
}
