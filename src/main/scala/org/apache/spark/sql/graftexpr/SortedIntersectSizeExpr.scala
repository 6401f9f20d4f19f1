package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** `sorted_intersect_size(a, b)` — |A ∩ B| for two SORTED long arrays as a
  * native codegen'd merge scan (SURVEY.md §2 B11.4; used by the
  * `sim_ngram_jaccard` hot path over dictionary-encoded token sets).
  *
  * `size(array_intersect(a, b))` allocates and fills a hash set per row —
  * per candidate PAIR in a similarity self-join, which is the multiplied-out
  * cost center at 325k+ candidates. When both sides are already sorted
  * (`array_sort` at encode time, amortized once per document instead of
  * once per pair), the intersection size is a single allocation-free merge
  * scan. Equal runs are skipped so duplicate elements count once, matching
  * `array_intersect`'s set semantics even if the 64-bit dictionary ever
  * collided two tokens into one id.
  *
  * Caller contract: both arrays ascending-sorted, elements non-null.
  */
case class SortedIntersectSizeExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        c += 1
        while (i < n && x.getLong(i) == xv) i += 1
        while (j < m && y.getLong(j) == yv) j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else {
         |    $c++;
         |    while ($i < $n && $a.getLong($i) == $xv) { $i++; }
         |    while ($j < $m && $b.getLong($j) == $yv) { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column↔Expression bridge for the public API (both are private[sql]). */
object SortedIntersectSizeExpr {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectSizeExpr(
      ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))
}
