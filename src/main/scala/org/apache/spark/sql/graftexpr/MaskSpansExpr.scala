package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType, StructField, StructType}

/** `mask_spans(tokens, spans)` — the tokens whose 1-based positions fall
  * OUTSIDE every `(span_start, span_len)` span, as a native codegen'd
  * two-pointer sweep (SURVEY.md §2 B11.4; the corpus-rewrite kernel under
  * `text_substring_mask`, [[graft.text.SubstringDedup.maskSpans]]).
  *
  * The composable form — `filter(tokens, (t, i) => !exists(spans, …))` —
  * is a nested HigherOrderFunction pair: interpreted (CodegenFallback
  * breaks the enclosing whole-stage span), a closure dispatch per token ×
  * per span, O(tokens × spans) per document. This expression sorts the
  * span bounds once per row (insertion sort — the span list is per-doc
  * duplication structure, a handful of islands) and then walks tokens and
  * spans together: O(tokens + spans·log) with zero allocation beyond the
  * output array.
  *
  * Semantics mirror the lambda form EXACTLY (MaskSpansSpec pins equality
  * on randomized inputs, overlapping and unsorted spans included): token
  * at array index i is kept iff no span satisfies
  * `span_start ≤ i+1 < span_start + span_len`. Null array on either side
  * → NULL. A null span ELEMENT (or a null span field) also mirrors the
  * lambda's three-valued logic: the `exists` predicate is then null for
  * every token it doesn't positively match, `!exists` is never true, and
  * `filter` keeps nothing — so the whole output is the EMPTY array, not
  * an NPE or a silent 0-position span (ADVICE r9; dupSpans output is
  * non-null in practice, but the kernel is a public generic).
  */
case class MaskSpansExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType),
      ArrayType(StructType(Seq(StructField("span_start", IntegerType),
        StructField("span_len", IntegerType)))))
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "mask_spans"

  override protected def nullSafeEval(t: Any, s: Any): Any = {
    val toks = t.asInstanceOf[ArrayData]
    val spans = s.asInstanceOf[ArrayData]
    val n = toks.numElements(); val m = spans.numElements()
    val starts = new Array[Int](m); val ends = new Array[Int](m)
    var k = 0
    while (k < m) {
      // tri-state mirror: one null span/field poisons every token's
      // exists-predicate → the lambda form keeps nothing (scaladoc)
      if (spans.isNullAt(k)) return new GenericArrayData(new Array[AnyRef](0))
      val sp = spans.getStruct(k, 2)
      if (sp.isNullAt(0) || sp.isNullAt(1))
        return new GenericArrayData(new Array[AnyRef](0))
      starts(k) = sp.getInt(0); ends(k) = sp.getInt(0) + sp.getInt(1) - 1
      k += 1
    }
    var a = 1
    while (a < m) {
      val sv = starts(a); val ev = ends(a); var b = a - 1
      while (b >= 0 && starts(b) > sv) {
        starts(b + 1) = starts(b); ends(b + 1) = ends(b); b -= 1
      }
      starts(b + 1) = sv; ends(b + 1) = ev
      a += 1
    }
    val kept = new Array[AnyRef](n)
    var cnt = 0; var j = 0; var i = 0
    while (i < n) {
      val pos = i + 1
      while (j < m && ends(j) < pos) j += 1
      if (!(j < m && starts(j) <= pos)) {
        kept(cnt) = toks.getUTF8String(i); cnt += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(kept, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val starts = ctx.freshName("starts"); val ends = ctx.freshName("ends")
      val sp = ctx.freshName("sp"); val k = ctx.freshName("k")
      val a = ctx.freshName("a"); val b = ctx.freshName("b")
      val sv = ctx.freshName("sv"); val ev2 = ctx.freshName("ev")
      val kept = ctx.freshName("kept"); val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val pos = ctx.freshName("pos")
      val poisoned = ctx.freshName("poisoned")
      s"""
         |int $n = $t.numElements(); int $m = $s.numElements();
         |int[] $starts = new int[$m]; int[] $ends = new int[$m];
         |boolean $poisoned = false;
         |for (int $k = 0; $k < $m && !$poisoned; $k++) {
         |  org.apache.spark.sql.catalyst.InternalRow $sp =
         |    $s.isNullAt($k) ? null : $s.getStruct($k, 2);
         |  if ($sp == null || $sp.isNullAt(0) || $sp.isNullAt(1)) {
         |    // tri-state mirror: null span/field => lambda keeps nothing
         |    $poisoned = true;
         |  } else {
         |    $starts[$k] = $sp.getInt(0);
         |    $ends[$k] = $sp.getInt(0) + $sp.getInt(1) - 1;
         |  }
         |}
         |if ($poisoned) { $n = 0; $m = 0; }
         |for (int $a = 1; $a < $m; $a++) {
         |  int $sv = $starts[$a]; int $ev2 = $ends[$a]; int $b = $a - 1;
         |  while ($b >= 0 && $starts[$b] > $sv) {
         |    $starts[$b + 1] = $starts[$b]; $ends[$b + 1] = $ends[$b]; $b--;
         |  }
         |  $starts[$b + 1] = $sv; $ends[$b + 1] = $ev2;
         |}
         |Object[] $kept = new Object[$n];
         |int $cnt = 0; int $j = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $pos = $i + 1;
         |  while ($j < $m && $ends[$j] < $pos) { $j++; }
         |  if (!($j < $m && $starts[$j] <= $pos)) {
         |    $kept[$cnt++] = $t.getUTF8String($i);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($kept, $cnt));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column↔Expression bridge for the public API (both are private[sql]). */
object MaskSpansExpr {
  def column(tokens: Column, spans: Column): Column =
    ExpressionUtils.column(MaskSpansExpr(
      ExpressionUtils.expression(tokens),
      ExpressionUtils.expression(spans)))
}
