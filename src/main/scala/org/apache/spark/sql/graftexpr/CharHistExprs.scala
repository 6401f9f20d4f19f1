package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_hist(s)` — 27-bucket byte histogram of a string (a–z
  * case-folded, everything else in bucket 26), as a fixed-width int array.
  *
  * Physical prefilter support for edit-distance joins: computed ONCE per
  * row before the join fans out to candidate pairs. See [[L1DiffExpr]] for
  * the bound it feeds. Operates on UTF-8 BYTES (multi-byte code points land
  * in bucket 26) — fine for a lower bound: coarser buckets only ever
  * decrease the L1 distance, which keeps the filter a superset.
  */
case class CharHistExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "char_hist"

  override protected def nullSafeEval(s: Any): Any = {
    val bytes = s.asInstanceOf[UTF8String].getBytes
    val h = new Array[Int](27)
    var i = 0
    while (i < bytes.length) {
      val c = (bytes(i) | 0x20) - 'a'
      h(if (c >= 0 && c < 26) c else 26) += 1
      i += 1
    }
    new GenericArrayData(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes"); val h = ctx.freshName("h")
      val i = ctx.freshName("i"); val c = ctx.freshName("c")
      s"""
         |byte[] $bytes = $s.getBytes();
         |int[] $h = new int[27];
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  int $c = ($bytes[$i] | 0x20) - 'a';
         |  $h[($c >= 0 && $c < 26) ? $c : 26]++;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($h);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharHistExpr {
  def column(s: Column): Column =
    ExpressionUtils.column(CharHistExpr(ExpressionUtils.expression(s)))
}

/** `l1_diff(a, b)` — Σ|aᵢ − bᵢ| over two equal-length int arrays, codegen'd.
  *
  * With [[CharHistExpr]] histograms this lower-bounds edit distance: one
  * edit (insert/delete/substitute) moves at most one count down and one up,
  * so `ed(a,b) ≥ l1_diff(hist(a), hist(b)) / 2`. Requiring `l1 ≤ 2t` before
  * `levenshtein(a, b, t)` is therefore a PURE physical prefilter — it can
  * never drop a qualifying pair — and costs ~54 adds against the banded
  * DP's per-pair work, turning the 3.1M-candidate string-sim join from
  * levenshtein-bound into filter-bound. Mismatched lengths return
  * Int.MaxValue (reject — histograms of different widths are a caller bug).
  *
  * Null elements propagate NULL (like [[DotProductExpr]]): a null count
  * slot read as 0 would silently shrink the distance and admit wrong
  * pairs, so the expression refuses to guess. [[CharHistExpr]] output is
  * containsNull=false by construction, so the hot path never pays the
  * check's branch in practice (it predicts perfectly).
  */
case class L1DiffExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "l1_diff"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return Int.MaxValue
    var s = 0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getInt(i) - y.getInt(i)
      s += (if (d < 0) -d else d)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.value} = Integer.MAX_VALUE;
         |} else {
         |  int $s = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    int $d = $a.getInt($i) - $b.getInt($i);
         |    $s += ($d < 0) ? -$d : $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object L1DiffExpr {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(L1DiffExpr(
      ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))
}
