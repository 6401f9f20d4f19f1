package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** `pq_lut(v, cbflat, m)` — per-probe ADC lookup-table construction for
  * product quantization (SURVEY.md §2 B11.4; the probe-side prep of
  * [[graft.sim.Pq]], consumed by [[PqAdcExpr]]).
  *
  * `v` is a probe vector (dim d), `cbflat` the frozen codebooks
  * flattened row-major by slot — slot s = m·W + c holds codeword
  * (m, c)'s sub/W-dim entries at cbflat[s·sub .. s·sub+sub), with
  * dropped (degenerate) codes left as zeros — and `m` the subquantizer
  * count. W derives as cbflat.length / d (cbflat.length = m·W·sub and
  * d = m·sub). Output: array of m·W doubles, lut[m·W + c] =
  * ⟨v_m, codebook_m[c]⟩ — exactly [[graft.sim.Pq.lutFor]]'s layout.
  *
  * Why an Expression: a multi-probe prefilter (the
  * [[graft.sim.SemDedup.corpusDupFlags]] PQ path) needs one LUT per
  * probe ROW. The relational form — explode each probe into M
  * subvectors, join the codebook, groupBy back — shuffles
  * probes × M × K slim rows (92M at the volume scale) to assemble
  * arrays the probe row could compute in place; this is that
  * computation as one generated loop over a literal codebook,
  * MAP-ONLY and inside whole-stage codegen. d·W multiplications per
  * row — the same arithmetic the join form spreads across an exchange.
  * Edge semantics: null array or element → NULL; d = 0, d not
  * divisible by m, or cbflat not divisible by d → NULL (a mis-shaped
  * codebook must surface, not score misaligned slices).
  */
case class PqLutExpr(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val m = c.asInstanceOf[Int]
    val d = v.numElements()
    if (d == 0 || m <= 0 || d % m != 0 || cb.numElements() % d != 0)
      return null
    val sub = d / m
    val w = cb.numElements() / d
    var i = 0
    while (i < d) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Double](m * w)
    var slot = 0
    while (slot < m * w) {
      val vb = (slot / w) * sub
      val base = slot * sub
      var s = 0.0
      var j = 0
      while (j < sub) {
        if (cb.isNullAt(base + j)) return null
        s += v.getDouble(vb + j) * cb.getDouble(base + j)
        j += 1
      }
      out(slot) = s
      slot += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val d = ctx.freshName("d"); val sub = ctx.freshName("sub")
      val w = ctx.freshName("w"); val out = ctx.freshName("out")
      val slot = ctx.freshName("slot"); val vb = ctx.freshName("vb")
      val base = ctx.freshName("base"); val s = ctx.freshName("s")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      s"""
         |int $d = $a.numElements();
         |if ($d == 0 || $c <= 0 || $d % $c != 0
         |    || $b.numElements() % $d != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $sub = $d / $c;
         |  int $w = $b.numElements() / $d;
         |  for (int $i = 0; $i < $d; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  }
         |  if (!${ev.isNull}) {
         |    double[] $out = new double[$c * $w];
         |    for (int $slot = 0; $slot < $c * $w && !${ev.isNull}; $slot++) {
         |      int $vb = ($slot / $w) * $sub;
         |      int $base = $slot * $sub;
         |      double $s = 0.0;
         |      for (int $j = 0; $j < $sub; $j++) {
         |        if ($b.isNullAt($base + $j)) { ${ev.isNull} = true; break; }
         |        $s += $a.getDouble($vb + $j) * $b.getDouble($base + $j);
         |      }
         |      $out[$slot] = $s;
         |    }
         |    if (!${ev.isNull}) {
         |      ${ev.value} =
         |        new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Column↔Expression bridge for the public API (both are private[sql]). */
object PqLutExpr {
  def column(v: Column, cbFlat: Column, m: Column): Column =
    ExpressionUtils.column(PqLutExpr(
      ExpressionUtils.expression(v),
      ExpressionUtils.expression(cbFlat),
      ExpressionUtils.expression(m)))
}
