package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, LongType}

/** `hilbert_d(x, y, bits)` — the 2-D Hilbert-curve index of a cell, as a
  * native codegen'd Catalyst expression (SURVEY.md §2 B1.7 layout family /
  * B11.4).
  *
  * The classic iterative transform (Hilbert 1891; the bit-level loop is
  * the public-domain `xy2d` form popularized by Warren's Hacker's Delight
  * and Wikipedia's "Hilbert curve" article): per level from the top bit
  * down, take the quadrant (rx, ry), add its contribution s²·((3·rx)⊕ry),
  * and rotate/reflect the frame for the next level. Unlike the Morton
  * interleave ([[graft.core.Layout.zValueN]] — a FIXED tree of built-in
  * bit ops), the per-level frame rotation threads STATE (x, y) through
  * data-dependent swaps, so a built-in composition either chains `bits`
  * projections or duplicates subtrees ~4× per level; the kernel is one
  * fused integer loop instead, inside whole-stage codegen.
  *
  * Why Hilbert at all when Morton works: both give every sorted run a
  * tight 2-D bounding box, but the Hilbert curve is CONTINUOUS — every
  * step moves to a Manhattan-adjacent cell (spec-proven over the full
  * grid), where Morton jumps across the plane at power-of-two boundaries.
  * Continuous runs have no jump-straddling row group, so box-query
  * pruning is never worse and is measurably tighter on stripe queries
  * (LayoutSpec measures both under identical data and predicates).
  *
  * Determinism: pure integer arithmetic, partitioning-independent; the
  * declared `fn_hilbert` oracle runs the IDENTICAL per-level arithmetic
  * as a generated SQL chain ([[graft.core.Layout.hilbertSql]] — one
  * source, spliced not copied). `bits` must be a foldable 1..31; inputs
  * are caller-bucketed into [0, 2^bits) (the zValueN range contract).
  */
case class HilbertExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, LongType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_d"

  override protected def nullSafeEval(x: Any, y: Any, bits: Any): Any =
    HilbertExpr.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long],
      bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, bits) => {
      val (hx, hy, hd, hs, rx, ry, t) = (ctx.freshName("hx"),
        ctx.freshName("hy"), ctx.freshName("hd"), ctx.freshName("hs"),
        ctx.freshName("rx"), ctx.freshName("ry"), ctx.freshName("t"))
      s"""
         |long $hx = $x; long $hy = $y; long $hd = 0L;
         |for (long $hs = 1L << ($bits - 1); $hs > 0; $hs >>= 1) {
         |  long $rx = (($hx & $hs) != 0L) ? 1L : 0L;
         |  long $ry = (($hy & $hs) != 0L) ? 1L : 0L;
         |  $hd += $hs * $hs * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $hx = $hs - 1L - $hx; $hy = $hs - 1L - $hy; }
         |    long $t = $hx; $hx = $hy; $hy = $t;
         |  }
         |}
         |${ev.value} = $hd;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HilbertExpr {

  /** The reference loop — shared by the interpreted path and tests (the
    * generated Java in doGenCode is this, token for token). */
  def xy2d(xIn: Long, yIn: Long, bits: Int): Long = {
    var x = xIn; var y = yIn; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def column(x: Column, y: Column, bits: Column): Column =
    ExpressionUtils.column(HilbertExpr(
      ExpressionUtils.expression(x),
      ExpressionUtils.expression(y),
      ExpressionUtils.expression(bits)))
}
