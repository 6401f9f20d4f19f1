package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, LongType}

/** `hilbert_nd(bits, d0, d1, …, dk)` — the N-dimensional Hilbert-curve
  * index of a cell, as a native codegen'd Catalyst expression (SURVEY.md
  * §2 B1.8/B11.4; the round-16 generalization of the 2-D
  * [[HilbertExpr]]).
  *
  * Algorithm: Skilling's transpose transform (John Skilling,
  * "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — the
  * published constant-storage N-dim form): undo the per-level frame
  * rotations ("inverse undo"), Gray-encode across dimensions, then
  * bit-interleave the transposed axes MSB-first (dimension 0 most
  * significant within each level) into one BIGINT. Properties the spec
  * pins exhaustively on small grids: BIJECTION onto [0, 2^(n·bits)) and
  * CONTINUITY (every consecutive index is Manhattan-adjacent — the
  * property that makes sorted runs jump-free, see [[HilbertExpr]]'s
  * scaladoc for why that beats Morton on stripe queries). At n = 2 the
  * Skilling curve is BIT-IDENTICAL to the classic xy2d loop
  * ([[HilbertExpr.xy2d]] — verified exhaustively in LayoutSpec), so the
  * declared `fn_hilbert` oracle and the 2-D layout writer keep their
  * existing kernel and this expression extends, never forks, the curve.
  *
  * Why an Expression: like the 2-D form, the per-level transform
  * threads STATE across dimensions (data-dependent swaps/reflections),
  * which built-in compositions can only express as bits·n chained
  * projections; here it is one precompiled static call riding whole-
  * stage codegen (the BpeEncodeExpr posture — the generated method
  * stays tiny at any n). Range contract as [[graft.core.Layout.zValueN]]:
  * caller buckets dims into [0, 2^bits), n·bits ≤ 62; `bits` must be a
  * foldable 1..31. Null in any input → NULL.
  */
case class HilbertNExpr(bits: Expression, dims: Seq[Expression])
    extends Expression with ExpectsInputTypes {

  require(dims.length >= 2, s"need at least 2 dimensions, got ${dims.length}")

  override def children: Seq[Expression] = bits +: dims
  override def inputTypes: Seq[AbstractDataType] =
    IntegerType +: Seq.fill(dims.length)(LongType: AbstractDataType)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_nd"

  override def eval(input: InternalRow): Any = {
    val b = bits.eval(input)
    if (b == null) return null
    val xs = new Array[Long](dims.length)
    var i = 0
    while (i < dims.length) {
      val v = dims(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertNExpr.axesToIndex(xs, b.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bitsGen = bits.genCode(ctx)
    val dimGens = dims.map(_.genCode(ctx))
    val xs = ctx.freshName("xs")
    val assigns = dimGens.zipWithIndex
      .map { case (g, i) => s"$xs[$i] = ${g.value};" }.mkString("\n")
    val anyNull = (bitsGen.isNull +: dimGens.map(_.isNull)).mkString(" || ")
    val childCode = dimGens.map(_.code).foldLeft(bitsGen.code)(_ + _)
    val resultCode =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          long[] $xs = new long[${dims.length}];
          $assigns
          ${ev.value} = org.apache.spark.sql.graftexpr.HilbertNExpr
            .axesToIndex($xs, ${bitsGen.value});
        }
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(bits = newChildren.head, dims = newChildren.tail)
}

object HilbertNExpr {

  /** Skilling's AxestoTranspose + the MSB-first interleave — the one
    * kernel shared by the interpreted path, the generated code (static
    * call), and the spec's exhaustive grid checks. Input is consumed as
    * a scratch copy; the caller's array is never mutated. */
  def axesToIndex(xIn: Array[Long], bits: Int): Long = {
    val n = xIn.length
    val x = xIn.clone()
    // inverse undo: peel the per-level rotations top bit down
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode across dimensions
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0L) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave the transposed axes: level-major from the top bit,
    // dimension 0 most significant within each level (Skilling's
    // "ABCDE…" transpose layout read back as one integer)
    var h = 0L
    var b = bits - 1
    while (b >= 0) {
      var d = 0
      while (d < n) { h = (h << 1) | ((x(d) >> b) & 1L); d += 1 }
      b -= 1
    }
    h
  }

  def column(bits: Column, dims: Seq[Column]): Column =
    ExpressionUtils.column(HilbertNExpr(
      ExpressionUtils.expression(bits),
      dims.map(ExpressionUtils.expression)))
}
