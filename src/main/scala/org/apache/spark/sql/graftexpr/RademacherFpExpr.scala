package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** `rademacher_fp(v)` — the 63-bit hyperplane-LSH fingerprint of a
  * double-array in ONE codegen'd kernel (SURVEY.md §2 B11.4; the
  * fourteenth; the scale kernel under [[graft.sim.EmbedFp]]).
  *
  * The composable form (63 × `when(dot_f64(v, plane_j) >= 0, 1<<j)`
  * bitwiseOR-folded) is semantically right and spec-kept as the
  * reference, but it is 63 expression subtrees of depth ~3 OR-folded 63
  * deep — measured to knock the whole projection out of whole-stage
  * codegen and onto the interpreted path (2.3k vecs/s at 64 dims; this
  * kernel runs the same arithmetic at ~1000×). The plane matrix rides
  * OUT of the expression tree as a task-shared reference object (the
  * [[BpeEncodeExpr]] arrangement), so the generated method is one static
  * call and the whole-stage span stays unbroken at any plane count.
  *
  * Bit-compatibility is load-bearing (the [[graft.sim.EmbedFp]] oracle
  * contract): per plane the sum accumulates LEFT-TO-RIGHT from 0.0 over
  * v[d]·sign[d] — the IDENTICAL IEEE sequence as [[DotProductExpr]]
  * against the same plane and as DuckDB's `list_reduce` fold — so every
  * sign bit, and hence the fingerprint, is bit-identical to the composed
  * form and to the oracle. Ties (sum == 0) take the + branch, the
  * [[graft.sim.Bq]] sign convention.
  *
  * Edge semantics: null input → NULL (UnaryExpression default); a
  * length mismatch with the plane dimension or any null element → NULL
  * (the [[DotProductExpr]] convention — STRICTER than the composed form,
  * whose `when(...).otherwise(0)` absorbs a null dot into a 0 bit; on
  * null-free uniform-dim data, i.e. every declared input, the two are
  * bit-identical, and EmbedFpSpec pins exactly that). */
case class RademacherFpExpr(child: Expression, signs: Seq[Seq[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  require(signs.nonEmpty && signs.forall(_.length == signs.head.length),
    "plane matrix must be rectangular")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rademacher_fp"

  @transient private lazy val planes: RademacherFpExpr.Planes =
    RademacherFpExpr.Planes(signs.flatten.toArray, signs.head.length,
      signs.length)

  override protected def nullSafeEval(v: Any): Any =
    RademacherFpExpr.fp(v.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rademacherPlanes", planes,
      classOf[RademacherFpExpr.Planes].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = org.apache.spark.sql.graftexpr.RademacherFpExpr
         |  .fp($v, $ref);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $r).longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object RademacherFpExpr {

  /** Flattened plane matrix: `flat(j * dim + d)` = ±1.0 sign of plane j,
    * dimension d. One immutable object shared by every task. */
  final case class Planes(flat: Array[Double], dim: Int, nPlanes: Int)

  /** The kernel: bit j = [Σ_d v(d)·sign(j,d) ≥ 0], summed left-to-right
    * from 0.0 per plane. Null on length mismatch or any null element. */
  def fp(v: ArrayData, p: Planes): Any = {
    val n = v.numElements()
    if (n != p.dim) return null
    var d = 0
    while (d < n) { // one null scan up front; planes then read cleanly
      if (v.isNullAt(d)) return null
      d += 1
    }
    var bits = 0L
    var j = 0
    while (j < p.nPlanes) {
      var s = 0.0
      val base = j * p.dim
      d = 0
      while (d < n) {
        s += v.getDouble(d) * p.flat(base + d)
        d += 1
      }
      if (s >= 0) bits |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(bits)
  }

  def column(v: Column, signs: Seq[Seq[Double]]): Column =
    ExpressionUtils.column(
      RademacherFpExpr(ExpressionUtils.expression(v), signs))
}
