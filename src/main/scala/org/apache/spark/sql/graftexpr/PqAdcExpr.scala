package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** `pq_adc(codes, lut)` — asymmetric-distance (ADC) scoring for
  * product-quantized vectors (SURVEY.md §2 B11.4; the scan kernel of the
  * PQ index, [[graft.sim.Pq]]).
  *
  * `codes` is a vector's M sub-quantizer code words; `lut` is the query's
  * per-subspace lookup table flattened row-major with stride W =
  * lut.length / M: lut[m*W + c] = ⟨query_m, codebook_m[c]⟩. The score
  * Σ_m lut[m*W + codes[m]] equals the dot product of the query with the
  * RECONSTRUCTED (decoded) vector — without ever materializing the
  * reconstruction: M array reads per row instead of d multiplications.
  * That asymmetry is the PQ trade: the corpus is stored as M small ints
  * (d·4 bytes → M bytes of code), the query stays exact.
  *
  * The composable form — `aggregate(zip_with(codes, sequence(...), ...))`
  * — is a CodegenFallback HOF pair allocating an index array per row; this
  * is the same arithmetic as one generated loop, accumulating
  * left-to-right from 0.0 like [[DotProductExpr]]. Edge semantics: null
  * array or element → NULL; lut not divisible by M, or a code outside
  * [0, W) → NULL (a corrupted code must surface, not read a neighbor's
  * table row).
  */
case class PqAdcExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0 || lut.numElements() % m != 0) return null
    val w = lut.numElements() / m
    var s = 0.0
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val c = codes.getInt(i)
      if (c < 0 || c >= w || lut.isNullAt(i * w + c)) return null
      s += lut.getDouble(i * w + c)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val m = ctx.freshName("m")
      val w = ctx.freshName("w"); val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      s"""
         |int $m = $a.numElements();
         |if ($m == 0 || $b.numElements() % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $w = $b.numElements() / $m;
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    int $c = $a.getInt($i);
         |    if ($c < 0 || $c >= $w || $b.isNullAt($i * $w + $c)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $s += $b.getDouble($i * $w + $c);
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
object PqAdcExpr {
  def column(codes: Column, lut: Column): Column =
    ExpressionUtils.column(PqAdcExpr(
      ExpressionUtils.expression(codes),
      ExpressionUtils.expression(lut)))
}
