package org.apache.spark.sql.graftexpr

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(s)` — Unicode canonical composition (NFC) as a native
  * expression (SURVEY.md §2 B11.4). The text-pipeline normalization step
  * every hash-keyed stage assumes: two strings that render identically
  * ("é" as U+00E9 vs "e"+U+0301) must produce the SAME dedup digest,
  * line-hash, decontamination gram, and MinHash shingle, or visually
  * duplicate text silently survives every exact stage. CCNet/Dolma-style
  * pipelines NFC-normalize before hashing for exactly this reason.
  *
  * Spark ships no normalization builtin (the 4.x collation work keys
  * comparisons, not values), and the zero-UDF policy (OPERATORS.md B11.1)
  * rules out a closure, so this is the canonical B11.4 shape: a
  * `UnaryExpression` whose generated code stays inside the whole-stage
  * span. The kernel delegates to `java.text.Normalizer` (ICU-equivalent
  * canonical composition; DuckDB's `nfc_normalize` is utf8proc — both
  * implement UAX #15, which is what makes the oracle hash-match possible)
  * behind an `isFullAscii` fast path: ASCII is NFC-invariant, so the
  * dominant corpus case returns the input UTF8String untouched — zero
  * allocation, no String round-trip.
  */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalizeExpr.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.NfcNormalizeExpr.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** UAX #15 NFC; ASCII short-circuits (NFC-invariant) without allocating. */
  def normalize(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column↔Expression bridge for the public API (both are private[sql]). */
  def column(s: Column): Column =
    ExpressionUtils.column(NfcNormalizeExpr(ExpressionUtils.expression(s)))
}
