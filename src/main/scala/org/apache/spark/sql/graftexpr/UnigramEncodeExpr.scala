package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `unigram_encode(word)` — Viterbi segmentation of one word under a
  * FROZEN unigram-LM piece table (SURVEY.md §2 B11.4; the scale kernel
  * under [[graft.text.Unigram]] — the SentencePiece-family tokenizer,
  * Kudo 2018).
  *
  * The piece table rides OUT of the expression tree as a task-shared
  * reference object (the [[BpeEncodeExpr]] arrangement), so the generated
  * code is one static call whatever the vocabulary size and the
  * whole-stage span stays unbroken.
  *
  * Segmentation = the max-log-probability path through the lattice of
  * known pieces, left-to-right DP over CODE POINTS (surrogate pairs are
  * one position — the charSeg contract):
  *
  *   best(j) = max over i in [j − maxLen, j):  best(i) + logp(s[i, j))
  *
  * with logp(piece) = ln(count) − ln(total) from the model's BIGINT
  * counts, and an UNKNOWN-CHARACTER fallback: a single code point absent
  * from the table scores ln(1) − ln(total) (a virtual count of one), so
  * EVERY word has a path and encoding is total + lossless — the
  * open-vocabulary property (multi-char pieces have no fallback).
  *
  * DETERMINISTIC TIE-BREAK: candidates are scanned at ascending i and a
  * candidate replaces the incumbent only when STRICTLY greater — so on
  * equal score the smallest i (the LONGEST final piece) wins, at every
  * position, recursively. The score sum is evaluated left-to-right along
  * the word (one fixed IEEE association), so the segmentation is a pure
  * function of (word, model) — UnigramSpec replays the DP independently
  * on the driver and pins equality.
  *
  * Null word → NULL; empty word → empty array. */
case class UnigramEncodeExpr(child: Expression,
    pieces: Seq[(String, Long)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "unigram_encode"

  @transient private lazy val table: UnigramEncodeExpr.PieceTable =
    UnigramEncodeExpr.PieceTable(pieces)

  override protected def nullSafeEval(w: Any): Any =
    UnigramEncodeExpr.encode(w.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramPieceTable", table,
      classOf[UnigramEncodeExpr.PieceTable].getName)
    nullSafeCodeGen(ctx, ev, w => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftexpr.UnigramEncodeExpr
         |  .encode($w, $ref);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object UnigramEncodeExpr {

  /** Frozen model: log-probabilities from the training counts, the
    * unknown-single-char fallback, and the DP window (max piece length
    * in CODE POINTS). */
  final case class PieceTable(pieces: Seq[(String, Long)])
      extends Serializable {
    @transient lazy val (logp, unkLogp, maxLen):
        (java.util.HashMap[String, java.lang.Double], Double, Int) = {
      var total = 0L
      pieces.foreach { case (_, c) =>
        require(c > 0L, "piece counts must be positive"); total += c }
      val lnT = math.log(total.toDouble)
      val m = new java.util.HashMap[String, java.lang.Double](
        pieces.size * 2)
      var ml = 1
      pieces.foreach { case (p, c) =>
        m.put(p, java.lang.Double.valueOf(math.log(c.toDouble) - lnT))
        val cp = p.codePointCount(0, p.length)
        if (cp > ml) ml = cp
      }
      (m, -lnT, ml)
    }
  }

  /** The Viterbi DP (see the case-class scaladoc for the contract). */
  def encode(word: UTF8String, table: PieceTable): GenericArrayData = {
    val s = word.toString
    // code-point boundaries: off(k) = code-unit offset of code point k
    val offBuf = new java.util.ArrayList[Integer](s.length + 1)
    var ci = 0
    offBuf.add(Integer.valueOf(0))
    while (ci < s.length) {
      ci += Character.charCount(s.codePointAt(ci))
      offBuf.add(Integer.valueOf(ci))
    }
    val n = offBuf.size - 1 // code points
    if (n == 0) return new GenericArrayData(new Array[AnyRef](0))
    val off = new Array[Int](n + 1)
    var k = 0
    while (k <= n) { off(k) = offBuf.get(k).intValue(); k += 1 }

    val logp = table.logp
    val maxLen = table.maxLen
    val best = new Array[Double](n + 1)
    val from = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      best(j) = Double.NegativeInfinity
      from(j) = -1
      var i = math.max(0, j - maxLen)
      // ascending i + strictly-greater acceptance = longest-piece
      // tie-break (the scaladoc contract)
      while (i < j) {
        if (best(i) > Double.NegativeInfinity) {
          val piece = s.substring(off(i), off(j))
          val lp = logp.get(piece)
          val sc =
            if (lp != null) best(i) + lp.doubleValue()
            else if (j - i == 1) best(i) + table.unkLogp
            else Double.NegativeInfinity
          if (sc > best(j)) { best(j) = sc; from(j) = i }
        }
        i += 1
      }
      j += 1
    }
    // n ≥ 1 and single chars always score (fallback) → a path exists
    val rev = new java.util.ArrayList[AnyRef](n)
    var p = n
    while (p > 0) {
      rev.add(UTF8String.fromString(s.substring(off(from(p)), off(p))))
      p = from(p)
    }
    val out = new Array[AnyRef](rev.size)
    var o = 0
    while (o < rev.size) { out(o) = rev.get(rev.size - 1 - o); o += 1 }
    new GenericArrayData(out)
  }

  def column(word: Column, pieces: Seq[(String, Long)]): Column =
    ExpressionUtils.column(UnigramEncodeExpr(
      ExpressionUtils.expression(word), pieces))
}
