package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `wordpiece_encode(word)` — greedy longest-match-first segmentation of
  * one word under a FROZEN WordPiece vocabulary (SURVEY.md §2 B11.4; the
  * scale kernel under [[graft.text.WordPiece]] — the BERT tokenizer's
  * published inference algorithm, Devlin et al. 2019 / the
  * tensorflow-text reference).
  *
  * The vocabulary rides OUT of the expression tree as a task-shared
  * reference object (the [[BpeEncodeExpr]] arrangement), so the generated
  * code is one static call whatever the vocabulary size.
  *
  * Algorithm (deterministic by construction — no scores, no ties): at
  * each position take the LONGEST vocabulary piece that matches,
  * continuation positions matching with the `##` prefix; if NO piece
  * matches at some position the WHOLE word becomes `[UNK]` (the BERT
  * word-level-unk contract — deliberately different from
  * [[UnigramEncodeExpr]]'s single-char fallback, which keeps unigram
  * encoding lossless; WordPiece is lossy exactly on unk words and
  * [[graft.text.WordPieceSpec]] pins exactly when). Positions are CODE
  * POINTS (surrogate pairs are one position — the charSeg contract).
  *
  * Null word → NULL; empty word → empty array. */
case class WordPieceEncodeExpr(child: Expression,
    vocab: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "wordpiece_encode"

  @transient private lazy val table: WordPieceEncodeExpr.Vocab =
    WordPieceEncodeExpr.Vocab(vocab)

  override protected def nullSafeEval(w: Any): Any =
    WordPieceEncodeExpr.encode(w.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceVocab", table,
      classOf[WordPieceEncodeExpr.Vocab].getName)
    nullSafeCodeGen(ctx, ev, w => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftexpr.WordPieceEncodeExpr
         |  .encode($w, $ref);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object WordPieceEncodeExpr {

  val Unk = "[UNK]"
  val Cont = "##"

  /** Frozen vocabulary: the piece set plus the longest CONTENT length
    * (code points, `##` prefix excluded) bounding the match window. */
  final case class Vocab(pieces: Seq[String]) extends Serializable {
    @transient lazy val (set, maxLen): (java.util.HashSet[String], Int) = {
      val s = new java.util.HashSet[String](pieces.size * 2)
      var ml = 1
      pieces.foreach { p =>
        s.add(p)
        val content = if (p.startsWith(Cont)) p.substring(Cont.length) else p
        val cp = content.codePointCount(0, content.length)
        if (cp > ml) ml = cp
      }
      (s, ml)
    }
  }

  /** Greedy longest-match (see the case-class scaladoc). */
  def encode(word: UTF8String, table: Vocab): GenericArrayData = {
    val s = word.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    // code-point boundaries: off(k) = code-unit offset of code point k
    val nCp = s.codePointCount(0, s.length)
    val off = new Array[Int](nCp + 1)
    var k = 0; var u = 0
    while (k < nCp) { off(k) = u; u = s.offsetByCodePoints(u, 1); k += 1 }
    off(nCp) = s.length

    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < nCp) {
      var len = math.min(table.maxLen, nCp - pos)
      var hit: String = null
      while (hit == null && len >= 1) {
        val raw = s.substring(off(pos), off(pos + len))
        val cand = if (pos == 0) raw else Cont + raw
        if (table.set.contains(cand)) hit = cand else len -= 1
      }
      if (hit == null)
        return new GenericArrayData(
          Array[Any](UTF8String.fromString(Unk)))
      out += UTF8String.fromString(hit)
      pos += len
    }
    new GenericArrayData(out.toArray)
  }

  def column(word: Column, vocab: Seq[String]): Column =
    ExpressionUtils.column(
      WordPieceEncodeExpr(ExpressionUtils.expression(word), vocab))
}
