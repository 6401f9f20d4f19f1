package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_encode(word)` — BPE tokenization of one word against a FROZEN
  * merge list, as a native expression (SURVEY.md §2 B11.4; the ninth;
  * the scale kernel under [[graft.text.Bpe]]).
  *
  * The composable form ([[graft.text.Bpe.applyMerges]]) chains one
  * codegen `regexp_replace` per merge — exactly right for spec-sized
  * models, impossible for production ones: a 30k-merge vocabulary would
  * be a 30k-deep expression tree (analysis alone blows up long before
  * Janino does), and it costs O(R·|word|) regex scans per word however
  * small the word is. This expression carries the merge list OUT of the
  * expression tree (a reference object shared per task) and replays it
  * with the classic tokenizer algorithm: a min-heap of adjacent pairs
  * keyed by (merge rank, position) over a doubly-linked symbol list —
  * O(L log L) per word, independent of R.
  *
  * The heap replay EQUALS the sequential regex replay (the
  * [[graft.text.Bpe]] encode contract, BpeSpec pins bit-equality):
  *  - ranks are unique per pair — after merge r consumes every (x,y)
  *    adjacency, merges only ever concatenate, so that adjacency can
  *    never re-form;
  *  - a merge at rank r only creates pairs CONTAINING its new symbol,
  *    which can only carry ranks > r (the symbol did not exist when
  *    earlier merges were learned) — so no pop can undercut the rank
  *    order the sequential replay follows;
  *  - equal-rank occurrences pop by ascending position — the regex's
  *    left-to-right, non-overlapping order (a consumed neighbor is
  *    detected as a stale heap entry and skipped).
  *
  * Null word → NULL. Symbols are the word's code points plus the final
  * `</w>` sentinel (the charSeg contract — Java regex `.` is
  * code-point-aware, so the split here is too) — or, with
  * `byteLevel = true`, the word's UTF-8 BYTES as uppercase hex pairs
  * (the [[graft.text.ByteBpe.byteSeg]] contract: a 256-symbol initial
  * alphabet, so any byte sequence is representable and the round trip
  * is lossless without an unknown token). The heap replay itself is
  * segmentation-agnostic; only the initial symbol split differs. */
case class BpeEncodeExpr(child: Expression,
    merges: Seq[(String, String)],
    byteLevel: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val table: BpeEncodeExpr.MergeTable =
    BpeEncodeExpr.MergeTable(merges)

  override protected def nullSafeEval(w: Any): Any =
    BpeEncodeExpr.encode(w.asInstanceOf[UTF8String], table, byteLevel)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // the merge table rides as a task-shared reference object — the
    // kernel is a precompiled static call, so the whole-stage span stays
    // unbroken and the generated method stays tiny no matter how large
    // the vocabulary is
    val ref = ctx.addReferenceObj("bpeMergeTable", table,
      classOf[BpeEncodeExpr.MergeTable].getName)
    nullSafeCodeGen(ctx, ev, w => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftexpr.BpeEncodeExpr
         |  .encode($w, $ref, $byteLevel);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object BpeEncodeExpr {

  val Eow = "</w>"

  /** Injective pair key: the decimal length of `x` and a ":" delimiter
    * (no digit) pin where `x` ends, so (x, y) is recoverable from the
    * key whatever characters the symbols contain. */
  @inline private def pairKey(x: String, y: String): String =
    x.length.toString + ":" + x + y

  /** Rank map keyed by a length-prefixed concatenation
    * (`x.length + ":" + x + y`), which is injective for ANY symbol
    * contents — no reserved separator character, so even a pathological
    * corpus word containing U+0000 cannot alias two distinct pairs. */
  final case class MergeTable(merges: Seq[(String, String)])
      extends Serializable {
    @transient lazy val rank: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.size * 2)
      merges.zipWithIndex.foreach { case ((x, y), r) =>
        // first occurrence wins — ranks are unique by the no-reformation
        // argument, but a hand-built list must not silently reorder
        m.putIfAbsent(pairKey(x, y), Integer.valueOf(r))
      }
      m
    }
  }

  /** Uppercase hex pair per byte value — the byte-level initial
    * alphabet, precomputed once. */
  private val HexSym: Array[String] =
    Array.tabulate(256)(b => f"$b%02X")

  /** The heap replay. Kept allocation-lean: linked list via int arrays,
    * one heap of packed (rank, pos) longs. */
  def encode(word: UTF8String, table: MergeTable,
      byteLevel: Boolean = false): GenericArrayData = {
    // symbols: code points + sentinel (char level) or uppercase hex
    // pairs of the UTF-8 bytes + sentinel (byte level)
    val cps = new java.util.ArrayList[String](word.numBytes + 1)
    if (byteLevel) {
      val bytes = word.getBytes
      var bi = 0
      while (bi < bytes.length) {
        cps.add(HexSym(bytes(bi) & 0xFF))
        bi += 1
      }
    } else {
      val s = word.toString
      var ci = 0
      while (ci < s.length) {
        val cp = s.codePointAt(ci)
        val nc = Character.charCount(cp)
        cps.add(s.substring(ci, ci + nc))
        ci += nc
      }
    }
    cps.add(Eow)
    val n = cps.size
    val sym = new Array[String](n)
    var i = 0
    while (i < n) { sym(i) = cps.get(i); i += 1 }
    val next = Array.tabulate(n)(j => if (j + 1 < n) j + 1 else -1)
    val prev = Array.tabulate(n)(j => j - 1)
    val dead = new Array[Boolean](n)
    val rank = table.rank

    // heap of (rank, leftPos) packed into a long: rank in the high bits
    // so natural long order = (rank asc, pos asc) = the replay order
    val heap = new java.util.PriorityQueue[java.lang.Long](math.max(1, n))
    def push(left: Int): Unit = {
      val r = next(left)
      if (r >= 0) {
        val rk = rank.get(pairKey(sym(left), sym(r)))
        if (rk != null)
          heap.add(java.lang.Long.valueOf(
            (rk.longValue() << 32) | left.toLong))
      }
    }
    i = 0
    while (i < n) { push(i); i += 1 }

    while (!heap.isEmpty) {
      val packed = heap.poll().longValue()
      val rk = (packed >>> 32).toInt
      val left = (packed & 0xFFFFFFFFL).toInt
      val right = if (dead(left)) -1 else next(left)
      // stale unless the pair still exists AND still carries this rank
      // (a merged neighbor changed sym(left) or sym(right))
      if (right >= 0 && !dead(right)) {
        val cur = rank.get(pairKey(sym(left), sym(right)))
        if (cur != null && cur.intValue() == rk) {
          sym(left) = sym(left) + sym(right)
          dead(right) = true
          val rr = next(right)
          next(left) = rr
          if (rr >= 0) prev(rr) = left
          // only pairs touching the NEW symbol can newly apply — both
          // necessarily rank > rk (see scaladoc), so heap order holds
          val pl = prev(left)
          if (pl >= 0) push(pl)
          push(left)
        }
      }
    }

    val out = new java.util.ArrayList[AnyRef](n)
    var j = 0
    while (j >= 0) {
      if (!dead(j)) out.add(UTF8String.fromString(sym(j)))
      j = next(j)
    }
    new GenericArrayData(out.toArray)
  }

  def column(word: Column, merges: Seq[(String, String)],
      byteLevel: Boolean = false): Column =
    ExpressionUtils.column(BpeEncodeExpr(
      ExpressionUtils.expression(word), merges, byteLevel))
}
