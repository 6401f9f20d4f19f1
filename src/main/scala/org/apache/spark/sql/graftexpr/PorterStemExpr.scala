package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `porter_stem(word)` — the Porter stemming algorithm (Porter 1980, "An
  * algorithm for suffix stripping", Program 14(3); the ORIGINAL published
  * definition, not the later Snowball/"Porter2" revision) as a native
  * codegen'd expression (SURVEY.md §2 B11.4 #17).
  *
  * Why a kernel: stemming conflates morphological variants ("relational",
  * "relations", "relate" → one postings row), the standard recall lever
  * for lexical retrieval — but Spark ships no stemmer, the zero-UDF policy
  * (OPERATORS.md B11.1) rules out a closure, and the algorithm is a
  * measure-conditioned suffix rewrite machine no built-in composition can
  * express. TEST-gated per SURVEY §7.5.7: DuckDB's `stem()` lives in the
  * fts extension, which cannot load in this zero-egress environment, so
  * the gate is the paper's own worked examples plus invariants
  * (PorterStemSpec), not a cross-engine hash.
  *
  * Contract: words of length ≤ 2 pass through; any word containing a
  * non-ASCII-letter character passes through unchanged (stemming English
  * suffixes off numbers, URLs, or CJK text only corrupts them — the
  * conservative production default); ASCII uppercase is folded first so a
  * raw caller cannot split one term into two postings rows.
  */
case class PorterStemExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "porter_stem"

  override protected def nullSafeEval(s: Any): Any =
    PorterStemExpr.stemUtf8(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.PorterStemExpr.stemUtf8($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PorterStemExpr {

  def stemUtf8(s: UTF8String): UTF8String = {
    val out = stem(s.toString)
    if (out == null) s else UTF8String.fromString(out)
  }

  /** The algorithm as published (steps 1a–5b over the measure grammar
    * [C](VC)^m[V]); the loop structure mirrors the paper's reference
    * implementation. Returns null when the input passes through unchanged
    * so the UTF8String caller avoids re-encoding. */
  def stem(word: String): String = {
    if (word.length <= 2) return null
    var needsLower = false
    var p = 0
    while (p < word.length) {
      val c = word.charAt(p)
      if (c >= 'A' && c <= 'Z') needsLower = true
      else if (c < 'a' || c > 'z') return null
      p += 1
    }
    val src = if (needsLower) word.toLowerCase else word
    // +1 head room: step 1b can append an 'e' ("hoping" → "hope")
    val b = java.util.Arrays.copyOf(src.toCharArray, src.length + 1)
    var k = src.length - 1 // last index in play
    var j = 0              // stem end set by ends()

    def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    /** measure of b[0..j]: the m in [C](VC)^m[V]. */
    def m(): Int = {
      var n = 0; var i = 0
      while (i <= j && cons(i)) i += 1 // leading consonants
      if (i > j) return 0
      i += 1
      while (true) {
        while (i <= j && !cons(i)) i += 1 // vowels
        if (i > j) return n
        i += 1; n += 1
        while (i <= j && cons(i)) i += 1 // consonants
        if (i > j) return n
        i += 1
      }
      n
    }

    def vowelInStem(): Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }

    def doubleC(i: Int): Boolean = i >= 1 && b(i) == b(i - 1) && cons(i)

    /** *o: cvc ending at i, final consonant not w/x/y. */
    def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) return false
      val ch = b(i); ch != 'w' && ch != 'x' && ch != 'y'
    }

    def ends(s: String): Boolean = {
      val l = s.length
      if (l > k + 1) return false
      var i = 0
      while (i < l) {
        if (b(k - l + 1 + i) != s.charAt(i)) return false
        i += 1
      }
      j = k - l
      true
    }

    /** rewrite the suffix after j to s (buffer has the head room). */
    def setTo(s: String): Unit = {
      var i = 0
      while (i < s.length) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + s.length
    }

    /** conditional rewrite used by steps 2–3 (fires at m > 0). */
    def pair(suffix: String, to: String): Boolean =
      if (ends(suffix)) { if (m() > 0) setTo(to); true } else false

    // ---- step 1a: plurals
    if (b(k) == 's') {
      if (ends("sses")) k -= 2
      else if (ends("ies")) setTo("i")
      else if (b(k - 1) != 's') k -= 1
    }

    // ---- step 1b: -eed / -ed / -ing (+ the cleanup rewrites)
    if (ends("eed")) {
      if (m() > 0) k -= 1
    } else if ((ends("ed") || ends("ing")) && vowelInStem()) {
      k = j
      if (ends("at")) setTo("ate")
      else if (ends("bl")) setTo("ble")
      else if (ends("iz")) setTo("ize")
      else if (doubleC(k)) {
        val ch = b(k)
        if (ch != 'l' && ch != 's' && ch != 'z') k -= 1
      } else {
        j = k
        if (m() == 1 && cvc(k)) setTo("e")
      }
    }

    // ---- step 1c: y → i when the stem has a vowel
    if (ends("y") && vowelInStem()) b(k) = 'i'

    // ---- step 2 (m > 0), keyed on the second-to-last letter
    if (k >= 1) b(k - 1) match {
      case 'a' => pair("ational", "ate") || pair("tional", "tion")
      case 'c' => pair("enci", "ence") || pair("anci", "ance")
      case 'e' => pair("izer", "ize")
      case 'l' => pair("abli", "able") || pair("alli", "al") ||
        pair("entli", "ent") || pair("eli", "e") || pair("ousli", "ous")
      case 'o' => pair("ization", "ize") || pair("ation", "ate") ||
        pair("ator", "ate")
      case 's' => pair("alism", "al") || pair("iveness", "ive") ||
        pair("fulness", "ful") || pair("ousness", "ous")
      case 't' => pair("aliti", "al") || pair("iviti", "ive") ||
        pair("biliti", "ble")
      case _ => false
    }

    // ---- step 3 (m > 0), keyed on the last letter
    b(k) match {
      case 'e' => pair("icate", "ic") || pair("ative", "") ||
        pair("alize", "al")
      case 'i' => pair("iciti", "ic")
      case 'l' => pair("ical", "ic") || pair("ful", "")
      case 's' => pair("ness", "")
      case _ => false
    }

    // ---- step 4: bare suffixes drop at m > 1
    def gone(suffix: String): Boolean =
      if (ends(suffix)) { if (m() > 1) k = j; true } else false
    if (k >= 1) b(k - 1) match {
      case 'a' => gone("al")
      case 'c' => gone("ance") || gone("ence")
      case 'e' => gone("er")
      case 'i' => gone("ic")
      case 'l' => gone("able") || gone("ible")
      case 'n' => gone("ant") || gone("ement") || gone("ment") ||
        gone("ent")
      case 'o' =>
        if (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) {
          if (m() > 1) k = j; true
        } else gone("ou")
      case 's' => gone("ism")
      case 't' => gone("ate") || gone("iti")
      case 'u' => gone("ous")
      case 'v' => gone("ive")
      case 'z' => gone("ize")
      case _ => false
    }

    // ---- step 5a: drop final e at m > 1, or at m == 1 unless *o
    j = k
    if (b(k) == 'e') {
      val a = m()
      if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
    }
    // ---- step 5b: -ll → -l at m > 1
    j = k
    if (b(k) == 'l' && doubleC(k) && m() > 1) k -= 1

    val res = new String(b, 0, k + 1)
    if (res == word) null else res
  }

  /** Column↔Expression bridge for the public API (both are private[sql]). */
  def column(s: Column): Column =
    ExpressionUtils.column(PorterStemExpr(ExpressionUtils.expression(s)))
}
