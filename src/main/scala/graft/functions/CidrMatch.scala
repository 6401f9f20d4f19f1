package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftexpr.{CidrMatchExpr, SortedIntersectSizeExpr}

/** Public wiring for the custom `cidr_match` Catalyst expression
  * ([[org.apache.spark.sql.graftexpr.CidrMatchExpr]]): Column DSL, SQL
  * registration into an existing session, and a SparkSessionExtensions
  * class for deployment-wide injection. */
object CidrMatch {

  /** Column-DSL form: `df.filter(cidr_match($"ip", lit(net), lit(8)))`. */
  def cidr_match(ip: Column, net: Column, prefix: Column): Column =
    CidrMatchExpr.column(ip, net, prefix)

  private def info =
    new ExpressionInfo(classOf[CidrMatchExpr].getName, "cidr_match")

  private def builder(exprs: Seq[Expression]): Expression =
    CidrMatchExpr(exprs(0), exprs(1), exprs(2))

  /** Register `cidr_match` for SQL in an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cidr_match"), info, builder _)
}

/** Public wiring for `sorted_intersect_size` — the merge-scan intersection
  * cardinality over sorted long arrays used by the similarity-join hot
  * path ([[org.apache.spark.sql.graftexpr.SortedIntersectSizeExpr]]). */
object SortedIntersect {

  /** PRECONDITION carried into `DESCRIBE FUNCTION` so ad-hoc SQL callers
    * see the contract, not just Scala readers of the scaladoc: unsorted or
    * null-element inputs silently undercount (the merge scan never errors). */
  private[functions] val usage: String =
    "_FUNC_(a, b) - Returns |A ∩ B| for two ARRAY<BIGINT> inputs via a " +
      "single merge scan. PRECONDITION: both arrays must be ascending-sorted " +
      "with non-null elements (sort with array_sort at encode time); on " +
      "unsorted or null-element input the result silently undercounts. " +
      "Duplicate elements count once (set semantics)."

  private[functions] def info =
    new ExpressionInfo(classOf[SortedIntersectSizeExpr].getName, null,
      "sorted_intersect_size", usage, "")

  /** Column-DSL form: `sorted_intersect_size($"toks_a", $"toks_b")`. */
  def sorted_intersect_size(a: Column, b: Column): Column =
    SortedIntersectSizeExpr.column(a, b)

  /** Register `sorted_intersect_size` for SQL in an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("sorted_intersect_size"), info,
      (exprs: Seq[Expression]) => SortedIntersectSizeExpr(exprs(0), exprs(1)))
}

/** Public wiring for `nfc_normalize` — UAX #15 canonical composition, the
  * pre-hash text normalization step
  * ([[org.apache.spark.sql.graftexpr.NfcNormalizeExpr]]). */
object TextNorm {
  import org.apache.spark.sql.graftexpr.NfcNormalizeExpr

  private[functions] def info =
    new ExpressionInfo(classOf[NfcNormalizeExpr].getName, null,
      "nfc_normalize",
      "_FUNC_(s) - Returns s in Unicode Normalization Form C (canonical " +
        "composition). ASCII input is returned unchanged without copying. " +
        "Normalize before hashing: dedup digests, line hashes, and " +
        "decontamination grams treat NFC-distinct spellings of the same " +
        "rendered text as different documents otherwise.", "")

  /** Column-DSL form: `nfc_normalize($"text")`. */
  def nfc_normalize(s: Column): Column = NfcNormalizeExpr.column(s)

  /** Register `nfc_normalize` for SQL in an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("nfc_normalize"), info,
      (exprs: Seq[Expression]) => NfcNormalizeExpr(exprs(0)))
}

/** Public wiring for `porter_stem` — the Porter 1980 suffix stripper,
  * the lexical-retrieval recall lever
  * ([[org.apache.spark.sql.graftexpr.PorterStemExpr]]). */
object PorterStem {
  import org.apache.spark.sql.graftexpr.PorterStemExpr

  private[functions] def info =
    new ExpressionInfo(classOf[PorterStemExpr].getName, null,
      "porter_stem",
      "_FUNC_(word) - Returns the Porter (1980) stem of an English word. " +
        "ASCII uppercase is folded first; words of length <= 2 or " +
        "containing any non-ASCII-letter character are returned " +
        "unchanged (numbers, URLs, and non-English scripts should not " +
        "have English suffixes stripped).", "")

  /** Column-DSL form: `porter_stem($"term")`. */
  def porter_stem(s: Column): Column = PorterStemExpr.column(s)

  /** Register `porter_stem` for SQL in an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("porter_stem"), info,
      (exprs: Seq[Expression]) => PorterStemExpr(exprs(0)))
}

/** Session extension — `.withExtensions(new GraftExtensions)` or config
  * `spark.sql.extensions=graft.functions.GraftExtensions` wires the custom
  * function surface into every session of a deployment. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("cidr_match"),
      new ExpressionInfo(classOf[CidrMatchExpr].getName, "cidr_match"),
      (exprs: Seq[Expression]) => CidrMatchExpr(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((FunctionIdentifier("sorted_intersect_size"),
      SortedIntersect.info,
      (exprs: Seq[Expression]) => SortedIntersectSizeExpr(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("nfc_normalize"), TextNorm.info,
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.graftexpr.NfcNormalizeExpr(exprs(0))))
    e.injectFunction((FunctionIdentifier("porter_stem"), PorterStem.info,
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.graftexpr.PorterStemExpr(exprs(0))))
  }
}

/** Public wiring for the edit-distance-join prefilter pair
  * ([[org.apache.spark.sql.graftexpr.CharHistExpr]] +
  * [[org.apache.spark.sql.graftexpr.L1DiffExpr]]): per-row char histograms
  * whose L1 distance lower-bounds levenshtein (ed ≥ l1/2). */
object CharHist {
  import org.apache.spark.sql.graftexpr.{CharHistExpr, L1DiffExpr}

  def char_hist(s: Column): Column = CharHistExpr.column(s)
  def l1_diff(a: Column, b: Column): Column = L1DiffExpr.column(a, b)

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("char_hist"),
      new ExpressionInfo(classOf[CharHistExpr].getName, "char_hist"),
      (exprs: Seq[Expression]) => CharHistExpr(exprs(0)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("l1_diff"),
      new ExpressionInfo(classOf[L1DiffExpr].getName, null, "l1_diff",
        "_FUNC_(a, b) - Returns sum(|a_i - b_i|) over two equal-length " +
          "ARRAY<INT> inputs (Int.MaxValue if lengths differ). Any null " +
          "array element propagates NULL rather than being read as 0.", ""),
      (exprs: Seq[Expression]) => L1DiffExpr(exprs(0), exprs(1)))
  }
}
