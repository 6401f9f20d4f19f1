package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Porter 1980 stemmer ([[org.apache.spark.sql.graftexpr.PorterStemExpr]],
  * B11.4 #17) — gated on the paper's own worked examples (every step's
  * published input→output pairs plus the two famous full chains), the
  * pass-through contract, and codegen ≡ interpreted ≡ driver equality.
  * TEST-gated per SURVEY §7.5.7: DuckDB's `stem()` needs the fts
  * extension, unavailable offline. */
class PorterStemSpec extends SparkSpec {

  import org.apache.spark.sql.graftexpr.PorterStemExpr

  private def s(w: String): String = {
    val r = PorterStemExpr.stem(w)
    if (r == null) w else r
  }

  // the paper's step-by-step examples (Porter 1980, §the algorithm)
  private val vectors = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b + cleanup
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc",
    "hesitanci" -> "hesit", "digitizer" -> "digit",
    "conformabli" -> "conform", "radicalli" -> "radic",
    "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper",
    "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit",
    "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form",
    "formalize" -> "formal", "electriciti" -> "electr",
    "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens",
    "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend",
    "adoption" -> "adopt", "communism" -> "commun",
    "activate" -> "activ", "angulariti" -> "angular",
    "homologous" -> "homolog", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll",
    // the famous full chains
    "generalizations" -> "gener", "oscillators" -> "oscil")

  test("the paper's worked examples stem exactly") {
    val bad = vectors.filter { case (in, want) => s(in) != want }
    assert(bad.isEmpty, bad.map { case (in, want) =>
      s"$in: got ${s(in)}, want $want" }.mkString(", "))
  }

  test("pass-through contract: short words, non-letters, case folding") {
    assert(s("by") === "by" && s("a") === "a")
    assert(s("x86") === "x86", "digits pass through")
    assert(s("don't") === "don't", "punctuation passes through")
    assert(s("café") === "café", "non-ASCII passes through")
    assert(s("Relational".toLowerCase) === s("relational"))
    assert(PorterStemExpr.stem("RELATIONAL") === "relat",
      "uppercase folds before stemming")
  }

  test("idempotence over the fixture vocabulary: stem(stem(w)) == stem(w)") {
    // not a theorem for arbitrary English, but it must hold on the real
    // corpus vocabulary the lexical index stems (double-stemming an
    // index rebuild must not shift postings)
    val vocab = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0))
    val drift = vocab.filter(w => s(s(w)) != s(w))
    assert(drift.isEmpty,
      s"re-stemming drifts: ${drift.take(5).mkString(", ")}")
  }

  test("codegen path == driver function over the corpus vocabulary") {
    val df = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("w")).distinct()
      .select(col("w"), PorterStem.porter_stem(col("w")).as("st"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    rows.foreach { case (w, st) =>
      assert(st === s(w), s"codegen vs driver for '$w'")
    }
    // and the expression runs inside a whole-stage-codegen span (a plain
    // projection — the distinct form above collapses the stem into the
    // aggregate's output list, which the plan string doesn't spell out)
    val proj = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("w"))
      .select(PorterStem.porter_stem(col("w")).as("st"))
    proj.collect()
    val plan = proj.queryExecution.executedPlan.toString
    assert(plan.contains("porter_stem") &&
      (plan.contains("WholeStageCodegen") || plan.contains("*(")), plan)
  }
}
