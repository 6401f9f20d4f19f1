package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.Bpe

/** The `bpe_encode` kernel expression (B11.4, the ninth): bit-equality
  * with the regex-chain reference on trained models, OOV words, and
  * degenerate inputs; correctness at merge counts the chain cannot
  * express; null propagation; and the codegen plan shape. */
class BpeEncodeSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = graft.core.Tables
    .documents(spark, "/root/testdata/sf0.001")
    .select("doc_id", "text").localCheckpoint()

  private def both(words: Seq[String], m: Bpe.Model):
      (Map[String, Seq[String]], Map[String, Seq[String]]) = {
    val df = words.toDF("w").select(col("w"),
      Bpe.encodeWordChain(col("w"), m).as("chain"),
      Bpe.encodeWordKernel(col("w"), m).as("kernel"))
    val rows = df.collect()
    (rows.map(r => r.getString(0) -> r.getSeq[String](1)).toMap,
      rows.map(r => r.getString(0) -> r.getSeq[String](2)).toMap)
  }

  test("kernel ≡ regex chain on a trained model: every distinct corpus " +
      "word, plus OOV and degenerate inputs") {
    val m = Bpe.train(docs, 30)
    val corpusWords = Bpe.wordFreq(docs).select("word")
      .collect().map(_.getString(0)).toSeq
    val extra = Seq("lowest", "zzz", "a", "", "ab", "ababab",
      "aaaaaaa", "x" * 40,
      // line terminators inside a word (space-split tokens keep them):
      // the chain's DOTALL segmentation must agree with the code-point
      // kernel on every one (ADVICE r12)
      "a\nb", "\r", "line\u2028sep", "nl\n", "\n\n")
    val (chain, kernel) = both(corpusWords ++ extra, m)
    assert(chain === kernel)
  }

  test("the paper model: kernel reproduces the canonical segmentations") {
    val paper = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val m = Bpe.train(paper.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text"), 3)
    val (chain, kernel) = both(Seq("newest", "widest", "low", "lowest"), m)
    assert(chain === kernel)
    assert(kernel("newest") === Seq("n", "e", "w", "est</w>"))
    assert(kernel("lowest") === Seq("l", "o", "w", "est</w>"))
  }

  test("beyond the chain's reach: a 5000-merge synthetic model encodes " +
      "losslessly and applies its deep merges") {
    // a ladder vocabulary: merge i glues ("a"*i? no — structurally valid
    // successive merges over one letter: a+a=aa, aa+a=aaa, ... — each
    // merged symbol is buildable, ranks deep into the thousands
    val ladder = (1 until 2500).map(i => ("a" * i, "a")) ++
      (1 until 2500).map(i => ("b" * i, "b"))
    val m = Bpe.Model(ladder)
    assert(m.size === 4998)
    val words = Seq("a" * 100, "b" * 73, "a" * 7 + "b" * 9, "c")
    val got = words.toDF("w")
      .select(col("w"), Bpe.encodeWordKernel(col("w"), m).as("subs"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // round-trip always
    got.foreach { case (w, subs) =>
      assert(subs.mkString("").stripSuffix(Bpe.Eow) === w) }
    // the REPLAY semantics, hand-derived: rank 0 (a,a) pairs the run
    // left-to-right non-overlapping; the ladder's deeper rungs
    // ("aa"+a, "aaa"+a, …) only fire on an odd remainder — so an even
    // run becomes n/2 "aa" symbols, an odd one absorbs its leftover
    // into one "aaa" (the chain at this depth is unbuildable, which is
    // the kernel's reason to exist; the small-model equality gates
    // above pin that both implement the same replay)
    assert(got("a" * 100) === Seq.fill(50)("aa") :+ Bpe.Eow)
    assert(got("b" * 73) ===
      (Seq.fill(35)("bb") ++ Seq("bbb", Bpe.Eow)))
    assert(got("a" * 7 + "b" * 9) ===
      Seq("aa", "aa", "aaa", "bb", "bb", "bb", "bbb", Bpe.Eow))
    assert(got("c") === Seq("c", Bpe.Eow))
  }

  test("null propagates (and the local relation constant-folds through " +
      "the interpreted eval — proof both paths run)") {
    val m = Bpe.Model(Seq(("a", "b")))
    val df = Seq(Some("ab"), None).toDF("w")
      .select(Bpe.encodeWordKernel(col("w"), m).as("subs"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0) === Seq("ab", Bpe.Eow))
    assert(rows(1).isNullAt(0))
    // a local relation folds at plan time — that run WAS nullSafeEval
    assert(df.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
  }

  test("over a real scan the plan carries bpe_encode inside whole-stage " +
      "codegen with no lambda") {
    val m = Bpe.train(docs, 20)
    val df = docs
      .select(posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .select(Bpe.encodeWordKernel(col("w"), m).as("subs"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("lambdafunction"))
    // the `*(n)` prefix IS the whole-stage-codegen marker: the kernel
    // call must sit inside a starred span, not break it
    assert(plan.linesIterator.exists(l =>
      l.contains("bpe_encode") && l.trim.startsWith("*(")),
      s"bpe_encode must run inside a codegen span:\n$plan")
  }
}
