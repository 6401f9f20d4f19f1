package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The unigram-LM tokenizer ([[Unigram]], SURVEY B9.62): Viterbi encode
  * ≡ an INDEPENDENT driver-side DP replay (the BpeSpec discipline —
  * the kernel is only trusted because a from-scratch reimplementation of
  * its contract agrees on every corpus word), round-trip losslessness on
  * adversarial unicode, integer-count training identical at two shuffle
  * partitionings, planted-morphology recovery where whole-word
  * memorization is excluded by the length cap, and the packCorpus reuse.
  */
class UnigramSpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = graft.core.Tables.documents(spark, sfDir)
    .select("doc_id", "text").localCheckpoint()

  /** Independent Viterbi replay — same contract, separate code: logp =
    * ln(count) − ln(total); unknown single code point = −ln(total);
    * ascending-i scan with strictly-greater acceptance (longest-piece
    * tie-break); left-to-right score association. */
  private def replay(word: String,
      pieces: Seq[(String, Long)]): Seq[String] = {
    val total = pieces.map(_._2).sum
    val lnT = math.log(total.toDouble)
    val lp = pieces.map { case (p, c) =>
      p -> (math.log(c.toDouble) - lnT) }.toMap
    val unk = -lnT
    val maxLen = (1 +: pieces.map { case (p, _) =>
      p.codePointCount(0, p.length) }).max
    val offs = scala.collection.mutable.ArrayBuffer(0)
    var ci = 0
    while (ci < word.length) {
      ci += Character.charCount(word.codePointAt(ci)); offs += ci
    }
    val n = offs.length - 1
    if (n == 0) return Seq.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    best(0) = 0.0
    val from = Array.fill(n + 1)(-1)
    for (j <- 1 to n; i <- math.max(0, j - maxLen) until j
        if best(i) > Double.NegativeInfinity) {
      val piece = word.substring(offs(i), offs(j))
      val sc = lp.get(piece).map(best(i) + _)
        .orElse(if (j - i == 1) Some(best(i) + unk) else None)
      sc.foreach(s => if (s > best(j)) { best(j) = s; from(j) = i })
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var p = n
    while (p > 0) {
      out.prepend(word.substring(offs(from(p)), offs(p))); p = from(p)
    }
    out.toSeq
  }

  test("corpus encode ≡ the independent driver Viterbi replay, and " +
      "round-trips losslessly") {
    val model = Unigram.train(docs, targetMultis = 50)
    assert(model.multis <= 50 && model.multis > 0)
    val rows = Unigram.encode(docs, model)
      .select("word", "subs").distinct().collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
    assert(rows.nonEmpty)
    rows.foreach { case (w, subs) =>
      assert(subs == replay(w, model.pieces), s"word '$w'")
      assert(subs.mkString("") == w, s"round-trip of '$w'")
    }
  }

  test("adversarial unicode round-trips: surrogate pairs, combining " +
      "marks, line terminators, empty word, all-OOV word") {
    val model = Unigram.train(docs, targetMultis = 20)
    val probes = Seq(
      "𝄞𝄞clef", // surrogate pairs (𝄞)
      "étude",                  // combining acute
      "a\nb c",                  // line terminators inside a word
      "",                             // empty word (double-space token)
      "ßßß",           // chars absent from the corpus
      "mixed𝄞end")
    val got = probes.toDF("word")
      .select(col("word"), Unigram.encodeWord(col("word"), model).as("subs"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1))
    got.foreach { case (w, subs) =>
      assert(subs.mkString("") == w, s"round-trip of '$w'")
      assert(subs == replay(w, model.pieces), s"replay of '$w'")
      // surrogate pairs never split: every piece is a valid string
      subs.foreach(p => assert(!p.exists(Character.isLowSurrogate)
        || Character.isLowSurrogate(p.head) == false || p.length > 1))
    }
    assert(got.toMap.apply("").isEmpty)
  }

  test("training is partitioning-independent: identical model at 2 and " +
      "7 shuffle partitions (integer counts — the hard-EM guarantee)") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def run(parts: String): Seq[(String, Long)] = {
      spark.conf.set(key, parts)
      Unigram.train(docs, targetMultis = 30).pieces
    }
    try {
      val a = run("2")
      val b = run("7")
      assert(a == b, "trained piece inventory must not depend on partitioning")
    } finally spark.conf.set(key, prev)
  }

  test("planted morphology: 8-char compounds over the 6-point cap force " +
      "segmentation, and hard-EM recovers exactly the morpheme set") {
    // 9 morphemes of 4 chars from disjoint alphabet slices; words are
    // all 81 compounds — longer than MaxPieceLen, so whole-word
    // memorization is impossible and the likelihood optimum is the
    // morphology (the BpeVolume construction, unigram-sized)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val morphs = (0 until 9).map(m => alpha.substring(4 * m, 4 * m + 4))
    val words = for (a <- morphs; b <- morphs) yield a + b
    val corpus = spark.range(2000).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 8).map(j =>
        element_at(typedLit(words),
          (pmod(xxhash64(col("id") * 8 + j), lit(words.size)) + 1)
            .cast("int"))): _*).as("text")).localCheckpoint()

    val model = Unigram.train(corpus, targetMultis = 9)
    val multiPieces = model.pieces.map(_._1)
      .filter(p => p.codePointCount(0, p.length) > 1).toSet
    assert(multiPieces == morphs.toSet,
      s"hard-EM must keep exactly the planted morphemes, got $multiPieces")
    val segs = Unigram.encode(corpus, model)
      .select("word", "subs").distinct().collect()
    assert(segs.length == words.distinct.length)
    segs.foreach { r =>
      val w = r.getString(0)
      assert(r.getSeq[String](1) == Seq(w.substring(0, 4), w.substring(4)),
        s"$w must segment at its morpheme boundary")
    }
  }

  test("a dominant short word becomes a single piece (whole-word " +
      "memorization under the cap is correct unigram behavior)") {
    val corpus = (Seq.fill(100)("hello") ++ Seq("help", "yelp"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val model = Unigram.train(corpus, targetMultis = 4)
    val enc = Unigram.encode(corpus, model)
      .select("word", "subs").distinct().collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(enc("hello") == Seq("hello"))
    enc.foreach { case (w, subs) => assert(subs.mkString("") == w) }
  }

  test("the Viterbi kernel stays inside whole-stage codegen") {
    val model = Unigram.train(docs, targetMultis = 10)
    val df = docs.select(
      Unigram.encodeWord(split(col("text"), " ").getItem(0), model)
        .as("subs"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("unigram_encode"))
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      "kernel must not break the codegen span")
  }

  test("packCorpus reuses the BPE packing: every subword exactly once, " +
      "bins respect the size budget at doc granularity") {
    val model = Unigram.train(docs, targetMultis = 20)
    val docsWithSource = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").localCheckpoint()
    val packed = Unigram.packCorpus(docsWithSource, model, binSize = 64L)
      .localCheckpoint()
    assert(packed.count() === Unigram.totalSymbols(docsWithSource, model))
    // a document never splits across bins
    assert(packed.groupBy("doc_id")
      .agg(countDistinct("bin").as("nb"))
      .filter(col("nb") > 1).count() === 0L)
  }
}
