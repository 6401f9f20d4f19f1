package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WordPiece ([[WordPiece]]): likelihood-ratio merge selection trains the
  * planted morphology, greedy longest-match encode ≡ an independent
  * driver replay, the `[UNK]` contract fires exactly on unmatched
  * positions, encoding round-trips on in-vocabulary words, training is
  * partitioning-independent, and the kernel stays inside whole-stage
  * codegen. */
class WordPieceSpec extends SparkSpec {

  import spark.implicits._

  // planted morphology: compounds over two stems and two suffixes, plus
  // filler bigram-rich words — the suffix/stem pieces have high
  // count(xy)/(count(x)count(y)) because their parts rarely occur apart
  private lazy val docs: DataFrame = {
    val words = Seq.fill(30)("walked") ++ Seq.fill(28)("walker") ++
      Seq.fill(26)("talked") ++ Seq.fill(24)("talker") ++
      Seq.fill(8)("aa") ++ Seq.fill(6)("ab")
    val rows = words.grouped(6).zipWithIndex.map { case (ws, i) =>
      (i.toLong, "src0", ws.mkString(" "))
    }.toSeq
    rows.toDF("doc_id", "source", "text")
  }

  private def stripCont(p: String): String = p.stripPrefix(WordPiece.Cont)

  /** Independent greedy longest-match replay on the driver. */
  private def greedy(word: String, vocab: Set[String]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val maxLen = vocab.map(p => stripCont(p).codePointCount(0,
      stripCont(p).length)).maxOption.getOrElse(1)
    val cps = word.codePoints().toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < cps.length) {
      var len = math.min(maxLen, cps.length - pos)
      var hit: Option[String] = None
      while (hit.isEmpty && len >= 1) {
        val raw = new String(cps, pos, len)
        val cand = if (pos == 0) raw else WordPiece.Cont + raw
        if (vocab.contains(cand)) hit = Some(cand) else len -= 1
      }
      if (hit.isEmpty) return Seq(WordPiece.Unk)
      out += hit.get
      pos += len
    }
    out.toSeq
  }

  test("likelihood scoring: the top pair maximizes n/(cx*cy), not raw n") {
    val wf = Bpe.wordFreq(docs).withColumn("seg",
      WordPiece.charSegWp(col("word")))
    val rows = WordPiece.pairScores(wf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    rows.foreach { case (_, (n, cx, cy, score)) =>
      assert(score === n.toDouble / (cx.toDouble * cy.toDouble))
    }
    // ("a","##a") from "aa"/"ab" has high raw count relative to its
    // tiny denominators, while e.g. ("##e","##d") is frequent but its
    // symbols are everywhere — scoring must not just rank by n
    val byScore = rows.toSeq.sortBy { case ((x, y), (_, _, _, s)) =>
      (-s, x, y) }.map(_._1)
    val byN = rows.toSeq.sortBy { case ((x, y), (n, _, _, _)) =>
      (-n, x, y) }.map(_._1)
    assert(byScore.head !== byN.head,
      "planted corpus must separate the two rankings")
  }

  test("training learns the planted morphology and encode round-trips") {
    val model = WordPiece.train(docs, numMerges = 40)
    // every training word encodes losslessly (no UNK) and round-trips
    val enc = WordPiece.encode(docs, model)
      .select("word", "subs").distinct().collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    enc.foreach { case (w, subs) =>
      assert(!subs.contains(WordPiece.Unk), s"$w -> $subs")
      assert(subs.map(stripCont).mkString("") === w, s"$w -> $subs")
      assert(subs.tail.forall(_.startsWith(WordPiece.Cont)), s"$w -> $subs")
      assert(!subs.head.startsWith(WordPiece.Cont), s"$w -> $subs")
    }
    // with 40 merges over this tiny inventory the compounds memorize
    assert(enc("walked") === Seq("walked"))
  }

  test("encode == independent driver greedy replay on every corpus word") {
    val model = WordPiece.train(docs, numMerges = 12)
    val vocab = model.vocab.toSet
    val enc = WordPiece.encode(docs, model)
      .select("word", "subs").distinct().collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    enc.foreach { case (w, subs) =>
      assert(subs === greedy(w, vocab), s"kernel vs replay on '$w'")
    }
  }

  test("[UNK] fires on any unmatched position, whole-word") {
    val model = WordPiece.Model(
      Seq("a", "##a", "##b", "ab"), Seq.empty)
    val out = Seq((1L, "aab"), (2L, "az"), (3L, "za"), (4L, "aa"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        WordPiece.encodeWord(col("text"), model).as("subs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(out(1L) === Seq("a", "##a", "##b"))
    assert(out(2L) === Seq(WordPiece.Unk)) // z unmatched mid-word
    assert(out(3L) === Seq(WordPiece.Unk)) // z unmatched at start
    assert(out(4L) === Seq("a", "##a"))
  }

  test("greedy takes the LONGEST match, not the first") {
    val model = WordPiece.Model(
      Seq("w", "wa", "walk", "##e", "##ed", "##d"), Seq.empty)
    val out = Seq((1L, "walked")).toDF("doc_id", "text")
      .select(WordPiece.encodeWord(col("text"), model))
      .head().getSeq[String](0).toSeq
    assert(out === Seq("walk", "##ed"))
  }

  test("training is partitioning-independent") {
    val a = WordPiece.train(docs.repartition(2), 10)
    val b = WordPiece.train(docs.repartition(7), 10)
    assert(a.merges === b.merges)
    assert(a.vocab === b.vocab)
  }

  test("packCorpus reuses the shared packing: every subword exactly " +
      "once, in order") {
    val model = WordPiece.train(docs, 10)
    val packed = WordPiece.packCorpus(docs, model, binSize = 16)
    val streamed = packed.orderBy("doc_id", "pos", "sub_pos")
      .groupBy("doc_id").agg(collect_list("sub").as("subs"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).map(stripCont).mkString("")).toMap
    val texts = docs.collect()
      .map(r => r.getLong(0) -> r.getString(2).replace(" ", "")).toMap
    assert(streamed === texts)
  }

  test("the greedy kernel stays inside whole-stage codegen") {
    val model = WordPiece.train(docs, 5)
    val df = docs.repartition(2).select(
      WordPiece.encodeWord(split(col("text"), " ").getItem(0), model)
        .as("subs"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("wordpiece_encode"))
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      "kernel must not break the codegen span")
  }
}
