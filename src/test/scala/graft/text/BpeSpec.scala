package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BPE subword tokenizer ([[Bpe]]): the paper's canonical merges
  * reproduce, encode replays training exactly, round-trip losslessness,
  * compression monotone in merge count, OOV segmentation, training
  * determinism across partitionings, and the corpus encode's broadcast
  * plan shape. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** The Sennrich et al. 2016 running example: {low·5, lower·2, newest·6,
    * widest·3} — the corpus every BPE description derives its first
    * merges from. */
  private lazy val paperCorpus: DataFrame = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    // one word per doc — word frequencies are what matter
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  private lazy val docs = graft.core.Tables.documents(spark, sfDir)
    .select("doc_id", "text").localCheckpoint()

  test("the paper's canonical first merges: (e,s) then (es,t) then " +
      "(est,</w>) — max count 9, ties broken lexicographically") {
    val m = Bpe.train(paperCorpus, 3)
    assert(m.merges === Seq(("e", "s"), ("es", "t"), ("est", "</w>")))
    // and the segmentations after those merges match the paper's walk
    val seg = Bpe.trainedSeg(paperCorpus, m).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(seg("newest") === "n e w est</w>")
    assert(seg("widest") === "w i d est</w>")
    assert(seg("low") === "l o w </w>")
  }

  test("encode REPLAYS training: for every training word the encoder's " +
      "segmentation equals the final training-state segmentation") {
    val m = Bpe.train(docs, 30)
    assert(m.size === 30, "corpus is rich enough for 30 merges")
    val trained = Bpe.trainedSeg(docs, m)
      .select(col("word"), col("seg"))
    val encoded = trained.select(col("word"),
      concat_ws(" ", Bpe.encodeWord(col("word"), m)).as("enc"))
    val diverged = trained.join(encoded, "word")
      .filter(col("seg") =!= col("enc"))
    assert(diverged.count() === 0,
      s"encode != training state: ${diverged.take(5).mkString("; ")}")
  }

  test("round-trip: subwords concatenate back to the word + sentinel, " +
      "for every word occurrence in the corpus") {
    val m = Bpe.train(docs, 20)
    val bad = Bpe.encode(docs, m)
      .withColumn("back",
        regexp_replace(concat_ws("", col("subs")), "</w>$", ""))
      .filter(col("back") =!= col("word"))
    assert(bad.count() === 0, s"lossy encode: ${bad.take(5).mkString("; ")}")
  }

  test("compression is monotone in merge count, and merges strictly " +
      "shrink the paper corpus") {
    val m = Bpe.train(docs, 30)
    val sizes = Seq(0, 10, 20, 30).map(n =>
      n -> Bpe.totalSymbols(docs, m.truncated(n)))
    info(s"total symbols by merge count: ${sizes.mkString(", ")}")
    sizes.sliding(2).foreach { case Seq((na, a), (nb, b)) =>
      assert(b <= a, s"merges $na -> $nb grew the corpus: $a -> $b")
    }
    assert(sizes.last._2 < sizes.head._2, "30 merges must actually compress")
  }

  test("training is deterministic across shuffle partitionings (the " +
      "argmax tiebreak is total)") {
    def at(parts: String): Seq[(String, String)] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try Bpe.train(docs, 15).merges
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(at("2") === at("7"))
  }

  test("OOV: unseen words encode through the identical expression path — " +
      "no unknown token, segmentation just falls back toward chars") {
    val m = Bpe.train(paperCorpus, 3)
    val oov = Seq((0L, "lowest"), (1L, "wide"), (2L, "zzz"))
      .toDF("doc_id", "text")
    val got = Bpe.encode(oov, m).collect()
      .map(r => r.getString(2) -> r.getSeq[String](3)).toMap
    // "lowest" was never a training word, but its suffix hits the learned
    // est</w> symbol — the open-vocabulary property the paper sells
    assert(got("lowest") === Seq("l", "o", "w", "est</w>"))
    assert(got("zzz") === Seq("z", "z", "z", "</w>"))
    // and a training word through the same path keeps its training form
    assert(Bpe.encode(Seq((0L, "newest")).toDF("doc_id", "text"), m)
      .collect()(0).getSeq[String](3) === Seq("n", "e", "w", "est</w>"))
  }

  test("streaming twin: per-batch online tokenization equals the batch " +
      "encoder on each batch's documents (frozen model)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val m = Bpe.train(paperCorpus, 3)
    def enc(rows: Seq[(Long, String)]): Set[(Long, Int, String, Seq[String])] =
      Bpe.encode(rows.toDF("doc_id", "text"), m).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getSeq[String](3))).toSet
    val b1 = Seq((1L, "low lower"), (2L, "newest"))
    val b2 = Seq((3L, "lowest widest zz"))
    val sunk = scala.collection.mutable
      .ArrayBuffer[(Long, Set[(Long, Int, String, Seq[String])])]()
    val stream = MemoryStream[(Long, String)](93, spark, None)
    val q = graft.stream.Streaming.streamBpeEncode(
        stream.toDF().toDF("doc_id", "text"), m,
        (df, id) => sunk += ((id, df.collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
            r.getSeq[String](3))).toSet)))
      .start()
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    assert(sunk.size === 2)
    assert(sunk(0)._2 === enc(b1))
    assert(sunk(1)._2 === enc(b2))
  }

  test("packCorpus: every subword lands in exactly one bin, bins respect " +
      "the budget (modulo one oversized doc), docs never split, and the " +
      "within-bin order reconstructs each document") {
    val docsSrc = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").localCheckpoint()
    val m = Bpe.train(docsSrc, 20)
    val packed = Bpe.packCorpus(docsSrc, m, binSize = 256L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getInt(4), r.getString(5)))
    // conservation: the packed stream IS the encoded stream
    val totalSubs = Bpe.totalSymbols(docsSrc, m)
    assert(packed.length.toLong === totalSubs)
    // a doc belongs to exactly one (source, bin)
    val docBins = packed.groupBy(_._3).map { case (_, rs) =>
      rs.map(r => (r._1, r._2)).toSet.size }
    assert(docBins.forall(_ === 1), "a document must never split")
    // bin budgets: every bin except a shard's last is over half-full and
    // a bin only exceeds the budget when a single doc does
    val binSizes = packed.groupBy(r => (r._1, r._2)).view
      .mapValues(_.size.toLong).toMap
    for (((src, bin), n) <- binSizes if n > 256L) {
      val biggestDoc = packed.filter(r => r._1 == src && r._2 == bin)
        .groupBy(_._3).map(_._2.size).max
      assert(biggestDoc > 0 && n - biggestDoc < 256L,
        s"bin ($src,$bin) overflowed by more than its last doc")
    }
    // order: subwords of each doc, sorted (pos, sub_pos), concatenate
    // back to the document text + sentinels
    val texts = docsSrc.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    packed.groupBy(_._3).foreach { case (docId, rs) =>
      val rebuilt = rs.sortBy(r => (r._4, r._5)).map(_._6).mkString("")
        .replace(Bpe.Eow, " ").trim
      assert(rebuilt === texts(docId), s"doc $docId order broken")
    }
  }

  test("the corpus encode plan: vocab rides a broadcast join back to " +
      "occurrences — no sort-merge join, no corpus-keyed exchange beyond " +
      "the vocab distinct") {
    val m = Bpe.train(paperCorpus, 2)
    val df = Bpe.encode(docs, m)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }
}
