package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Centroid (Rocchio) seed-set classification ([[Classify]], declared
  * `text_classify`): the frozen-model shard path equals the self-trained
  * corpus slice (the production-form transfer argument every index
  * family uses), OOV words carry no evidence, the scores match a
  * driver-side model exactly, and the argmax tie-break is
  * deterministic. */
class ClassifySpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = graft.core.Tables.documents(spark, sfDir)
    .select("doc_id", "source", "text").localCheckpoint()

  test("scores equal an exact driver-side integer model") {
    val m = Classify.model(docs)
    val got = Classify.scores(docs, m).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap

    val rows = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val cls = scala.collection.mutable.Map.empty[(String, String), Long]
    val mass = scala.collection.mutable.Map.empty[String, Long]
    rows.foreach { case (_, src, text) =>
      text.split(" ", -1).foreach { w =>
        cls((src, w)) = cls.getOrElse((src, w), 0L) + 1L
        mass(src) = mass.getOrElse(src, 0L) + 1L
      }
    }
    val classes = mass.keySet.toSeq.sorted
    var checked = 0
    rows.foreach { case (id, _, text) =>
      val toks = text.split(" ", -1)
      val tf = toks.groupBy(identity).map { case (w, a) => w -> a.length }
      classes.foreach { s =>
        val num = tf.map { case (w, t) =>
          t.toLong * cls.getOrElse((s, w), 0L) }.sum
        val expect = num.toDouble / (toks.length.toLong * mass(s)).toDouble
        assert(got((id, s)) === expect, s"doc $id class $s")
        checked += 1
      }
    }
    assert(checked === rows.length * classes.size)
  }

  test("frozen-model shard classification ≡ the self-trained corpus " +
      "restricted to the shard; OOV words carry no evidence") {
    val m = Classify.model(docs)
    val whole = Classify.classifyWith(docs, m).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val shard = docs.filter(col("doc_id") % 3 === 0)
    val got = Classify.classifyWith(shard, m).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === whole.filter(_._1 % 3 == 0),
      "shard classification must be the corpus result restricted")

    // an OOV-bearing doc still classifies on its known words alone, and
    // an ALL-OOV doc yields no evidence rows at all (no class wins by
    // accident of join type)
    val known = docs.head().getString(2).split(" ").take(3).mkString(" ")
    val probe = Seq((900001L, s"zzqx1 zzqx2 $known"), (900002L, "zzqx3 zzqx4"))
      .toDF("doc_id", "text")
    val out = Classify.classifyWith(probe, m).collect()
    assert(out.map(_.getLong(0)).toSet === Set(900001L))
    assert(out.head.getDouble(2) > 0.0)
  }

  test("streaming twin: per-batch classification ≡ the batch form") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val m = Classify.model(docs)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val all = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = all.splitAt(all.length / 2)
    val sunk = scala.collection.mutable
      .ArrayBuffer[Set[(Long, String, Double)]]()
    val stream = MemoryStream[(Long, String)](174, spark, None)
    val q = graft.stream.Streaming.streamClassify(
        stream.toDF().toDF("doc_id", "text"), m,
        (df, _) => sunk += rows(df))
      .start()
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    assert(sunk.size === 2)
    assert(sunk.reduce(_ ++ _) === rows(Classify.classifyWith(docs, m)),
      "streamed classifications must equal the batch form")

    // the hashed-model twin shares the posture — one-pass pin
    val mh = Classify.modelHashed(docs)
    val hsunk = scala.collection.mutable
      .ArrayBuffer[Set[(Long, String, Double)]]()
    val hstream = MemoryStream[(Long, String)](175, spark, None)
    val hq = graft.stream.Streaming.streamClassifyHashed(
        hstream.toDF().toDF("doc_id", "text"), mh,
        (df, _) => hsunk += rows(df))
      .start()
    hstream.addData(all.toSeq); hq.processAllAvailable()
    hq.stop()
    assert(hsunk.reduce(_ ++ _) ===
      rows(Classify.classifyHashedWith(docs.select("doc_id", "text"), mh)),
      "streamed hashed classifications must equal the batch form")
  }

  test("hashed-bigram model separates word-order classes the unigram " +
      "centroid provably cannot, at two partitionings") {
    val n = 20
    // identical bags of words, different adjacencies: unigram centroids
    // are equal for both classes, so every unigram score TIES and the
    // tie-break predicts the lexicographically-first class for every doc
    // — class "bbb" is 100% misclassified BY CONSTRUCTION. The bigram
    // features ("alpha beta" ×3 vs ×2) carry the order signal.
    val planted = ((0 until n).map(i => (i.toLong, "aaa",
        "alpha beta alpha beta alpha beta")) ++
      (0 until n).map(i => ((i + n).toLong, "bbb",
        "beta alpha beta alpha beta alpha")))
      .toDF("doc_id", "source", "text").localCheckpoint()

    val uni = Classify.classifyCorpus(planted).collect()
    assert(uni.length === 2 * n && uni.forall(_.getString(1) == "aaa"),
      "unigram model must tie everywhere (the planted failure mode)")

    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def run(parts: String) = {
      spark.conf.set(key, parts)
      Classify.classifyHashedCorpus(planted).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    }
    try {
      val a = run("2")
      val b = run("7")
      assert(a === b, "hashed classification must be partition-independent")
      assert((0 until n).forall(i => a(i.toLong)._1 == "aaa"))
      assert((0 until n).forall(i => a((i + n).toLong)._1 == "bbb"),
        "bigram evidence must separate the word-order classes")
    } finally spark.conf.set(key, prev)

    // frozen-model transfer holds for the hashed form too
    val m = Classify.modelHashed(planted)
    val whole = Classify.classifyHashedWith(planted, m).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val shard = Classify.classifyHashedWith(
        planted.filter(col("doc_id") % 2 === 0), m).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(shard === whole.filter(_._1 % 2 == 0))
  }

  test("argmax tie-break is deterministic: equal scores pick the " +
      "lexicographically first class") {
    // two single-doc classes with identical content -> every probe ties
    val train = Seq((1L, "sB", "a b c"), (2L, "sA", "a b c"))
      .toDF("doc_id", "source", "text")
    val out = Classify.classifyWith(
      Seq((10L, "a b"), (11L, "c c c")).toDF("doc_id", "text"),
      Classify.model(train)).collect()
    assert(out.forall(_.getString(1) == "sA"),
      s"ties must break by class name: ${out.mkString(",")}")
  }
}
