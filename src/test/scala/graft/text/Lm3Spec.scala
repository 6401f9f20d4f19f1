package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The trigram stupid-backoff form ([[LmScore.score3]]): on a planted
  * corpus where two documents have IDENTICAL bigram statistics by
  * symmetry, the bigram scorer provably cannot separate them — and the
  * trigram scorer strictly ranks the in-distribution one above the
  * novel-phrase one. Plus the analytic range and partitioning
  * determinism. */
class Lm3Spec extends SparkSpec {

  import spark.implicits._

  // 10× "a b c" and 10× "d b e": the bigrams (a,b),(b,c),(d,b),(b,e) all
  // have count 10 and cu is symmetric between c-side and e-side, so the
  // probes below tie exactly at the bigram level
  private lazy val corpus = ((0 until 10).map(i => (i.toLong, "a b c")) ++
    (0 until 10).map(i => (100L + i, "d b e")))
    .toDF("doc_id", "text").localCheckpoint()

  private lazy val probes = Seq(
    (1000L, "a b c"), // in-distribution: trigram (a,b,c) is corpus-attested
    (1001L, "a b e")) // every bigram attested, the PHRASE is novel
    .toDF("doc_id", "text")

  test("the planted separation: bigram scores tie EXACTLY, the trigram " +
      "model strictly prefers the attested phrase") {
    val bi = LmScore.score(probes, LmScore.lmFrom(corpus))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("lm_score")).toMap
    assert(bi(1000L) === bi(1001L),
      "the construction must make the bigram model blind")
    val tri = LmScore.score3(probes, LmScore.lm3From(corpus))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("lm3_score")).toMap
    assert(tri(1000L) > tri(1001L),
      s"trigram model must separate: $tri")
    // and the exact values the construction predicts: the attested doc
    // scores 1.0 (tri) + 0.4·1.0 (its first, context-less transition at
    // the bigram level); the novel one only ever reaches bigram mass
    assert(tri(1000L) === 1.0 + 0.4 * 1.0)
    assert(tri(1001L) === 0.4 * (20.0 / 30.0))
  }

  test("backoff levels partition the transitions: n_tri + n_bi + n_uni " +
      "== n_trans, on the real corpus against its own trigram LM") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").localCheckpoint()
    val rows = LmScore.score3(docs, LmScore.lm3From(docs)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tri") + r.getAs[Long]("n_bi")
        + r.getAs[Long]("n_uni") === r.getAs[Long]("n_trans"),
        s"doc ${r.getLong(0)}")
      val s = r.getAs[Double]("lm3_score")
      assert(s >= 0.0 && s <= 1.0 + 0.4 + 0.16, s"doc ${r.getLong(0)}: $s")
    }
  }

  test("the persisted trigram index: round-trip ≡ in-memory, shard " +
      "append ≡ rebuild (incl. cross-shard trigram promotion), " +
      "compaction invariant, loud refusal without the table") {
    def tmp(tag: String): String = java.nio.file.Files
      .createTempDirectory(s"graft_lm3_$tag").toString
    def scoresOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Any]] =
      df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap

    val dir = tmp("rt")
    LmScore.writeLm(corpus, dir, withTrigrams = true)
    assert(scoresOf(LmScore.score3(probes, LmScore.readLm3(spark, dir)))
      === scoresOf(LmScore.score3(probes, LmScore.lm3From(corpus))))

    // append ≡ rebuild, with a trigram that crosses the known cut only
    // across the two shards
    val a = Seq((1L, "qa qb qc")).toDF("doc_id", "text")
    val b = Seq((2L, "qa qb qc")).toDF("doc_id", "text")
    val incr = tmp("incr"); val full = tmp("full")
    LmScore.writeLm(a, incr, withTrigrams = true)
    val pre = LmScore.score3(Seq((9L, "qa qb qc")).toDF("doc_id", "text"),
      LmScore.readLm3(spark, incr)).collect()(0)
    assert(pre.getAs[Long]("n_tri") === 0, "one shard: trigram unknown")
    LmScore.appendLm(b, incr)
    LmScore.writeLm(a.unionByName(b), full, withTrigrams = true)
    val probe9 = Seq((9L, "qa qb qc")).toDF("doc_id", "text")
    val si = scoresOf(LmScore.score3(probe9, LmScore.readLm3(spark, incr)))
    assert(si === scoresOf(LmScore.score3(probe9,
      LmScore.readLm3(spark, full))))
    assert(si(9L)(1) === 1L, "post-append: the trigram promoted to known")

    LmScore.compactLm(spark, incr)
    assert(scoresOf(LmScore.score3(probe9, LmScore.readLm3(spark, incr)))
      === si, "compaction invisible to score3")

    val biOnly = tmp("bi")
    LmScore.writeLm(corpus, biOnly)
    val e = intercept[IllegalArgumentException] {
      LmScore.readLm3(spark, biOnly)
    }
    assert(e.getMessage.contains("no trigram table"))
  }

  test("streaming twin at the trigram level: streamLmScore(trigram) " +
      "replays score3 against the live index per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lm3_stream").toString
    LmScore.writeLm(corpus, dir, withTrigrams = true)
    val b1 = Seq((1000L, "a b c"), (1001L, "a b e"))
    val sunk = scala.collection.mutable
      .ArrayBuffer[Map[Long, Seq[Any]]]()
    val stream = MemoryStream[(Long, String)](94, spark, None)
    val q = graft.stream.Streaming.streamLmScore(
        stream.toDF().toDF("doc_id", "text"), dir,
        (df, _) => sunk += df.collect()
          .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap,
        trigram = true)
      .start()
    stream.addData(b1); q.processAllAvailable()
    q.stop()
    assert(sunk.size === 1)
    assert(sunk(0) === LmScore.score3(b1.toDF("doc_id", "text"),
        LmScore.readLm3(spark, dir)).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap)
  }

  test("score3 is identical across shuffle partitionings (integer sums " +
      "+ one fixed tree — the repo's determinism discipline)") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").localCheckpoint()
    def at(parts: String): Map[Long, Seq[Any]] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try LmScore.score3(docs, LmScore.lm3From(docs)).collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(at("2") === at("7"))
  }
}
