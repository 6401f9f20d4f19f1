package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CCNet-style perplexity bucketing ([[TextOps.qualityBuckets]]): tercile
  * structure and keep policy hold, the frozen-cuts shard form reproduces
  * the declared ntile form on score-distinct data, and both are
  * partitioning-independent.
  */
class QualityBucketSpec extends SparkSpec {

  import spark.implicits._

  // corpus with structurally different repetition levels per doc so LM
  // scores separate cleanly (distinct at every tercile boundary): doc i
  // repeats a common bigram i times and pads with unique words
  private lazy val docs: DataFrame = {
    val rows = (0 until 30).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      val common = Seq.fill(i + 1)(s"alpha$lang beta$lang").mkString(" ")
      val unique = (0 until (30 - i)).map(k => s"u${i}w$k").mkString(" ")
      (i.toLong, lang, s"$common $unique")
    }
    rows.toDF("doc_id", "lang", "text")
  }

  private def bucketsOf(df: DataFrame): Map[Long, (String, String, Boolean)] =
    df.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getString(3), r.getBoolean(4))).toMap

  test("tercile structure: equal-sized groups, head outscores tail") {
    val b = TextOps.qualityBuckets(docs)
    val sizes = b.groupBy("lang", "bucket").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    Seq("en", "de").foreach { l =>
      val s = Seq("head", "middle", "tail").map(sizes(l, _))
      assert(s.max - s.min <= 1, s"$l tercile sizes $s")
    }
    // min head score >= max middle score >= ... per language
    val rows = b.collect().map(r =>
      (r.getString(1), r.getString(3), r.getDouble(2)))
    Seq("en", "de").foreach { l =>
      def scores(bk: String) = rows.collect { case (`l`, `bk`, s) => s }
      assert(scores("head").min >= scores("middle").max)
      assert(scores("middle").min >= scores("tail").max)
    }
  }

  test("keep policy: head all, tail none, middle by md5 nibble") {
    val b = TextOps.qualityBuckets(docs).collect()
      .map(r => (r.getLong(0), r.getString(3), r.getBoolean(4)))
    assert(b.collect { case (_, "head", k) => k }.forall(identity))
    assert(b.collect { case (_, "tail", k) => k }.forall(!_))
    val mid = b.collect { case (id, "middle", k) => (id, k) }
    assert(mid.nonEmpty)
    mid.foreach { case (id, k) =>
      val nib = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = String.format("%02x", Byte.box(nib(0))).charAt(0)
      assert(k === ("01234567".contains(hex)), s"doc $id nibble $hex")
    }
  }

  test("frozen-cuts shard form == declared ntile form (distinct scores)") {
    val declared = bucketsOf(TextOps.qualityBuckets(docs))
    val scored = LmScore.score(docs, LmScore.lmFrom(docs))
      .select(col("doc_id"), col("lm_score"))
    val scoredLang = docs.select(col("doc_id"), col("lang"))
      .join(scored, "doc_id")
    val cuts = TextOps.qualityCuts(docs)
    val byCuts = bucketsOf(TextOps.qualityBucketByCuts(scoredLang, cuts)
      .select("doc_id", "lang", "lm_score", "bucket", "kept"))
    assert(byCuts === declared)
  }

  test("KLL approximate cuts: bucket agreement within the rank-error " +
      "contract on a 6k-score corpus, boundaries between the terciles") {
    // synthetic scored projection — no LM needed; distinct scores by
    // construction (i-indexed), two languages, shuffled order
    val n = 6000
    val scored = (0 until n).map { i =>
      (i.toLong, if (i % 2 == 0) "en" else "de",
        (i * 7919 % n).toDouble + (if (i % 2 == 0) 0.25 else 0.5))
    }.toDF("doc_id", "lang", "lm_score").repartition(8)

    val t3 = ntile(3).over(org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("lm_score").desc, col("doc_id")))
    val exact = scored.withColumn("t3", t3)
      .select(col("doc_id"),
        when(col("t3") === 1, "head").when(col("t3") === 2, "middle")
          .otherwise("tail").as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val cuts = TextOps.qualityCutsApprox(scored)
    val approx = TextOps.qualityBucketByCuts(scored, cuts)
      .select("doc_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val agree = exact.count { case (id, b) => approx(id) == b }
    assert(agree.toDouble / n >= 0.98,
      s"bucket agreement ${agree.toDouble / n} below the KLL contract")
    // boundaries are real terciles: each bucket holds 1/3 ± ε per lang
    val sizes = approx.groupBy(_._2).view.mapValues(_.size).toMap
    Seq("head", "middle", "tail").foreach { b =>
      assert(math.abs(sizes(b) - n / 3.0) <= 0.05 * n, s"$b: ${sizes(b)}")
    }
  }

  test("streaming twin: per-batch cut bucketing against the published " +
      "LM == the batch shard form on the same rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files
      .createTempDirectory("qb_stream").toString
    LmScore.writeLm(docs, dir)
    val cuts = TextOps.qualityCuts(docs).localCheckpoint()

    def expected(batch: DataFrame): Map[Long, (String, Boolean)] = {
      val scored = LmScore.score(batch, LmScore.readLm(spark, dir))
        .select(col("doc_id"), col("lm_score"))
      TextOps.qualityBucketByCuts(
          batch.select("doc_id", "lang").join(scored, "doc_id"), cuts)
        .collect().map(r => r.getLong(0) ->
          (r.getString(3), r.getBoolean(4))).toMap
    }
    val rows = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val (b1, b2) = rows.partition(_._1 < 15L)

    val sunk = scala.collection.mutable.ArrayBuffer[
      Map[Long, (String, Boolean)]]()
    val stream = MemoryStream[(Long, String, String)](96, spark, None)
    val q = graft.stream.Streaming.streamQualityBucket(
        stream.toDF().toDF("doc_id", "lang", "text"), dir, cuts,
        (out, _) => sunk += out.collect().map(r => r.getLong(0) ->
          (r.getString(3), r.getBoolean(4))).toMap)
      .start()
    stream.addData(b1.toSeq); q.processAllAvailable()
    stream.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    assert(sunk.size === 2)
    assert(sunk(0) === expected(b1.toSeq.toDF("doc_id", "lang", "text")))
    assert(sunk(1) === expected(b2.toSeq.toDF("doc_id", "lang", "text")))
    assert(sunk(0).nonEmpty && sunk(1).nonEmpty)
  }

  test("partitioning-independent") {
    val a = bucketsOf(TextOps.qualityBuckets(docs.repartition(2)))
    val b = bucketsOf(TextOps.qualityBuckets(docs.repartition(7)))
    assert(a === b)
  }
}
