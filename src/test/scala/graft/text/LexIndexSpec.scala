package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted BM25 inverted index ([[LexIndex]]): the index-served search
  * EQUALS the corpus recompute EQUALS a driver-model fold (bit-exact
  * doubles — the sorted-fold determinism contract), the batched serving
  * scan equals the per-query loop, appends ≡ rebuild under the
  * monotonic-id guard, retraction subtracts corpus stats EXACTLY (scores
  * equal a rebuild without the docs, not just "the doc vanished"),
  * versioned compaction preserves results while shrinking files, the
  * postings scan stays statically pruned, the streaming twin folds batches
  * in, and the hybrid RRF serving composition reproduces the declared
  * query off the index.
  */
class LexIndexSpec extends SparkSpec {

  import spark.implicits._

  private val vocab = Vector("table", "join", "vector", "scan", "merge",
    "filter", "hash", "sort", "query", "batch", "row", "key")

  // splitmix64 — deterministic, well-mixed token choices per (doc, slot)
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Doc i: 5 + (mix(i) mod 20) tokens drawn from the vocab. */
  private def docOf(i: Long): (Long, String) = {
    val n = 5 + (Math.floorMod(mix(i), 20L)).toInt
    val words = (0 until n).map(s =>
      vocab(Math.floorMod(mix(i * 1000L + s), vocab.size.toLong).toInt))
    (i, words.mkString(" "))
  }

  private lazy val corpus: Seq[(Long, String)] = (0L until 120L).map(docOf)
  private lazy val shard: Seq[(Long, String)] = (500L until 540L).map(docOf)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_lexidx_$tag").toString

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  /** Driver BM25 model — the EXACT IEEE tree of LexIndex.contribution and
    * the sorted-term fold of foldScored, in plain Scala doubles. */
  private def model(rows: Seq[(Long, String)], terms: Seq[String],
      k: Int): Seq[(Long, Int, Long, Double)] = {
    val toks = rows.map { case (id, t) => (id, t.split(" ").toSeq) }
    val n = toks.size.toDouble
    val sumDl = toks.map(_._2.size.toLong).sum.toDouble
    val avgdl = sumDl / n
    val qTerms = terms.distinct
    val dfOf: Map[String, Double] = qTerms.map(term =>
      term -> toks.count(_._2.contains(term)).toDouble).toMap
    val scored = toks.flatMap { case (id, ts) =>
      val dl = ts.size
      val contribs = qTerms.sorted.flatMap { term =>
        val tf = ts.count(_ == term)
        if (tf == 0) None
        else {
          val dfd = dfOf(term)
          val t = tf.toDouble
          Some(((n - dfd + 0.5) / (dfd + 0.5)) *
            ((t * 2.2) / (t + 1.2 *
              (0.25 + 0.75 * (dl.toDouble / avgdl)))))
        }
      }
      if (contribs.isEmpty) None
      else Some((id, dl, contribs.size.toLong,
        contribs.foldLeft(0.0)(_ + _)))
    }
    scored.sortBy { case (id, _, _, s) => (-s, id) }.take(k)
  }

  private def collected(res: DataFrame): Seq[(Long, Int, Long, Double)] =
    res.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq

  test("searchCorpus == the driver fold model bit-exactly, and " +
      "searchTopK off the index == searchCorpus") {
    val terms = Seq("table", "join", "vector")
    val want = model(corpus, terms, 25)
    val gotCorpus = collected(LexIndex.searchCorpus(df(corpus), terms, 25))
    assert(gotCorpus === want)
    // non-vacuity: the fixture exercises partial matches somewhere in the
    // full scored set (the top of the ranking is naturally all-3-hits)
    assert(model(corpus, terms, corpus.size).map(_._3).distinct.size > 1,
      "n_hit must vary")

    val dir = tmp("probe")
    LexIndex.writeIndex(df(corpus), dir)
    val gotIndex = collected(LexIndex.searchTopK(spark, dir, terms, 25))
    assert(gotIndex === want)
  }

  test("searchTopKBatch == the per-query searchTopK loop, rank for rank") {
    val dir = tmp("batch")
    LexIndex.writeIndex(df(corpus), dir)
    val qs = Seq(
      (1L, Seq("table", "join")),
      (2L, Seq("vector", "scan", "merge")),
      (3L, Seq("hash")))
    val got = LexIndex.searchTopKBatch(spark,
        qs.toDF("qid", "terms"), dir, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3), r.getLong(4), r.getDouble(5))).toSet
    val want = qs.flatMap { case (qid, terms) =>
      collected(LexIndex.searchTopK(spark, dir, terms, 10))
        .zipWithIndex.map { case ((id, dl, nh, s), i) =>
          (qid, i + 1, id, dl, nh, s) }
    }.toSet
    assert(got === want)
    assert(got.nonEmpty && got.size === want.size)
  }

  test("append == rebuild-over-union (df and avgdl advance), and a " +
      "replayed shard trips the monotonic-id guard") {
    val dir = tmp("append")
    LexIndex.writeIndex(df(corpus), dir)
    LexIndex.appendIndex(df(shard), dir)
    val terms = Seq("table", "vector")
    val got = collected(LexIndex.searchTopK(spark, dir, terms, 30))
    assert(got === model(corpus ++ shard, terms, 30))

    val e = intercept[IllegalArgumentException] {
      LexIndex.appendIndex(df(shard), dir)
    }
    assert(e.getMessage.contains("monotonic-id"))
  }

  test("retraction: scores equal a rebuild WITHOUT the docs (exact stats " +
      "subtraction), replay no-ops, unknown ids subtract nothing") {
    val dir = tmp("retract")
    LexIndex.writeIndex(df(corpus), dir)
    val gone = Seq(3L, 17L, 44L)
    LexIndex.retract(spark, dir, gone)
    val terms = Seq("table", "join", "scan")
    val want = model(corpus.filterNot(d => gone.contains(d._1)), terms, 25)
    assert(collected(LexIndex.searchTopK(spark, dir, terms, 25)) === want)
    // replayed takedown: no double subtraction, results unchanged
    LexIndex.retract(spark, dir, gone)
    assert(collected(LexIndex.searchTopK(spark, dir, terms, 25)) === want)
    // an id that was never indexed burns a tombstone but subtracts nothing
    LexIndex.retract(spark, dir, Seq(99999L))
    assert(collected(LexIndex.searchTopK(spark, dir, terms, 25)) === want)
  }

  test("compaction: results identical, tombstone drop physical, one file " +
      "per partition, old version still readable") {
    val dir = tmp("compact")
    LexIndex.writeIndex(df(corpus), dir)
    LexIndex.appendIndex(df(shard), dir)
    LexIndex.retract(spark, dir, Seq(7L, 510L))
    val terms = Seq("merge", "filter")
    val before = collected(LexIndex.searchTopK(spark, dir, terms, 30))
    val oldRoot = graft.core.Versioned.resolveRoot(spark, dir)

    LexIndex.compactIndex(spark, dir)
    val newRoot = graft.core.Versioned.resolveRoot(spark, dir)
    assert(newRoot !== oldRoot)
    assert(collected(LexIndex.searchTopK(spark, dir, terms, 30)) === before)
    // the rebuild equals the ground truth too (stats rebuilt from live)
    assert(before === model(
      (corpus ++ shard).filterNot(d => d._1 == 7L || d._1 == 510L),
      terms, 30))
    // physical drop + one file per pt partition
    val posts = spark.read.parquet(s"$newRoot/postings")
    assert(posts.filter(col("doc_id").isin(7L, 510L)).count() === 0L)
    val fileCounts = posts.select(input_file_name().as("f"), col("pt"))
      .distinct().groupBy("pt").count().collect().map(_.getLong(1))
    assert(fileCounts.nonEmpty && fileCounts.forall(_ === 1L))
    // the superseded version is untouched debris — still fully readable
    assert(spark.read.parquet(s"$oldRoot/postings").count() > 0L)
  }

  test("plan: the postings scan is statically pruned to the query " +
      "terms' buckets") {
    val dir = tmp("prune")
    LexIndex.writeIndex(df(corpus), dir)
    val res = LexIndex.searchTopK(spark, dir, Seq("table", "merge"), 5)
    res.collect()
    val physical = res.queryExecution.executedPlan.toString
    // a 1-bucket query renders as equality, several as INSET/IN — accept
    // any static partition predicate on pt
    assert(physical.linesIterator.exists(l =>
      l.contains("PartitionFilters: [") && l.contains("pt")
        && (l.contains("INSET") || l.contains(" IN (")
          || l.contains(" = "))),
      "postings scan lost its static partition prune")
  }

  test("phrase search: index-served ≡ corpus recompute, overlaps count, " +
      "k=3 phrases verify positionally, appends and retraction hold") {
    val dir = tmp("phrase")
    // hand-built docs with known phrase structure alongside the corpus
    val extra = Seq(
      (200L, "table join table join table"), // "table join" ×2 (overlap-adjacent)
      (201L, "join table join"),             // "table join" ×1
      (202L, "table merge join"),            // 0 (not adjacent)
      (203L, "key key key key"))             // "key key" ×3 (overlapping)
    val docs = df(corpus ++ extra)
    LexIndex.writeIndex(docs, dir)

    def served(phrase: Seq[String]): Map[Long, Long] =
      LexIndex.phraseSearch(spark, dir, phrase).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver recompute: count start offsets where the phrase matches
    def model(phrase: Seq[String]): Map[Long, Long] =
      (corpus ++ extra).map { case (id, t) =>
        val ts = t.split(" ")
        id -> (0 to ts.length - phrase.length).count(i =>
          phrase.indices.forall(j => ts(i + j) == phrase(j))).toLong
      }.filter(_._2 > 0).toMap

    val p2 = Seq("table", "join")
    assert(served(p2) === model(p2))
    assert(served(p2)(200L) === 2L && served(p2)(201L) === 1L
      && !served(p2).contains(202L))
    assert(served(Seq("key", "key"))(203L) === 3L,
      "overlapping occurrences must all count")
    val p3 = Seq("table", "join", "table")
    assert(served(p3) === model(p3))
    assert(served(p3)(200L) === 2L)

    // append: new docs' phrases are served at shard cost
    LexIndex.appendIndex(df(Seq((600L, "table join end"))), dir)
    assert(served(p2)(600L) === 1L)
    // retraction removes the doc from phrase results immediately
    LexIndex.retract(spark, dir, Seq(200L))
    assert(!served(p2).contains(200L))
    // and compaction keeps the remaining verdicts
    LexIndex.compactIndex(spark, dir)
    val after = served(p2)
    assert(!after.contains(200L) && after(201L) === 1L
      && after(600L) === 1L)
  }

  test("phrase batch serving: one pruned scan ≡ per-phrase phraseSearch, " +
      "duplicate-term and no-hit phrases included") {
    import spark.implicits._
    val dir = tmp("phrasebatch")
    val extra = Seq(
      (200L, "table join table join table"),
      (201L, "join table join"),
      (203L, "key key key key"))
    LexIndex.writeIndex(df(corpus ++ extra), dir)

    val batch = Seq(
      (1L, Seq("table", "join")),           // k=2, overlapping in 200
      (2L, Seq("table", "join", "table")),  // k=3
      (3L, Seq("key", "key")),              // duplicate-term phrase
      (4L, Seq("nosuchterm", "join")))      // no occurrences anywhere
    val got = LexIndex.phraseSearchBatch(spark,
        batch.toDF("qid", "phrase"), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val want = batch.flatMap { case (qid, phrase) =>
      LexIndex.phraseSearch(spark, dir, phrase).collect()
        .map(r => (qid, r.getLong(0)) -> r.getLong(1))
    }.toMap
    assert(got === want, "batch results must equal the per-phrase path")
    assert(!got.keySet.exists(_._1 == 4L), "no-hit phrase yields no rows")
    assert(got((3L, 203L)) === 3L, "overlaps count in the batch path too")

    // the shared positions scan stays statically pruned to the batch's
    // term buckets (the searchTopKBatch discipline)
    val res = LexIndex.phraseSearchBatch(spark,
      batch.toDF("qid", "phrase"), dir)
    res.collect()
    val physical = res.queryExecution.executedPlan.toString
    assert(physical.linesIterator.exists(l =>
      l.contains("PartitionFilters: [") && l.contains("pt")
        && (l.contains("INSET") || l.contains(" IN (")
          || l.contains(" = "))),
      "batch positions scan lost its static partition prune")
  }

  test("a positionless index (withPositions = false) serves BM25 " +
      "normally and refuses phrase queries loudly") {
    val dir = tmp("nopos")
    LexIndex.writeIndex(df(corpus), dir, withPositions = false)
    assert(LexIndex.searchTopK(spark, dir, Seq("table"), 5).count() === 5L)
    // appends keep the positionless layout
    LexIndex.appendIndex(df(Seq((700L, "table join end"))), dir)
    val e = intercept[IllegalArgumentException] {
      LexIndex.phraseSearch(spark, dir, Seq("table", "join"))
    }
    assert(e.getMessage.contains("withPositions"))
    // and compaction of a positionless index stays positionless
    LexIndex.compactIndex(spark, dir)
    intercept[IllegalArgumentException] {
      LexIndex.phraseSearch(spark, dir, Seq("table", "join"))
    }
  }

  test("plan: the phrase positions scan is statically pruned to the " +
      "phrase terms' buckets") {
    val dir = tmp("phraseprune")
    LexIndex.writeIndex(df(corpus), dir)
    val res = LexIndex.phraseSearch(spark, dir, Seq("table", "join"))
    res.collect()
    val physical = res.queryExecution.executedPlan.toString
    assert(physical.linesIterator.exists(l =>
      l.contains("PartitionFilters: [") && l.contains("pt")
        && (l.contains("INSET") || l.contains(" IN (")
          || l.contains(" = "))),
      "positions scan lost its static partition prune")
  }

  test("streaming twin: two micro-batches == sequential appendIndex == " +
      "one rebuild over everything") {
    val dir = tmp("stream")
    LexIndex.writeIndex(df(corpus), dir)
    val b1 = shard.take(20)
    val b2 = shard.drop(20)
    val sunk = scala.collection.mutable.ArrayBuffer[Long]()
    val stream = MemoryStream[(Long, String)](95, spark, None)
    val q = graft.stream.Streaming.streamLexIngest(
        stream.toDF().toDF("doc_id", "text"), dir, id => sunk += id)
      .start()
    stream.addData(b1); q.processAllAvailable()
    // mid-stream serve: batch 1 already folded in
    val terms = Seq("table", "join")
    assert(collected(LexIndex.searchTopK(spark, dir, terms, 20))
      === model(corpus ++ b1, terms, 20))
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    assert(sunk.size === 2)
    assert(collected(LexIndex.searchTopK(spark, dir, terms, 20))
      === model(corpus ++ shard, terms, 20))
  }

  test("hybrid serving: rrfFuse over the INDEX-served lexical leg + the " +
      "exact dense leg == the declared sim_hybrid_rrf query") {
    val d = "/root/testdata/sf0.001"
    val dir = tmp("hybrid")
    LexIndex.writeIndex(
      graft.core.Tables.documents(spark, d).select("doc_id", "text"), dir)
    val lexTop = LexIndex.searchTopK(spark, dir, Seq("table", "join"), 50)
    val lexR = lexTop.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(desc("score"), asc("doc_id"))))
      .select(col("doc_id").as("id"), col("rank"))
    val normed = graft.core.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(graft.sim.VectorMath.dot(col("v"), col("v"))))
    val probe = broadcast(normed.filter(col("vec_id") === 0)
      .select(col("v").as("p"), col("norm").as("pnorm")))
    val denseTop = normed.filter(col("vec_id") =!= 0)
      .crossJoin(probe)
      .select(col("vec_id"),
        (graft.sim.VectorMath.dot(col("v"), col("p"))
          / (col("norm") * col("pnorm"))).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id")).limit(50)
    val denseR = denseTop.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(desc("cosine"), asc("vec_id"))))
      .select(col("vec_id").as("id"), col("rank"))
    val served = graft.sim.Eval.rrfFuse(lexR, denseR)
      .select(col("id").as("doc_id"), col("r_a").as("r_lex"),
        col("r_b").as("r_dense"), col("rrf"))
      .orderBy(desc("rrf"), asc("doc_id")).limit(20)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)), r.getDouble(3))).toSeq
    val declared = graft.sim.Eval.queries("sim_hybrid_rrf")(spark, d)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)), r.getDouble(3))).toSeq
    assert(served === declared)
    // non-vacuity: the fusion must mix docs that appear in only one leg
    assert(declared.exists(_._2.isEmpty) || declared.exists(_._3.isEmpty),
      "fixture too easy: every fused doc appeared in both legs")
  }

  test("analyzer-stage stemming: morphological variants fold into one " +
      "postings row; symmetry is load-bearing") {
    import spark.implicits._
    val morph = Seq(
      (0L, "relational databases and tables"),
      (1L, "relations between tables and queries"),
      (2L, "relate the table to the join"),
      (3L, "vectors scanned quickly"))
      .toDF("doc_id", "text")

    // the raw index sees three different terms — a "relate" query finds
    // only the exact form
    val rawHits = LexIndex.searchCorpus(morph, Seq("relate"), 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rawHits === Set(2L), "raw recall misses morphological variants")

    // the analyzer pair folds all three onto the stem
    assert(LexIndex.stemTerms(Seq("relate")) === Seq("relat"))
    val stemmed = LexIndex.stemCorpus(morph)
    val q = LexIndex.stemTerms(Seq("relate"))
    val corpusHits = LexIndex.searchCorpus(stemmed, q, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(corpusHits === Set(0L, 1L, 2L),
      "stemmed recall must cover relational/relations/relate")

    // the persisted index serves the same ranking as the corpus path
    val dir = tmp("stem")
    LexIndex.writeIndex(stemmed, dir)
    assert(collected(LexIndex.searchTopK(spark, dir, q, 10))
      === collected(LexIndex.searchCorpus(stemmed, q, 10)))

    // analyzer SYMMETRY: probing the stemmed index with the unstemmed
    // term finds nothing — the documented contract, pinned so it cannot
    // silently become "mostly works"
    assert(LexIndex.searchTopK(spark, dir, Seq("relate"), 10).count() === 0L)
  }
}
