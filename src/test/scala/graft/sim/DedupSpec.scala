package graft.sim

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: path graph needs multiple propagation rounds") {
    // 1-2-3-4-5 is diameter 4 — min-label must flow several hops, so this
    // fails if the loop stops after one round. 10-11 is a second component;
    // 20-20 would be a self-loop (not produced by our detectors, but must
    // not break anything).
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (11L, 10L), (20L, 20L)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("clusters: keep flags exactly the component minimum") {
    val pairs = Seq((7L, 3L), (3L, 9L), (100L, 50L)).toDF("x", "y")
    val got = Dedup.clusters(pairs, "x", "y")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((3L, 3L, true), (7L, 3L, false), (9L, 3L, false),
      (50L, 50L, true), (100L, 50L, false)))
  }

  test("dedupCorpus drops non-canonical near-dups, keeps singletons") {
    // three planted copies of one text (ids 1,5,9), two unique docs
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (5L, "the quick brown fox jumps over the lazy dog again and again"),
      (9L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about spark physical planning"),
      (3L, "yet another unrelated document mentioning firewalls and acls"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L), s"got $kept")
    // schema preserved — it's a filter, not a projection
    assert(Dedup.dedupCorpus(docs, "doc_id", "text").columns.toSeq
      === docs.columns.toSeq)
  }

  test("random graphs match a union-find reference (property)") {
    val rng = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val nNodes = 60 + rng.nextInt(60)
      val nEdges = 40 + rng.nextInt(80)
      val edges = Seq.fill(nEdges)(
        (rng.nextInt(nNodes).toLong, rng.nextInt(nNodes).toLong))
      // reference: classic path-compressed union-find, then min per root
      val parent = Array.tabulate(nNodes)(identity)
      def find(x: Int): Int = {
        if (parent(x) != x) parent(x) = find(parent(x)); parent(x)
      }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val minOfRoot = (0 until nNodes).filter(i =>
          edges.exists(e => e._1 == i || e._2 == i))
        .groupBy(find).map { case (_, m) => m.map(_.toLong).min -> m }
      val expected = minOfRoot.flatMap { case (mn, members) =>
        members.map(_.toLong -> mn)
      }.toMap
      val got = Dedup.connectedComponents(
        edges.toDF("a", "b"), "a", "b").as[(Long, Long)].collect().toMap
      assert(got === expected, s"trial $trial: $nNodes nodes, $nEdges edges")
    }
  }

  test("string ids work too (labels are min by type ordering)") {
    val pairs = Seq(("b", "c"), ("c", "a")).toDF("u", "v")
    val got = Dedup.connectedComponents(pairs, "u", "v")
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a"))
  }

  test("componentsFast (large-star/small-star): labels ≡ min-label on " +
      "paths, self-loops, string ids, and random graphs; O(log) rounds " +
      "on a planted 64-chain where min-label pays the diameter") {
    // the exact fixtures the min-label tests pin
    val fixtures = Seq(
      Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (11L, 10L),
        (20L, 20L)),
      Seq((7L, 3L), (3L, 9L), (100L, 50L)))
    fixtures.foreach { pairs =>
      val df = pairs.toDF("a", "b")
      assert(Dedup.componentsFast(df, "a", "b")
        .as[(Long, Long)].collect().toMap
        === Dedup.connectedComponents(df, "a", "b")
          .as[(Long, Long)].collect().toMap)
    }
    // string ids — no numeric cast anywhere in the loop
    val sPairs = Seq(("b", "c"), ("c", "a")).toDF("u", "v")
    assert(Dedup.componentsFast(sPairs, "u", "v")
      .as[(String, String)].collect().toMap
      === Map("a" -> "a", "b" -> "a", "c" -> "a"))
    // random graphs ≡ the min-label loop
    val rng = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val nNodes = 50 + rng.nextInt(50)
      val edges = Seq.fill(60 + rng.nextInt(60))(
        (rng.nextInt(nNodes).toLong, rng.nextInt(nNodes).toLong))
        .toDF("a", "b")
      assert(Dedup.componentsFast(edges, "a", "b")
        .as[(Long, Long)].collect().toMap
        === Dedup.connectedComponents(edges, "a", "b")
          .as[(Long, Long)].collect().toMap, s"trial $trial")
    }
    // the case that motivates the twin: a 64-node chain (diameter 63).
    // star rounds must stay logarithmic; the min-label loop provably
    // cannot (its label flows ONE hop per round, so node 63 needs 63
    // rounds to learn label 0 — asserted structurally below, not timed)
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Dedup.componentsFastWithRounds(chain, "a", "b")
    assert(labels.as[(Long, Long)].collect().toMap
      === (0L to 63L).map(_ -> 0L).toMap)
    assert(rounds <= 10,
      s"star alternation must converge in O(log n) rounds on a chain, " +
        s"took $rounds")
    // one-hop flow bound: after k min-label rounds node 63's label is
    // ≥ 63 - k (driver replay of the propagation recurrence), so the
    // min-label loop needs ≥ 63 rounds here — the structural divergence
    val oneHop = Array.tabulate(64)(_.toLong)
    var k = 0
    while (oneHop(63) != 0L) {
      val prev = oneHop.clone()
      (0 until 64).foreach { i =>
        val nb = Seq(i - 1, i + 1).filter(j => j >= 0 && j < 64)
          .map(prev(_))
        oneHop(i) = (prev(i) +: nb).min
      }
      k += 1
    }
    assert(k === 63, s"one-hop propagation on the chain takes $k rounds")
    assert(rounds < k / 4,
      s"round counts must measurably diverge: star=$rounds one-hop=$k")
  }

  test("incremental == whole-corpus on random planted-dup corpora (property)") {
    import org.apache.spark.sql.functions._
    // Random corpora stress the three drop classes jointly: direct corpus
    // hits, transitivity through new docs, and clean within-shard clusters
    // — at split points the fixture test's single cut can't cover.
    val rng = new scala.util.Random(1311)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def freshText(): String =
      Seq.fill(12 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size)))
        .mkString(" ")
    def mutate(t: String): String = {
      // swap one token — stays well above the 0.8 Jaccard threshold
      val toks = t.split(" ")
      toks(rng.nextInt(toks.length)) = vocab(rng.nextInt(vocab.size))
      toks.mkString(" ")
    }
    for (trial <- 1 to 3) {
      val n = 50 + rng.nextInt(30)
      val texts = new scala.collection.mutable.ArrayBuffer[String]
      for (i <- 0 until n) {
        val t =
          if (i > 0 && rng.nextDouble() < 0.4) {
            val src = texts(rng.nextInt(texts.size))
            if (rng.nextBoolean()) src else mutate(src)
          } else freshText()
        texts += t
      }
      val docs = spark.createDataFrame(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq)
        .toDF("doc_id", "text")
      val split = (n / 4 + rng.nextInt(n / 2)).toLong
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_mh_prop$trial").toString
      IncrementalDedup.writeIndex(
        docs.filter(col("doc_id") < split), "doc_id", "text", dir)
      val got = IncrementalDedup.dedupShard(spark,
          docs.filter(col("doc_id") >= split), "doc_id", "text", dir)
        .select("doc_id").as[Long].collect().toSet
      val expected = Dedup.dedupCorpus(docs, "doc_id", "text")
        .filter(col("doc_id") >= split)
        .select("doc_id").as[Long].collect().toSet
      assert(got === expected,
        s"trial $trial (n=$n, split=$split): " +
          s"missed=${expected.diff(got).size} extra=${got.diff(expected).size}")
    }
  }

  test("index append == full rebuild: ingest loop runs at shard cost (property)") {
    import org.apache.spark.sql.functions._
    // The round-10 ingest loop: probe shard A, drop its dups, FOLD A into
    // the index, then probe shard B — proven equal to (a) rebuilding the
    // index from corpus∪A and (b) whole-corpus dedup over everything,
    // restricted to B. Random planted-dup corpora (the incremental
    // property-test generator) stress arbitrary near-dup structure, not
    // just exact copies — the equality is exact because append writes the
    // same pure-function band rows a rebuild would.
    val rng = new scala.util.Random(2026)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def freshText(): String =
      Seq.fill(12 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size)))
        .mkString(" ")
    def mutate(t: String): String = {
      val toks = t.split(" ")
      toks(rng.nextInt(toks.length)) = vocab(rng.nextInt(vocab.size))
      toks.mkString(" ")
    }
    for (trial <- 1 to 2) {
      val n = 60 + rng.nextInt(30)
      val texts = new scala.collection.mutable.ArrayBuffer[String]
      for (i <- 0 until n) {
        val t =
          if (i > 0 && rng.nextDouble() < 0.4) {
            val src = texts(rng.nextInt(texts.size))
            if (rng.nextBoolean()) src else mutate(src)
          } else freshText()
        texts += t
      }
      val docs = spark.createDataFrame(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq)
        .toDF("doc_id", "text")
      val cut1 = n / 3; val cut2 = 2 * n / 3
      val corpus = docs.filter(col("doc_id") < cut1)
      val shardA = docs.filter(col("doc_id") >= cut1 && col("doc_id") < cut2)
      val shardB = docs.filter(col("doc_id") >= cut2)
      val dirInc = java.nio.file.Files
        .createTempDirectory(s"graft_mh_append$trial").toString
      val dirReb = java.nio.file.Files
        .createTempDirectory(s"graft_mh_rebuild$trial").toString

      IncrementalDedup.writeIndex(corpus, "doc_id", "text", dirInc)
      val keptA = IncrementalDedup
        .ingestShard(spark, shardA, "doc_id", "text", dirInc)
        .select("doc_id").as[Long].collect().toSet
      // ingestShard's kept set must be the pre-append probe verdict —
      // self-matching against the grown index would empty it
      val keptAExpected = Dedup.dedupCorpus(docs.filter(col("doc_id") < cut2),
          "doc_id", "text")
        .filter(col("doc_id") >= cut1)
        .select("doc_id").as[Long].collect().toSet
      assert(keptA === keptAExpected,
        s"trial $trial ingest verdict: missed=${keptAExpected.diff(keptA).size} " +
          s"extra=${keptA.diff(keptAExpected).size}")

      val gotB = IncrementalDedup
        .dedupShard(spark, shardB, "doc_id", "text", dirInc)
        .select("doc_id").as[Long].collect().toSet
      IncrementalDedup.writeIndex(docs.filter(col("doc_id") < cut2),
        "doc_id", "text", dirReb)
      val rebuiltB = IncrementalDedup
        .dedupShard(spark, shardB, "doc_id", "text", dirReb)
        .select("doc_id").as[Long].collect().toSet
      assert(gotB === rebuiltB,
        s"trial $trial append-vs-rebuild: missed=${rebuiltB.diff(gotB).size} " +
          s"extra=${gotB.diff(rebuiltB).size}")
      val wholeB = Dedup.dedupCorpus(docs, "doc_id", "text")
        .filter(col("doc_id") >= cut2)
        .select("doc_id").as[Long].collect().toSet
      assert(gotB === wholeB,
        s"trial $trial append-vs-whole: missed=${wholeB.diff(gotB).size} " +
          s"extra=${gotB.diff(wholeB).size}")

      // the appended index must still prune statically — partition
      // discovery over mixed original+appended files is the scale posture
      val hits = IncrementalDedup.corpusHits(spark, shardB, "doc_id", "text",
        dirInc, 0.8, 32, 8, 3)
      hits.collect()
      val physical = hits.queryExecution.executedPlan.toString
      assert(physical.linesIterator.exists(l =>
        l.contains("PartitionFilters: [") && l.contains("pb")
          && (l.contains("INSET") || l.contains(" IN ("))),
        s"trial $trial: appended index scan lost its static partition prune")
    }
  }

  test("incremental dedup == whole-corpus dedup restricted to the shard") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.documents(spark, sf)
    // monotonic-id ingestion contract: every shard id > every corpus id
    val split = 400L
    val corpus = docs.filter(col("doc_id") < split)
    val shard = docs.filter(col("doc_id") >= split)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mh_index").toString

    IncrementalDedup.writeIndex(corpus, "doc_id", "text", dir)
    val got = IncrementalDedup
      .dedupShard(spark, shard, "doc_id", "text", dir)
      .select("doc_id").as[Long].collect().toSet
    val expected = Dedup.dedupCorpus(docs, "doc_id", "text")
      .filter(col("doc_id") >= split)
      .select("doc_id").as[Long].collect().toSet
    assert(got === expected,
      s"missed=${expected.diff(got).size} extra=${got.diff(expected).size}")
    // the comparison must exercise all three drop classes: docs survive,
    // docs drop, and the shard contains within-shard dup structure
    val shardN = shard.count()
    assert(got.nonEmpty && got.size < shardN.toInt,
      s"fixture must both keep and drop shard docs (kept ${got.size}/$shardN)")

    // scale gate: the probe's index scan must be STATICALLY pruned to the
    // band-key buckets the shard actually hashes into — at 100 TB this is
    // what makes shard cost ∝ shard, not ∝ corpus. (Round 9: was a
    // dynamicpruning gate, but DPP only fires when the probe side carries
    // a likely-selective predicate — true for this test's filtered shard,
    // false for a bare shard read from files, which would have silently
    // full-scanned the index. The static IN prune holds either way; the
    // probe here is deliberately UNFILTERED to pin exactly that case.)
    val bare = spark.createDataFrame(shard.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq)
      .toDF("doc_id", "text")
    val hits = IncrementalDedup.corpusHits(spark, bare, "doc_id", "text",
      dir, 0.8, 32, 8, 3)
    hits.collect()
    val physical = hits.queryExecution.executedPlan.toString
    val partFilter = physical.linesIterator
      .find(l => l.contains("PartitionFilters: [") && l.contains("pb")
        && (l.contains("INSET") || l.contains(" IN (")))
    assert(partFilter.isDefined,
      s"index scan must carry a static IN partition filter on pb:\n" +
        physical.linesIterator.take(40).mkString("\n"))
  }
}
