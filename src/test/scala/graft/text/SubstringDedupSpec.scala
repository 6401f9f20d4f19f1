package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SubstringDedupSpec extends SparkSpec {

  import spark.implicits._

  private val k = 5

  /** Brute-force model of the operator: all k-gram positions whose gram
    * occurs in ≥2 distinct docs, merged into maximal covered spans. */
  private def bruteSpans(docs: Seq[(Long, String)], k: Int = k)
      : Set[(Long, Int, Int, Long)] = {
    val grams = docs.flatMap { case (id, text) =>
      val t = text.split(" ", -1)
      (0 to t.length - k).map(p => (id, p + 1, t.slice(p, p + k).mkString(" ")))
    }
    val nd = grams.groupBy(_._3).map { case (g, occ) =>
      g -> occ.map(_._1).distinct.size.toLong
    }
    docs.flatMap { case (id, _) =>
      val hits = grams.filter(g => g._1 == id && nd(g._3) > 1)
        .map(g => (g._2, nd(g._3))).sortBy(_._1)
      // gaps-and-islands with equal-length spans: break when gap > k
      val islands = hits.foldLeft(List.empty[List[(Int, Long)]]) {
        case (acc, h) => acc match {
          case cur :: rest if h._1 - cur.head._1 <= k => (h :: cur) :: rest
          case _ => List(h) :: acc
        }
      }
      islands.map { isl =>
        val ps = isl.map(_._1)
        (id, ps.min, ps.max + k - ps.min, isl.map(_._2).max)
      }
    }.toSet
  }

  private def spansOf(docs: Seq[(Long, String)],
      k: Int = k): Set[(Long, Int, Int, Long)] =
    SubstringDedup.dupSpans(docs.toDF("doc_id", "text"), k)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet

  test("planted copied passage is found in every sharing doc, exactly") {
    // Unique filler (per-doc token prefixes) + one 7-token passage planted
    // in docs 1 and 3 at different offsets. k=5 ⇒ the passage yields 3
    // overlapping shingles merging into ONE span of length 7 per doc.
    val passage = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      1L -> s"a1 a2 a3 $passage a4 a5 a6 a7 a8",
      2L -> "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12",
      3L -> s"c1 $passage c2 c3 c4 c5 c6 c7 c8 c9",
      4L -> "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10 d11 d12"
    )
    val got = spansOf(docs)
    assert(got === Set(
      (1L, 4, 7, 2L),   // after 3 filler tokens
      (3L, 2, 7, 2L)))  // after 1 filler token
    assert(got === bruteSpans(docs))
  }

  test("no span shorter than k ever emits; self-repeats don't count") {
    val docs = Seq(
      // shares only a (k-1)-token run with doc 2 — below threshold
      1L -> "x1 x2 p1 p2 p3 p4 x3 x4 x5 x6",
      2L -> "y1 y2 y3 p1 p2 p3 p4 y4 y5 y6",
      // repeats its own 6-token run twice, but no OTHER doc has it
      3L -> "q1 q2 q3 q4 q5 q6 z1 q1 q2 q3 q4 q5 q6 z2"
    )
    assert(spansOf(docs).isEmpty)
    assert(bruteSpans(docs).isEmpty)
  }

  test("adjacent distinct passages merge into one maximal span") {
    // Docs 1/2 share passage A; docs 1/3 share passage B; in doc 1 they
    // are adjacent, so doc 1 reports ONE merged span covering both, with
    // n_sharers = max over the span's shingles.
    val pa = "m1 m2 m3 m4 m5"   // exactly k tokens
    val pb = "n1 n2 n3 n4 n5"
    val docs = Seq(
      1L -> s"u1 u2 $pa $pb u3 u4",
      2L -> s"v1 v2 v3 $pa v4 v5",
      3L -> s"w1 $pb w2 w3 w4 w5"
    )
    val got = spansOf(docs)
    assert(got === bruteSpans(docs))
    assert(got.filter(_._1 == 1L) === Set((1L, 3, 10, 2L)))
  }

  test("random planted corpora: spans match the brute-force model at every k") {
    val rnd = new scala.util.Random(8)
    // sweep the shingle width too — the declared query pins k=8, but the
    // operator is parameterized and the island-merge arithmetic (break at
    // gap > k) must hold for any k, not just the one the fixture uses
    for (kk <- Seq(3, 5, 8); trial <- 1 to 3) {
      val nDocs = 12
      val passages = Seq.tabulate(3)(i =>
        Seq.tabulate(kk + rnd.nextInt(4))(j => s"P${i}_$j").mkString(" "))
      val docs = (1L to nDocs).map { id =>
        val toks = scala.collection.mutable.Buffer
          .tabulate(10 + rnd.nextInt(10))(j => s"d${id}_$j")
        // plant 0-2 passages at random token offsets
        (0 until rnd.nextInt(3)).foreach { _ =>
          val p = passages(rnd.nextInt(passages.size))
          toks.insert(rnd.nextInt(toks.size + 1), p)
        }
        id -> toks.mkString(" ")
      }
      assert(spansOf(docs, kk) === bruteSpans(docs, kk),
        s"k=$kk trial $trial: $docs")
    }
  }

  /** Brute model of the index probe: shard positions whose k-gram appears
    * in ANY corpus doc, merged into islands; n_sharers = max distinct
    * corpus docs over the island's grams. */
  private def bruteShardSpans(corpus: Seq[(Long, String)],
      shard: Seq[(Long, String)]): Set[(Long, Int, Int, Long)] = {
    def grams(text: String) = {
      val t = text.split(" ", -1)
      (0 to t.length - k).map(p => (p + 1, t.slice(p, p + k).mkString(" ")))
    }
    val nd = corpus.flatMap { case (id, tx) => grams(tx).map(g => (g._2, id)) }
      .groupBy(_._1).map { case (g, occ) => g -> occ.map(_._2).distinct.size.toLong }
    shard.flatMap { case (id, tx) =>
      val hits = grams(tx).collect { case (p, g) if nd.contains(g) => (p, nd(g)) }
      val islands = hits.foldLeft(List.empty[List[(Int, Long)]]) {
        case (acc, h) => acc match {
          case cur :: rest if h._1 - cur.head._1 <= k => (h :: cur) :: rest
          case _ => List(h) :: acc
        }
      }
      islands.map { isl =>
        val ps = isl.map(_._1)
        (id, ps.min, ps.max + k - ps.min, isl.map(_._2).max)
      }
    }.toSet
  }

  test("shard probe against the shingle index matches the corpus-copy model") {
    import spark.implicits._
    val passage = "alpha beta gamma delta epsilon zeta eta"  // in corpus
    val both = "k1 k2 k3 k4 k5 k6"                           // in BOTH corpus docs
    val shardOnly = "s1 s2 s3 s4 s5 s6"                      // shard-internal only
    val corpus = Seq(
      1L -> s"a1 a2 $passage $both a3 a4",
      2L -> s"b1 b2 b3 b4 $both b5 b6 b7 b8")
    val shard = Seq(
      10L -> s"c1 $passage c2 $shardOnly c3 c4 c5",
      11L -> s"d1 d2 $shardOnly $both d3 d4",
      12L -> "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shingle_idx").toString
    SubstringDedup.appendShingleIndex(corpus.toDF("doc_id", "text"), k, dir)

    val df = SubstringDedup.shardDupSpans(shard.toDF("doc_id", "text"), k, dir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    val want = bruteShardSpans(corpus, shard)
    assert(got === want, s"got $got\nwant $want")
    // the shard-internal shared passage must NOT flag (not in the corpus),
    // the corpus-shared one must flag in both shard docs, and the passage
    // present in BOTH corpus docs must carry n_sharers = 2
    assert(!got.exists(_._1 == 12L))
    assert(got.exists(_._1 == 10L) && got.exists(_._1 == 11L))
    assert(got.filter(_._1 == 11L).forall(_._4 === 2L))
    // the corpus index arrives Bloom-pruned map-side, never joined raw
    assert(df.queryExecution.executedPlan.toString.contains("might_contain"))
  }

  test("disjoint index appends compose exactly (sum of nd = distinct over union)") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta"
    val half1 = Seq(1L -> s"a1 a2 $shared a3 a4 a5")
    val half2 = Seq(2L -> s"b1 $shared b2 b3 b4 b5")
    val shard = Seq(10L -> s"c1 c2 c3 $shared c4")
    def spansAfter(appends: Seq[Seq[(Long, String)]]): Set[(Long, Int, Int, Long)] = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_shingle_inc").toString
      appends.foreach(a =>
        SubstringDedup.appendShingleIndex(a.toDF("doc_id", "text"), k, dir))
      SubstringDedup.shardDupSpans(shard.toDF("doc_id", "text"), k, dir)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    }
    val oneShot = spansAfter(Seq(half1 ++ half2))
    val incremental = spansAfter(Seq(half1, half2))
    assert(incremental === oneShot)
    assert(incremental === bruteShardSpans(half1 ++ half2, shard))
    // the shared passage is in one doc per half → summed nd = 2
    assert(incremental.forall(_._4 === 2L))
  }

  test("a boilerplate gram in EVERY doc stays linear and correct (no df cap)") {
    // the design claim behind dropping text_contamination's df≤16 cap:
    // there is no pair fan-out anywhere, so a gram shared by ALL n docs
    // costs n rows, not n² — functionally: 200 docs opening with the same
    // k-token boilerplate header plus unique bodies must each report
    // exactly the header span with n_sharers = 200, quickly
    val header = "sys log line fmt ver"  // k = 5 tokens
    val docs = (1L to 200L).map(id =>
      id -> s"$header u${id}_1 u${id}_2 u${id}_3 u${id}_4")
    val got = spansOf(docs)
    assert(got === (1L to 200L).map(id => (id, 1, 5, 200L)).toSet)
    assert(got === bruteSpans(docs))
  }

  test("bucketed shingle index: same spans, index side never shuffles") {
    import spark.implicits._
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota"
    val corpus = Seq(
      1L -> s"a1 a2 $passage a3 a4 a5 a6",
      2L -> s"b1 b2 b3 $passage b4 b5")
    val shard = Seq(
      10L -> s"c1 $passage c2 c3 c4 c5",
      11L -> "d1 d2 d3 d4 d5 d6 d7 d8 d9")
    val pathDir = java.nio.file.Files
      .createTempDirectory("graft_shingle_path").toString
    SubstringDedup.appendShingleIndex(corpus.toDF("doc_id", "text"), k, pathDir)
    SubstringDedup.appendShingleIndexBucketed(
      corpus.toDF("doc_id", "text"), k, "shingle_idx_b", buckets = 4)
    // keep the SMJ shape this test is about (AQE would broadcast the tiny
    // fixture sides and make the exchange comparison vacuous)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val viaPath = SubstringDedup.shardDupSpans(
        shard.toDF("doc_id", "text"), k, pathDir)
      val viaBucket = SubstringDedup.shardDupSpansBucketed(
        shard.toDF("doc_id", "text"), k, "shingle_idx_b")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
      val (rp, rb) = (rows(viaPath), rows(viaBucket))
      assert(rb === rp && rb.nonEmpty)
      // count hash exchanges via FORMATTED explain: the raw toString nests
      // the bloom subquery's own "== Initial Plan ==" marker BEFORE the
      // main plan's, so a split-at-first-marker truncates the final plan
      // (this very test caught that); formatted mode prints the final
      // adaptive plan only, and the subquery's bloom exchange is
      // SinglePartition so it never matches
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Arguments: hashpartitioning".r.findAllIn(
          df.queryExecution.explainString(org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))).size
      val planB = viaBucket.queryExecution.executedPlan.toString
      assert(planB.contains("SelectedBucketsCount"),
        s"index scan must be bucket-aware:\n$planB")
      // bucketing feeds the digest agg AND the probe join's index side its
      // hash distribution, so the bucketed plan drops exchanges vs path
      assert(exchanges(viaBucket) < exchanges(viaPath),
        s"bucketed=${exchanges(viaBucket)} path=${exchanges(viaPath)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS shingle_idx_b")
    }
  }

  test("dedupStats budgets and maskSpans removes exactly the flagged spans") {
    val passage = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      1L -> s"a1 a2 a3 $passage a4",
      2L -> s"b1 $passage b2 b3 b4 b5 b6 b7 b8 b9 b10 b11",
      3L -> "c1 c2 c3 c4 c5 c6"
    )
    val df = docs.toDF("doc_id", "text")
    val stats = SubstringDedup.dedupStats(df, k, maxDupFrac = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(stats(1L) === ((11, 7L, false)))  // 7/11 ≥ 0.5 → drop
    assert(stats(2L) === ((18, 7L, true)))   // 7/18 < 0.5 → keep
    assert(stats(3L) === ((6, 0L, true)))    // untouched doc keeps
    val masked = SubstringDedup.maskSpans(df, k)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(masked(1L) === "a1 a2 a3 a4")
    assert(masked(2L) === "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11")
    assert(masked(3L) === "c1 c2 c3 c4 c5 c6")
  }
}
