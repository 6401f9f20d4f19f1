package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property-style checks for the approximate similarity stack (these ops are
  * deliberately NOT oracle-declared — SURVEY §7.5.7). */
class SimSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def docs = graft.core.Tables.documents(spark, sfDir)

  /** All exact token-Jaccard pairs ≥ t (brute force, test-only oracle). */
  private def exactPairs(t: Double) = {
    val d = docs.select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("toks"))
    d.alias("a").join(d.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        MinHash.exactJaccard(col("a.toks"), col("b.toks")).as("jaccard"))
      .filter(col("jaccard") >= t)
  }

  test("minhash signature estimates Jaccard within tolerance") {
    val d = docs.select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("toks"),
      MinHash.signature(MinHash.shingles(col("text"), 1), 64).as("sig"))
    val pairs = d.alias("a")
      .join(d.alias("b"), col("a.doc_id") < col("b.doc_id")
        && col("a.doc_id") % 20 === 0) // sample to keep the cross join small
      .select(
        MinHash.exactJaccard(col("a.toks"), col("b.toks")).as("exact"),
        MinHash.estimateJaccard(col("a.sig"), col("b.sig"), 64).as("est"))
    val err = pairs.agg(avg(abs(col("exact") - col("est")))).head.getDouble(0)
    assert(err < 0.08, s"mean |exact-est| = $err should be < 0.08 at k=64")
  }

  test("LSH candidate generation recalls high-Jaccard pairs") {
    val truth = exactPairs(0.8).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "corpus should contain near-dup pairs")
    val found = MinHash.nearDupPairs(docs, "doc_id", "text",
        numHashes = 32, bands = 8, shingleK = 1, threshold = 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = found.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall of ${truth.size} pairs")
    assert(found.subsetOf(exactPairs(0.8 - 1e-9).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet),
      "verification must keep only truly-similar pairs")
  }

  test("word-shingle minhash also surfaces order-preserving near-dups") {
    val found = MinHash.nearDupPairs(docs, "doc_id", "text",
      numHashes = 32, bands = 8, shingleK = 3, threshold = 0.6)
    // shingle-LSH recall is governed by shingle (order-sensitive) overlap,
    // so we only assert soundness here: all outputs verified ≥ threshold
    assert(found.filter(col("jaccard") < 0.6).count() === 0)
  }

  test("simhash: permutation-invariant, near-dups closer than random pairs") {
    import spark.implicits._
    val fp = Seq(
      ("join filter window row stream", 1L),
      ("stream row window filter join", 2L), // same token set, new order
      ("completely different vocabulary here now", 3L))
      .toDF("text", "id")
      .select(col("id"), SimHash.simhash(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L), "token-set simhash must ignore order")
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) > 10,
      "unrelated docs should differ in many bits")

    val dupHam = MinHash.nearDupPairs(docs, "doc_id", "text",
        numHashes = 32, bands = 8, shingleK = 1, threshold = 0.8)
      .select("id_a", "id_b")
      // materialize ONCE: the r16 driver run threw inside the avg action
      // below (VERIFY_r16 tests_ok:false, exception truncated) — pinning
      // the pair set first separates "detector found nothing" (explicit
      // assert) from a genuine avg failure, and the checkpoint keeps the
      // banded-LSH plan from re-executing under the join
      .localCheckpoint()
    assert(dupHam.count() > 0, "corpus must contain banded near-dup pairs")
    val withFp = docs.select(col("doc_id"), SimHash.simhash(col("text")).as("fp"))
    val avgRow = dupHam.join(withFp.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("fp", "fp_a"), Seq("id_a"))
      .join(withFp.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("fp", "fp_b"), Seq("id_b"))
      .agg(avg(SimHash.hamming(col("fp_a"), col("fp_b")))).head
    assert(!avgRow.isNullAt(0), "avg hamming must be defined (join non-empty)")
    val dupAvg = avgRow.getDouble(0)
    assert(dupAvg < 12, s"avg hamming of near-dups was $dupAvg")
  }

  test("simhash multi-block candidates have FULL recall (pigeonhole)") {
    // ≤ maxHamming differing bits touch ≤ maxHamming of the maxHamming+1
    // blocks, so one block always matches: candidate recall is guaranteed
    // 1.0, and exact verification makes precision 1.0 — the result must
    // EQUAL the brute-force hamming join, not just approximate it.
    val withFp = docs.select(col("doc_id"), SimHash.simhash(col("text")).as("fp"))
    val truth = withFp.alias("a").join(withFp.alias("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        SimHash.hamming(col("a.fp"), col("b.fp")).as("hamming"))
      .filter(col("hamming") <= 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = SimHash.nearDupPairs(docs, "doc_id", "text", maxHamming = 8)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "corpus should contain simhash-close pairs")
    assert(found === truth,
      s"blocked join must equal brute force: missed=${truth.diff(found).size} " +
        s"extra=${found.diff(truth).size}")
  }

  test("LSH-bucketed embedding near-dup pairs: exact verify + planted recall") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    // plant exact-direction duplicates: scaled copies share every sign
    // bucket with their original, so those pairs MUST be recalled (cosine
    // is scale-invariant ⇒ planted cosine = 1.0 ≥ any threshold)
    val ids = emb.select("vec_id").collect().map(_.getLong(0))
    val offset = ids.max + 1
    val planted = emb.select((col("vec_id") + offset).as("vec_id"),
      transform(col("embedding").cast("array<double>"), x => x * 0.5)
        .as("embedding"))
    val corpus = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding")).union(planted)
    val pairs = Ann.lshNearDupPairs(corpus, dim, threshold = 0.9).cache()
    val found = pairs.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expectedPlanted = ids.map(i => (i, i + offset)).toSet
    assert(expectedPlanted.subsetOf(found),
      s"all ${ids.length} planted dup pairs must surface; missed " +
        s"${expectedPlanted.diff(found).size}")
    // precision 1: verification is exact, nothing below threshold survives
    assert(pairs.filter(col("cosine") < 0.9).count() === 0)
    // THE scale property: candidate volume must be a sliver of C(n,2) —
    // round 2 shipped a 4-bit parameterization where 64% of all pairs
    // collided (an all-pairs join in disguise); this assertion makes that
    // class of regression impossible to land silently.
    val n = corpus.count().toDouble
    val nCandidates = Ann.lshCandidatePairs(corpus, dim).count().toDouble
    val allPairs = n * (n - 1) / 2.0
    assert(nCandidates <= 0.02 * allPairs,
      f"candidates must stay subquadratic: $nCandidates%.0f of " +
        f"$allPairs%.0f pairs (${100 * nCandidates / allPairs}%.1f%%)")
  }

  test("dedup candidate stages stay a sliver of all-pairs as the corpus grows") {
    // The subquadratic claim, MEASURED at two corpus sizes rather than
    // argued: the blocked candidate joins that feed the declared dedup
    // pipelines must admit only a few percent of C(n,2) at BOTH scales.
    // A block that stops subdividing (the failure mode of a bounded block
    // key) shows up here as a fraction that grows with n.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      // token-Jaccard block (feeds dedup_clusters): source × length-bucket
      val nDocs = graft.core.Tables.documents(spark, dir).count().toDouble
      val docPairs = nDocs * (nDocs - 1) / 2.0
      val tokenCand = Similarity.tokenJaccardCandidates(spark, dir)
        .count().toDouble
      assert(tokenCand <= 0.05 * docPairs,
        f"$dir: token block admits $tokenCand%.0f of $docPairs%.0f pairs " +
          f"(${100 * tokenCand / docPairs}%.1f%%)")
      // embedding LSH block (the high-threshold embedding dedup path)
      val emb = graft.core.Tables.embeddings(spark, dir)
      val dim = emb.select(size(col("embedding"))).head.getInt(0)
      val nVec = emb.count().toDouble
      val vecPairs = nVec * (nVec - 1) / 2.0
      val lshCand = Ann.lshCandidatePairs(emb, dim).count().toDouble
      assert(lshCand <= 0.02 * vecPairs,
        f"$dir: LSH block admits $lshCand%.0f of $vecPairs%.0f pairs " +
          f"(${100 * lshCand / vecPairs}%.1f%%)")
    }
    // and the LSH block has a subdividing DIAL: doubling the bits per
    // table must cut random-pair collisions multiplicatively — this is
    // what lets bucket granularity track corpus growth at 100 TB
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val coarse = Ann.lshCandidatePairs(emb, dim, nTables = 8, nBits = 8)
      .count().toDouble
    val fine = Ann.lshCandidatePairs(emb, dim, nTables = 8, nBits = 16)
      .count().toDouble
    assert(fine <= coarse / 4.0,
      f"16-bit buckets should be ≫ finer than 8-bit: $fine%.0f vs $coarse%.0f")
  }

  test("k-means IVF build beats the random-sample bootstrap (objective + recall)") {
    // Lloyd iterations over the same broadcast-assignment join the
    // bootstrap uses; both gates below are measured on the sf0.01
    // embeddings (500 × 64-dim unit vectors, k=16, 5 iterations —
    // everything seeded/fixed, so the numbers are deterministic):
    //  1. the spherical k-means OBJECTIVE (mean cosine to assigned
    //     centroid) must improve — Lloyd guarantees monotone improvement,
    //     so a regression here is an implementation bug, not data noise
    //     (measured 0.246 → 0.332);
    //  2. mean recall@20 at equal nprobe over 10 fixed probe queries must
    //     improve — the user-visible payoff (measured 0.38 → 0.46 at
    //     nprobe=4; random 64-dim unit vectors are a HARD instance, the
    //     concentration-of-measure regime documented in Similarity, so
    //     absolute recall stays modest while the relative win is real).
    val dir = "/root/testdata/sf0.01"
    val emb = graft.core.Tables.embeddings(spark, dir)
    val vecs = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v")).localCheckpoint()
    val bootC = vecs.filter(col("vec_id") < 16)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"))
      .localCheckpoint()
    val boot = Ann.ivfAssignWith(vecs, bootC).localCheckpoint()
    val km = Ann.kmeansCentroids(emb, 16, 5).localCheckpoint()
    val kmA = Ann.ivfAssignWith(vecs, km).localCheckpoint()

    val objBoot = Ann.assignmentObjective(boot, bootC)
    val objKm = Ann.assignmentObjective(kmA, km)
    assert(objKm > objBoot,
      f"Lloyd must improve the spherical objective: $objBoot%.4f -> $objKm%.4f")

    val probes = Seq(101L, 202L, 303L, 404L, 55L, 66L, 77L, 88L, 99L, 111L)
    var recBoot = 0.0; var recKm = 0.0
    for (pid <- probes) {
      val p = vecs.filter(col("vec_id") === pid).select("v")
        .head.getSeq[Double](0)
      val truth = Ann.bruteTopK(emb.filter(col("vec_id") =!= pid), p, 20)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      def recall(assigned: org.apache.spark.sql.DataFrame,
          cents: org.apache.spark.sql.DataFrame) =
        Ann.ivfSearchWith(assigned.filter(col("vec_id") =!= pid), cents,
            4, p, 20)
          .select("vec_id").collect().map(_.getLong(0)).toSet
          .intersect(truth).size / 20.0
      recBoot += recall(boot, bootC)
      recKm += recall(kmA, km)
    }
    assert(recKm / probes.size > recBoot / probes.size,
      f"k-means recall@20 (nprobe=4) must beat bootstrap: " +
        f"${recBoot / probes.size}%.3f vs ${recKm / probes.size}%.3f")
  }

  private def bruteEdit(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.alias("a").join(df.alias("b"), col("a.key") < col("b.key"))
      .select(col("a.key").as("key_a"), col("b.key").as("key_b"),
        levenshtein(col("a.name"), col("b.name")).as("dist"))
      .filter(col("dist") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("both exact edit-join schemes EQUAL brute force at k=1..3") {
    // Exactness of the two candidate schemes — segments by pigeonhole
    // (k edits touch ≤ k of the k+1 segments), deletions by the common-
    // subsequence argument (each edit deletes ≤ 1 char per side) — means
    // both must reproduce the brute-force join VERBATIM: on part names
    // (long, wordy, every length-remainder class) and on customer names
    // (the declared query's templated-ID corpus, adversarial for the
    // segment scheme's candidates but never for its correctness).
    def seg(df: org.apache.spark.sql.DataFrame, k: Int) =
      Similarity.editDistancePairsSegments(df, "key", "name", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    def del(df: org.apache.spark.sql.DataFrame, k: Int) =
      Similarity.editDistancePairsDeletions(df, "key", "name", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    val part = graft.core.Tables.part(spark, sfDir)
      .select(col("p_partkey").as("key"), col("p_name").as("name"))
    for (k <- 1 to 3) {
      val t = bruteEdit(part, k)
      assert(t.nonEmpty, s"part fixture should contain ed<=$k pairs")
      val s = seg(part, k)
      assert(s === t, s"segments, part k=$k: missed=${t.diff(s).size} extra=${s.diff(t).size}")
      if (k <= 2) { // deletion fan-out is (len choose k) — the short-k scheme
        val d = del(part, k)
        assert(d === t, s"deletions, part k=$k: missed=${t.diff(d).size} extra=${d.diff(t).size}")
      }
    }
    val cust = graft.core.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("key"), col("c_name").as("name"))
    val t = bruteEdit(cust, 1)
    val (s, d) = (seg(cust, 1), del(cust, 1))
    assert(s === t, s"segments, customer k=1: missed=${t.diff(s).size} extra=${s.diff(t).size}")
    assert(d === t, s"deletions, customer k=1: missed=${t.diff(d).size} extra=${d.diff(t).size}")
  }

  test("both edit-join schemes cover degenerate inputs (empty/short strings)") {
    // ADVICE r6: the segment probe's indexed-length enumeration floored at
    // 1, so every pair involving an EMPTY string was silently missed
    // (("", "a") at k=1) while all non-empty inputs stayed exact. The fix
    // floors the probe at length 0 — pinned by brute-force equality over a
    // fixture dense in degenerate lengths (empties, single chars, strings
    // shorter than k+1, a duplicate empty), for both schemes.
    import spark.implicits._
    val strs = Seq("", "a", "b", "ab", "ba", "abc", "x", "xy", "", "abcd")
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("key", "name")
    for (k <- 1 to 3) {
      val t = bruteEdit(df, k)
      assert(t.exists { case (a, b, _) =>
        strs(a.toInt).isEmpty || strs(b.toInt).isEmpty },
        s"fixture must exercise empty-string pairs at k=$k")
      val s = Similarity.editDistancePairsSegments(df, "key", "name", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
      assert(s === t,
        s"segments k=$k: missed=${t.diff(s).size} extra=${s.diff(t).size}")
      val d = Similarity.editDistancePairsDeletions(df, "key", "name", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
      assert(d === t,
        s"deletions k=$k: missed=${t.diff(d).size} extra=${d.diff(t).size}")
    }
  }

  test("segment-scheme candidates track the answer on content-distributed strings") {
    // The complement of the deletion-scheme property below: on a corpus
    // whose discriminative content is spread through the string (part
    // names — natural-text-like), the PassJoin segment candidates must be
    // ANSWER-proportional at k=3 across a 10× corpus growth. Measured
    // ratios: cand/answer 4.85 (sf0.001) → 5.35 (sf0.01). NOTE the honest
    // part: part's TRUE ed≤3 answer is itself Θ(n²) (vocabulary
    // saturation, measured in round 6), so candidates here are also Θ(n²)
    // — answer-proportionality is exactly the right bound for an EXACT
    // join (the verify must touch every true pair anyway); no candidate
    // scheme can beat a quadratic answer. The scheme's failure mode
    // (template-aligned corpora) is pinned by the deletion-scheme test.
    val ratios = for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
      yield {
        val part = graft.core.Tables.part(spark, dir)
          .select(col("p_partkey").as("key"), col("p_name").as("name"))
        val cand = Similarity
          .editDistanceSegmentCandidates(part, "key", "name", 3).count()
        val ans = Similarity
          .editDistancePairsSegments(part, "key", "name", 3).count()
        assert(ans > 0)
        cand.toDouble / ans
      }
    assert(ratios.forall(_ < 8.0),
      s"segment candidates must stay answer-proportional: $ratios")
    // the ratio must not blow up with corpus growth (10× rows)
    assert(ratios(1) < ratios(0) * 1.5,
      s"candidate/answer ratio must stay bounded under growth: $ratios")
  }

  test("deletion-scheme candidates track the true pair count, not C(n,2)") {
    // THE scale property of the declared sim_edit_join: deletion-variant
    // buckets only collide for near-copies, so candidate volume is
    // proportional to the ANSWER even on this shared-template corpus —
    // where the segment scheme measurably degenerates to all pairs (every
    // c_name shares the constant "Customer#" segment). Measured at two
    // corpus sizes: the candidate/answer ratio must stay bounded as n
    // grows 10x and candidates must stay a sliver of C(n,2).
    val ratios = for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
      yield {
        val cust = graft.core.Tables.customer(spark, dir)
          .select(col("c_custkey").as("key"), col("c_name").as("name"))
        val n = cust.count().toDouble
        val cand = Similarity
          .editDistanceDeletionCandidates(cust, "key", "name", 1)
          .count().toDouble
        val answer = Similarity
          .editDistancePairsDeletions(cust, "key", "name", 1)
          .count().toDouble
        assert(answer > 0, s"$dir: fixture should contain ed<=1 pairs")
        assert(cand <= n * (n - 1) / 2.0 * 0.25,
          f"$dir: candidates $cand%.0f vs C(n,2)=${n * (n - 1) / 2}%.0f")
        cand / answer
      }
    assert(ratios.forall(_ <= 4.0),
      s"candidate/answer ratio must stay bounded: $ratios")
    assert(ratios(1) <= ratios(0) * 2.0,
      s"ratio must not grow with the corpus: $ratios")
  }

  test("IVF ANN reaches reasonable recall vs brute force") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val probe = emb.filter(col("vec_id") === 7)
      .select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0).toSeq
    val exact = Ann.bruteTopK(emb, probe, 10).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val assigned = Ann.ivfAssign(emb, nCentroids = 16).cache()
    val approx = Ann.ivfSearch(assigned, 16, nprobe = 8, probe, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 = $recall with nprobe=8/16")
    // the probe's own vector lives in some list and must be findable
    assert(approx.contains(7L))
  }

  test("ivfSearchBatch reproduces the single-probe search per qid") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val vecs = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v")).localCheckpoint()
    val cents = Ann.bootstrapCentroids(vecs, 16).localCheckpoint()
    val assigned = Ann.ivfAssignWith(vecs, cents).localCheckpoint()
    val qids = Seq(3L, 57L, 101L, 444L)
    val probes = vecs.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("v").as("pv"))
    val batch = Ann.ivfSearchBatch(assigned, cents, nprobe = 3, probes, k = 10)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getInt(3))))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).sortBy(_._3) }
    for (pid <- qids) {
      val p = vecs.filter(col("vec_id") === pid).select("v")
        .head.getSeq[Double](0)
      val single = Ann.ivfSearchWith(assigned, cents, 3, p, 10).collect()
        .zipWithIndex
        .map { case (r, i) => (r.getLong(0), r.getDouble(1), i + 1) }
      assert(batch(pid).toSeq == single.toSeq,
        s"batch result for qid=$pid must equal the single-probe search")
    }
  }

  test("hyperplane-LSH ANN finds the probe and reaches reasonable recall") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val probe = emb.filter(col("vec_id") === 7)
      .select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0).toSeq
    val exact = Ann.bruteTopK(emb, probe, 10).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val approx = Ann.lshSearch(emb, probe, 10, nTables = 12, nBits = 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(approx.contains(7L), "identical vector must share every bucket")
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"LSH recall@10 = $recall (12 tables x 5 bits)")
  }
}
