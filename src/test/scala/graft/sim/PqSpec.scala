package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Product quantization (SURVEY B9.39, [[Pq]]): build determinism, code
  * validity, Lloyd monotonicity, ADC arithmetic exactness against a
  * driver-side reconstruction, retrieval quality vs the exact scan, and
  * the TakeOrdered + codegen plan shape of the PQ scan.
  */
class PqSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val M = 8
  private val K = 16

  // unit-normalized corpus: cosine ranking == dot ranking, so the exact
  // scan (cosine) and the ADC scan (dot) grade the same ground truth —
  // normalize-then-dot is the standard cosine-ANN deployment shape
  private lazy val emb = {
    val v = col("embedding").cast("array<double>")
    val norm = sqrt(graft.sim.VectorMath.dot(v, v))
    graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(v, x => x / norm).as("embedding"))
      .localCheckpoint()
  }
  private lazy val cb = Pq.codebooks(emb, M, K, iters = 3).localCheckpoint()
  private lazy val enc = Pq.encode(emb, cb, M).localCheckpoint()

  private def vecOf(id: Long): Seq[Double] =
    emb.filter(col("vec_id") === id)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)

  test("codebook build is deterministic and densely coded") {
    val again = Pq.codebooks(emb, M, K, iters = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Double](2).toList)).toSet
    assert(rows(cb) === rows(again))
    // dense 0..K_m-1 per subspace, all M subspaces present
    val byM = cb.collect().map(r => (r.getInt(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
    assert(byM.keySet === (0 until M).toSet)
    byM.values.foreach(codes => assert(codes === codes.indices.toList))
  }

  test("codes are valid and the index row is M small ints") {
    val km = cb.groupBy("m").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bad = enc.select(col("vec_id"), posexplode(col("codes")))
      .collect().filter { r =>
        val m = r.getInt(1); val c = r.getInt(2)
        c < 0 || c >= km(m)
      }
    assert(bad.isEmpty)
    assert(enc.select(size(col("codes"))).distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(M))
    assert(enc.count() === emb.count())
  }

  test("fixed Lloyd iterations do not increase quantization error") {
    val mse1 = Pq.quantizationMse(emb, Pq.codebooks(emb, M, K, iters = 1), M)
    val mse3 = Pq.quantizationMse(emb, cb, M)
    info(f"per-subvector MSE: 1 iter $mse1%.5f, 3 iters $mse3%.5f")
    assert(mse3 <= mse1 + 1e-12)
  }

  test("ADC score equals the reconstructed dot product exactly " +
      "(same lookup arithmetic, driver-side recomputation)") {
    val probe = vecOf(17L)
    val lut = Pq.lutFor(cb, probe, M)
    val width = lut.length / M
    val scored = Pq.topK(enc, cb, probe, M, k = 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val codes = enc.collect().map(r =>
      r.getLong(0) -> r.getSeq[Int](1)).toMap
    for ((id, cs) <- codes) {
      val expected = cs.zipWithIndex.map { case (c, m) => lut(m * width + c) }
        .foldLeft(0.0)(_ + _)
      assert(scored(id) === expected, s"vec $id")
    }
  }

  test("PQ retrieval finds the exact scan's neighbors (recall gate) and " +
      "ranks the probe's own vector first") {
    val probes = Seq(17L, 42L, 123L, 321L, 499L)
    val recalls = probes.map { id =>
      val probe = vecOf(id)
      val exact = Ann.bruteTopK(emb, probe, 10)
        .collect().map(_.getLong(0)).toSet
      val approx = Pq.topK(enc, cb, probe, M, 10)
        .collect().map(_.getLong(0)).toSet
      val pqTop = Pq.topK(enc, cb, probe, M, 1).head().getLong(0)
      assert(pqTop === id,
        s"probe $id: its own (exactly reconstructible) codes must rank first")
      exact.intersect(approx).size / 10.0
    }
    info(f"recall@10 per probe: ${recalls.mkString(", ")}")
    info(f"mean recall@10: ${recalls.sum / recalls.size}%.3f")
    // Measured 0.300 mean at M=8, K=16, iters=3 on the 500 random unit
    // vectors (deterministic — seeded init, fixed iterations). Random
    // i.i.d. data is PQ's worst case (no cluster structure; the 10
    // nearest sit barely closer than the bulk), so 0.30 is the expected
    // regime, not a defect — the gate guards against COLLAPSE (a broken
    // LUT or encode scores ~uniformly: recall ≈ k/n = 0.02), with
    // headroom below the measured value for benign parameter drift.
    assert(recalls.sum / recalls.size >= 0.2,
      s"PQ recall collapsed: $recalls")
  }

  test("IVF×PQ: probing every list equals the flat PQ scan; a narrow " +
      "probe still self-retrieves") {
    val nCentroids = 16
    val centroids = Ann.kmeansCentroids(emb, nCentroids, iters = 2)
      .localCheckpoint()
    val assigned = Ann.ivfAssignWith(
        emb.select(col("vec_id"), col("embedding").as("v")), centroids)
      .select("vec_id", "centroid_id").localCheckpoint()
    val probe = vecOf(42L)
    val flat = Pq.topK(enc, cb, probe, M, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = Pq.ivfPqTopK(enc, assigned, centroids, cb, probe, M, 10,
        nprobe = nCentroids)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full === flat, "probing all lists must equal the flat scan")
    // rank-1 probe list == the arg-max assignment (Ann.probeOrder), so
    // the probe vector's own list is always scanned even at nprobe=1
    val narrow = Pq.ivfPqTopK(enc, assigned, centroids, cb, probe, M, 1,
        nprobe = 1)
      .head().getLong(0)
    assert(narrow === 42L)
  }

  test("persisted index: probe ≡ in-memory IVFADC; frozen-model append ≡ " +
      "building over the union; static centroid prune; monotonic guard") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pq_index").toString
    val base = emb.filter(col("vec_id") < 450).localCheckpoint()
    val shard = emb.filter(col("vec_id") >= 450).localCheckpoint()
    Pq.writeIndex(base, dir, M, K, nCentroids = 16)
    val probe = vecOf(42L)

    // probe over the base index ≡ the in-memory residual composition on
    // the same frozen models (read from the PUBLISHED version root)
    val root = graft.core.Versioned.resolveRoot(spark, dir)
    val cbB = spark.read.parquet(s"$root/codebooks").localCheckpoint()
    val centB = spark.read.parquet(s"$root/centroids").localCheckpoint()
    val encB = Pq.encodeResidual(base, centB, cbB, M)
    val mem = Pq.ivfPqTopKResidual(encB, centB, cbB, probe, M, 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val idx = Pq.probeIndexTopK(spark, dir, probe, 10, nprobe = 4)
    val got = idx.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) === mem.map(_._1))
    got.zip(mem).foreach { case ((_, s1), (_, s2)) =>
      assert(math.abs(s1 - s2) < 1e-9) }

    // the codes scan is statically pruned to the probed centroids
    val plan = idx.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(l =>
      l.contains("PartitionFilters: [") && l.contains("centroid_id")
        && (l.contains("IN (") || l.contains(" = ")))
    assert(pf.isDefined, s"expected a static centroid_id prune:\n" +
      plan.linesIterator.take(25).mkString("\n"))

    // frozen-model append: fold the shard in, then the probe over the
    // grown index equals encoding base ∪ shard with the SAME models
    Pq.appendIndex(shard, dir)
    val encAll = Pq.encodeResidual(emb, centB, cbB, M)
    val memAll = Pq
      .ivfPqTopKResidual(encAll, centB, cbB, probe, M, 10, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val gotAll = Pq.probeIndexTopK(spark, dir, probe, 10, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotAll.map(_._1) === memAll.map(_._1))

    // a replayed shard trips the high-water-mark guard
    val e = intercept[IllegalArgumentException] { Pq.appendIndex(shard, dir) }
    assert(e.getMessage.contains("monotonic-id"))

    // compaction: a fresh version with ONE file per codes partition,
    // probe results identical, append guard still live
    val filesBefore = codesFileCounts(dir)
    assert(filesBefore.values.exists(_ > 1),
      s"append should have fragmented at least one partition: $filesBefore")
    Pq.compactIndex(spark, dir)
    val filesAfter = codesFileCounts(dir)
    assert(filesAfter.values.forall(_ == 1), s"expected 1 file/partition: " +
      s"$filesAfter")
    val gotCompact = Pq.probeIndexTopK(spark, dir, probe, 10, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotCompact === gotAll)
    val e2 = intercept[IllegalArgumentException] { Pq.appendIndex(shard, dir) }
    assert(e2.getMessage.contains("monotonic-id"))
  }

  test("SQ8 refine store: self-contained rerank within the analytic " +
      "error certificate; appends stay refinable; compaction carries it; " +
      "a refine-less index refuses loudly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pq_sqrefine").toString
    val base = emb.filter(col("vec_id") < 450).localCheckpoint()
    val shard = emb.filter(col("vec_id") >= 450).localCheckpoint()
    Pq.writeIndex(base, dir, M, K, nCentroids = 16, sqRefine = true)
    val probe = vecOf(42L)

    // the refine columns are invisible to the ADC pass: the plain probe
    // still equals the in-memory residual composition
    val root = graft.core.Versioned.resolveRoot(spark, dir)
    val cbB = spark.read.parquet(s"$root/codebooks").localCheckpoint()
    val centB = spark.read.parquet(s"$root/centroids").localCheckpoint()
    val mem = Pq.ivfPqTopKResidual(Pq.encodeResidual(base, centB, cbB, M),
        centB, cbB, probe, M, 10, nprobe = 16)
      .collect().map(_.getLong(0)).toSeq
    assert(Pq.probeIndexTopK(spark, dir, probe, 10, nprobe = 16)
      .collect().map(_.getLong(0)).toSeq === mem)

    // full-depth SQ rerank: every returned cosine is within the analytic
    // SQ8 certificate of the true cosine (unit-normalized corpus and
    // probe: |q| = |x| = 1, so the bound is errorBound itself), and
    // recall@10 vs the exact scan is at least the ADC shortlist's
    val p = Sq.train(base) // same deterministic min/max the index froze
    val bound = Sq.errorBound(p, probe) + 1e-12
    val got = Pq.probeIndexTopKRerankSq(spark, dir, probe, 10,
        nprobe = 16, rerank = 450)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val prL = typedLit(probe)
    val exactCos = base
      .filter(col("vec_id").isin(got.map(_._1): _*))
      .select(col("vec_id"), VectorMath.cosine(
        col("embedding").cast("array<double>"), prL).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (id, est) =>
      assert(math.abs(est - exactCos(id)) <= bound,
        f"vec $id: SQ cosine $est%.6f vs exact ${exactCos(id)}%.6f " +
          f"exceeds certificate $bound%.6f") }
    assert(got.head._1 === 42L, "full-depth SQ rerank self-retrieves")
    val exact10 = Ann.bruteTopK(base, probe, 10)
      .collect().map(_.getLong(0)).toSet
    val adc10 = Pq.probeIndexTopK(spark, dir, probe, 10, nprobe = 16)
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet.intersect(exact10).size
      >= adc10.intersect(exact10).size,
      "SQ refine must not lose recall vs the raw ADC ranking")

    // the one-stage IVF-SQ scan mode: same certificate, no shortlist —
    // at full nprobe its top-10 recalls at least as much of the exact
    // top-10 as the coarse ADC ranking, and it self-retrieves
    val sq10 = Pq.probeIndexTopKSq(spark, dir, probe, 10, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(sq10.head._1 === 42L, "IVF-SQ scan self-retrieves")
    sq10.foreach { case (id, est) =>
      assert(math.abs(est - exactCos.getOrElse(id, {
        base.filter(col("vec_id") === id)
          .select(VectorMath.cosine(
            col("embedding").cast("array<double>"), prL)).head().getDouble(0)
      })) <= bound, s"IVF-SQ cosine for $id outside certificate") }
    assert(sq10.map(_._1).toSet.intersect(exact10).size
      >= adc10.intersect(exact10).size,
      "one-stage SQ scan must not lose recall vs coarse ADC")

    // plan: both filters reach the scan — the partition prune AND the
    // pushed shortlist point-lookup
    val sqPlan = Pq.probeIndexTopKRerankSq(spark, dir, probe, 5,
        nprobe = 4, rerank = 20)
      .queryExecution.executedPlan.toString
    assert(sqPlan.linesIterator.exists(l =>
      l.contains("PartitionFilters: [") && l.contains("centroid_id")),
      s"expected a static centroid_id prune:\n$sqPlan")
    assert(sqPlan.linesIterator.exists(l =>
      l.contains("PushedFilters: [") && l.contains("vec_id")),
      s"expected the vec_id shortlist pushed to the scan:\n$sqPlan")

    // frozen-params append: the grown index reranks shard vectors too
    // (uniform schema — no null sq columns), and compaction carries the
    // refine store into the new version unchanged
    Pq.appendIndex(shard, dir)
    val probeS = vecOf(470L)
    val gotS = Pq.probeIndexTopKRerankSq(spark, dir, probeS, 5,
        nprobe = 16, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(gotS.head._1 === 470L, "appended vector self-retrieves via SQ")
    assert(gotS.forall(r => !r._2.isNaN), "no null/NaN refine rows")
    Pq.compactIndex(spark, dir)
    val gotC = Pq.probeIndexTopKRerankSq(spark, dir, probeS, 5,
        nprobe = 16, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(gotC === gotS, "compaction must not change the SQ rerank")

    // an index without the refine store refuses loudly
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_pq_norefine").toString
    Pq.writeIndex(base, dir2, M, K, nCentroids = 4)
    val e = intercept[IllegalArgumentException] {
      Pq.probeIndexTopKRerankSq(spark, dir2, probe, 5, nprobe = 2,
        rerank = 10) }
    assert(e.getMessage.contains("sqRefine"))
  }

  private def codesFileCounts(dir: String): Map[String, Int] = {
    val root = graft.core.Versioned.resolveRoot(spark, dir)
    val codes = new java.io.File(s"$root/codes")
    codes.listFiles().filter(_.isDirectory).map { part =>
      part.getName ->
        part.listFiles().count(_.getName.endsWith(".parquet"))
    }.toMap
  }

  /** Raw-vs-residual A/B at equal (M, K, nprobe=all lists — the
    * comparison isolates the ENCODING; routing reads everything either
    * way). Returns (rawRecall, residualRecall) of mean recall@10 over
    * `probes` against the exact cosine scan. */
  private def abRecall(corpus: org.apache.spark.sql.DataFrame,
      probes: Seq[Long], nCentroids: Int): (Double, Double) = {
    val centroids = Ann.kmeansCentroids(corpus, nCentroids, iters = 2)
      .localCheckpoint()
    val assigned = Ann.ivfAssignWith(
        corpus.select(col("vec_id"), col("embedding").as("v")), centroids)
      .select("vec_id", "centroid_id").localCheckpoint()
    val rawCb = Pq.codebooks(corpus, M, K, iters = 3).localCheckpoint()
    val rawEnc = Pq.encode(corpus, rawCb, M).localCheckpoint()
    val resCb = Pq.residualCodebooks(corpus, centroids, M, K, iters = 3)
      .localCheckpoint()
    val resEnc = Pq.encodeResidual(corpus, centroids, resCb, M)
      .localCheckpoint()
    def pv(id: Long): Seq[Double] =
      corpus.filter(col("vec_id") === id)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
    def recallOf(top: Long => Set[Long]): Double = probes.map { id =>
      val exact = Ann.bruteTopK(corpus, pv(id), 10)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(top(id)).size / 10.0
    }.sum / probes.size
    (recallOf(id => Pq
        .ivfPqTopK(rawEnc, assigned, centroids, rawCb, pv(id), M, 10,
          nCentroids)
        .collect().map(_.getLong(0)).toSet),
      recallOf(id => Pq
        .ivfPqTopKResidual(resEnc, centroids, resCb, pv(id), M, 10,
          nCentroids)
        .collect().map(_.getLong(0)).toSet))
  }

  test("residual (IVFADC) encoding beats raw encoding at equal M, K, " +
      "nprobe on clustered data — and never loses on the random worst " +
      "case — the round-12 quality gate") {
    // MEASURED honestly (round 12): on i.i.d. random unit vectors the
    // router explains no variance (best-centroid cosine ~0.3, so
    // |x − c|² = 2 − 2cos ≈ 1.4 > |x|² = 1 — residuals are LARGER than
    // the vectors) and residual recall equals raw recall exactly (0.300
    // vs 0.300 on this corpus). The IVFADC win (Jégou et al. 2011 §IV)
    // is conditional on cluster structure, which real embedding spaces
    // have and i.i.d. noise deliberately lacks. So the A/B gate runs on
    // a CLUSTERED corpus (20 hash-seeded centers, σ=0.15 noise — tight
    // by embedding standards but far from degenerate), where residual
    // magnitudes shrink ~6× and the same M·K code budget resolves the
    // within-cluster geometry raw encoding spends on cluster position;
    // the random corpus keeps a no-regression assertion.
    val nClusters = 20
    val cid = col("vec_id") % nClusters
    val center = array((1 to 64).map(i =>
      pmod(xxhash64(cid, lit(i)), lit(1000L)).cast("double") / 500.0
        - 1.0): _*)
    val noise = array((1 to 64).map(i =>
      pmod(xxhash64(col("vec_id"), lit(i + 1000)), lit(1000L))
        .cast("double") / 500.0 - 1.0): _*)
    val mixed = zip_with(center, noise, (c, n) => c + lit(0.15) * n)
    val nrm = sqrt(graft.sim.VectorMath.dot(mixed, mixed))
    val clustered = spark.range(500)
      .select(col("id").as("vec_id"),
        transform(mixed, x => x / nrm).as("embedding"))
      .localCheckpoint()
    val probes = Seq(17L, 42L, 123L, 321L, 499L)
    val (cRaw, cRes) = abRecall(clustered, probes, nClusters)
    info(f"clustered corpus — raw: $cRaw%.3f, residual: $cRes%.3f")
    assert(cRes > cRaw,
      f"residual must beat raw on clustered data at equal (M=$M, K=$K): " +
        f"raw $cRaw%.3f vs residual $cRes%.3f")
    val (rRaw, rRes) = abRecall(emb, probes, 16)
    info(f"random corpus — raw: $rRaw%.3f, residual: $rRes%.3f")
    assert(rRes >= rRaw,
      f"residual must not lose on the random worst case: " +
        f"raw $rRaw%.3f vs residual $rRes%.3f")
  }

  test("IVFADC+R: exact re-rank lifts recall above the ADC shortlist's, " +
      "and full-depth re-rank IS the exact scan — the round-12 rerank " +
      "gate") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pq_rerank").toString
    Pq.writeIndex(emb, dir, M, K, nCentroids = 16)
    val probes = Seq(17L, 42L, 123L, 321L, 499L)
    def recallOf(top: Long => Set[Long]): Double = probes.map { id =>
      val exact = Ann.bruteTopK(emb, vecOf(id), 10)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(top(id)).size / 10.0
    }.sum / probes.size
    val adc = recallOf(id =>
      Pq.probeIndexTopK(spark, dir, vecOf(id), 10, nprobe = 16)
        .collect().map(_.getLong(0)).toSet)
    val rr = recallOf(id =>
      Pq.probeIndexTopKRerank(spark, dir, emb, vecOf(id), 10, nprobe = 16,
          rerank = 100)
        .collect().map(_.getLong(0)).toSet)
    info(f"recall@10 — ADC shortlist: $adc%.3f, +exact re-rank: $rr%.3f")
    // code resolution bounds ADC recall (~0.30 on this worst-case
    // corpus); a 100-deep shortlist re-ranked exactly must recover most
    // of it — the gate is strict improvement plus a floor with headroom
    // below the measured value
    assert(rr > adc, f"re-rank must improve on raw ADC: $adc%.3f vs $rr%.3f")
    assert(rr >= 0.6, f"re-rank recall collapsed: $rr%.3f")
    // at rerank = corpus size the shortlist covers everything, so the
    // two-stage scan IS Ann.bruteTopK — ids AND cosines, exactly
    for (id <- probes) {
      val exact = Ann.bruteTopK(emb, vecOf(id), 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val full = Pq.probeIndexTopKRerank(spark, dir, emb, vecOf(id), 10,
          nprobe = 16, rerank = 500)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(full.map(_._1) === exact.map(_._1), s"probe $id ids")
      full.zip(exact).foreach { case ((_, a), (_, b)) =>
        assert(math.abs(a - b) < 1e-12, s"probe $id cosine") }
    }
    // the re-rank float scan is a pushed point-lookup, not a corpus
    // read: vec_id IN (...) reaches the parquet scan
    val raw = graft.core.Tables.embeddings(spark, sfDir)
    val planned = Pq.probeIndexTopKRerank(spark, dir, raw, vecOf(17L), 10,
      nprobe = 16, rerank = 50)
    planned.collect()
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("vec_id"),
      s"expected a pushed vec_id IN shortlist filter:\n" +
        plan.linesIterator.take(20).mkString("\n"))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("codebook training above the sample cap: deterministic hash " +
      "subsample, every row still encodes, retrieval keeps working") {
    val cbS1 = Pq.codebooks(emb, M, K, iters = 2, maxTrain = 100)
      .localCheckpoint()
    val cbS2 = Pq.codebooks(emb, M, K, iters = 2, maxTrain = 100)
    assert(cbS1.collect().map(_.toString).sorted
      === cbS2.collect().map(_.toString).sorted,
      "sampled training must stay deterministic")
    val encS = Pq.encode(emb, cbS1, M).localCheckpoint()
    assert(encS.count() === emb.count(),
      "encoding covers every row, sampled training or not")
    val w = Pq.lutWidth(cbS1)
    assert(encS.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= w).count() === 0L,
      "all codes index real codebook rows")
    // sample-trained codes still self-retrieve: the probe's own row wins
    val probe = vecOf(42L)
    assert(Pq.topK(encS, cbS1, probe, M, 1).head().getLong(0) === 42L)
  }

  test("retraction: tombstoned vectors vanish from every scan mode, " +
      "other results are untouched, compaction makes the drop physical " +
      "and clears the tombstones, replay is a no-op") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pq_retract").toString
    Pq.writeIndex(emb, dir, M, K, nCentroids = 16, sqRefine = true)
    val probe = vecOf(42L)
    val before = Pq.probeIndexTopK(spark, dir, probe, 10, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(before.head._1 === 42L)

    Pq.retract(spark, dir, Seq(42L))
    val after = Pq.probeIndexTopK(spark, dir, probe, 10, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(!after.map(_._1).contains(42L), "retracted id must not surface")
    // exactly the pre-retraction ranking minus the retracted row, plus
    // one promoted tail entry — order and scores of survivors unchanged
    assert(after.take(9) === before.filterNot(_._1 == 42L),
      "surviving results must be untouched")
    assert(!Pq.probeIndexTopKSq(spark, dir, probe, 10, nprobe = 16)
      .collect().map(_.getLong(0)).contains(42L), "SQ scan excludes too")
    assert(!Pq.probeIndexTopKRerankSq(spark, dir, probe, 10, nprobe = 16,
        rerank = 50)
      .collect().map(_.getLong(0)).contains(42L), "SQ rerank excludes too")
    val batch = Pq.probeIndexTopKBatch(spark, dir,
        emb.filter(col("vec_id") === 42L), 10, nprobe = 16)
      .collect().map(_.getLong(1))
    assert(!batch.contains(42L), "batch probe excludes too")

    // replayed retraction is a no-op at verdict level
    Pq.retract(spark, dir, Seq(42L))
    assert(Pq.probeIndexTopK(spark, dir, probe, 10, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === after)

    // compaction: the drop becomes physical, the tombstone set clears,
    // probes unchanged
    val rowsBefore = spark.read.parquet(
      s"${graft.core.Versioned.resolveRoot(spark, dir)}/codes").count()
    Pq.compactIndex(spark, dir)
    val newRoot = graft.core.Versioned.resolveRoot(spark, dir)
    assert(spark.read.parquet(s"$newRoot/codes").count() === rowsBefore - 1,
      "compaction must drop the tombstoned row physically")
    assert(!new java.io.File(s"$newRoot/tombstones").exists(),
      "the new version starts with a clean tombstone set")
    assert(Pq.probeIndexTopK(spark, dir, probe, 10, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === after)
  }

  test("batched index probe: per-probe results exactly equal the " +
      "single-probe scan; the codes read stays statically pruned") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pq_batch").toString
    Pq.writeIndex(emb, dir, M, K, nCentroids = 16)
    val probeIds = Seq(3L, 42L, 101L, 260L, 444L)
    val probes = emb.filter(col("vec_id").isin(probeIds: _*))
      .localCheckpoint()
    val batch = Pq.probeIndexTopKBatch(spark, dir, probes, 10, nprobe = 4)
    val byProbe = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1)
    probeIds.foreach { pid =>
      val single = Pq.probeIndexTopK(spark, dir, vecOf(pid), 10, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = byProbe(pid).sortBy(_._4).map(t => (t._2, t._3)).toSeq
      assert(got.map(_._1) === single.map(_._1), s"probe $pid: ids differ")
      got.zip(single).foreach { case ((_, s1), (_, s2)) =>
        assert(math.abs(s1 - s2) < 1e-9, s"probe $pid: scores differ") }
    }
    // the codes scan carries the static union-of-probed-lists prune
    val plan = Pq.probeIndexTopKBatch(spark, dir, probes, 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters: [") && l.contains("centroid_id")),
      s"expected a static centroid_id prune on the batch scan:\n$plan")
  }

  test("pq_lut: the map-only LUT table equals the driver-side lutFor " +
      "per probe, with no exchange in the plan, and a mis-shaped " +
      "codebook surfaces as NULL") {
    val probes = emb.filter(col("vec_id") < 40)
    val w = Pq.lutWidth(cb)
    val table = Pq.lutTable(
      probes.select(col("vec_id"), col("embedding").as("v")), cb, M, w)
    // no exchange: the LUT is born inside the probe scan stage
    val plan = table.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"lutTable must be map-only:\n$plan")
    // per-row equality with the driver-side single-probe form
    val got = table.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got.size === 40)
    Seq(0L, 7L, 39L).foreach { id =>
      val exp = Pq.lutFor(cb, vecOf(id), M)
      val g = got(id)
      assert(g.length === exp.length, s"probe $id: LUT length")
      g.indices.foreach { i =>
        assert(math.abs(g(i) - exp(i)) < 1e-12,
          s"probe $id slot $i: ${g(i)} vs ${exp(i)}") }
    }
    // a codebook whose flat length does not divide the probe dim → NULL,
    // never a misaligned score; null probe → NULL
    import spark.implicits._
    val bad = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("vec_id", "v")
      .select(org.apache.spark.sql.graftexpr.PqLutExpr.column(
        col("v"), typedLit(Seq(1.0, 2.0, 3.0, 4.0)), lit(1)).as("lut"))
    assert(bad.head().isNullAt(0), "mis-shaped codebook must yield NULL")
    val nul = Seq(Tuple1(Option.empty[Seq[Double]])).toDF("v")
      .select(org.apache.spark.sql.graftexpr.PqLutExpr.column(
        col("v"), typedLit(Seq(1.0, 2.0)), lit(1)).as("lut"))
    assert(nul.head().isNullAt(0), "null probe must yield NULL")
  }

  test("the PQ scan plan: codegen pq_adc + TakeOrderedAndProject") {
    val df = Pq.topK(enc, cb, vecOf(17L), M, 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pq_adc"))
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("lambdafunction"))
  }
}
