package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Scalar quantization (SURVEY B9 ANN family, [[Sq]]): deterministic
  * in-range encoding, the analytic per-dimension error bound, kernel
  * arithmetic exactness, near-exact retrieval with an exact full-depth
  * rerank, the codegen plan shape, and measured on-disk compression.
  */
class SqSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // unit-normalized corpus — cosine ranking == dot ranking, the same
  // deployment shape PqSpec documents
  private lazy val emb = {
    val v = col("embedding").cast("array<double>")
    val norm = sqrt(graft.sim.VectorMath.dot(v, v))
    graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(v, x => x / norm).as("embedding"))
      .localCheckpoint()
  }
  private lazy val params = Sq.train(emb)
  private lazy val enc = Sq.encode(emb, params).localCheckpoint()

  private def vecOf(id: Long): Seq[Double] =
    emb.filter(col("vec_id") === id)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)

  test("encode: deterministic, codes in [0,255], decode within step/2 " +
      "per dimension on in-range data") {
    val again = Sq.encode(emb, Sq.train(emb)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val codes = enc.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes === again)
    val vs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for ((id, cs) <- codes) {
      assert(cs.length === params.dim)
      cs.indices.foreach { i =>
        val c = cs(i)
        assert(c >= 0 && c <= Sq.Levels, s"vec $id dim $i code $c")
        val decoded = params.mins(i) + params.steps(i) * c
        // training data is in-range by construction, so the decode error
        // is at most half a step (plus rounding noise)
        assert(math.abs(decoded - vs(id)(i)) <= params.steps(i) / 2 + 1e-12,
          s"vec $id dim $i")
      }
    }
  }

  test("out-of-range values SATURATE to the trained range — the frozen-" +
      "params contract shard drift relies on: clamped codes, no nulls, " +
      "error bounded by the overshoot") {
    import spark.implicits._
    // params trained on [0, 1] per dim; the shard drifts beyond both ends
    val trainDf = Seq((0L, Seq(0.0, 0.0)), (1L, Seq(1.0, 1.0)))
      .toDF("vec_id", "embedding")
    val p = Sq.train(trainDf)
    val drift = Seq((2L, Seq(-0.7, 1.9)), (3L, Seq(0.5, 0.5)))
      .toDF("vec_id", "embedding")
    val got = Sq.encode(drift, p).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(2L) === Seq(0, 255),
      "below-range clamps to 0, above-range to 255 — never null, never " +
        "out of [0,255]")
    assert(got(3L) === Seq(128, 128), "in-range still rounds normally")
    // decode error of the saturated dims equals the overshoot, and stays
    // bounded: decode(0)=min=0.0 (err 0.7), decode(255)=max=1.0 (err 0.9)
    val dec0 = p.mins(0) + p.steps(0) * got(2L)(0)
    val dec1 = p.mins(1) + p.steps(1) * got(2L)(1)
    assert(math.abs(math.abs(dec0 - (-0.7)) - 0.7) < 1e-12)
    assert(math.abs(math.abs(dec1 - 1.9) - 0.9) < 1e-12)
  }

  test("sq_dot score ≡ offset + Σ weights·codes exactly, and the score " +
      "error vs the exact dot respects the analytic bound") {
    val probe = vecOf(17L)
    val (off, w) = Sq.queryParts(params, probe)
    val scored = Sq.topK(enc, params, probe, k = 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val codes = enc.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val vs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val bound = Sq.errorBound(params, probe)
    info(f"analytic score-error bound for this probe: $bound%.5f")
    for ((id, cs) <- codes) {
      // identical arithmetic sequence driver-side: the kernel folds from
      // 0.0 and the offset adds OUTSIDE (lit(off) + sq_dot), so the
      // recompute must round in that order too
      var s = 0.0
      cs.indices.foreach(i => s += w(i) * cs(i))
      s = off + s
      assert(scored(id) === s, s"vec $id kernel arithmetic")
      val exact = vs(id).indices.foldLeft(0.0)((a, i) =>
        a + probe(i) * vs(id)(i))
      assert(math.abs(scored(id) - exact) <= bound + 1e-12,
        s"vec $id error exceeds the certificate")
    }
  }

  test("retrieval: SQ8 ranking is near-exact at 4x compression, and " +
      "full-depth rerank IS the exact scan") {
    val probes = Seq(17L, 42L, 123L, 321L, 499L)
    val recalls = probes.map { id =>
      val probe = vecOf(id)
      val exact = Ann.bruteTopK(emb, probe, 10)
        .collect().map(_.getLong(0)).toSet
      val approx = Sq.topK(enc, params, probe, 10)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(approx).size / 10.0
    }
    info(f"SQ8 recall@10 per probe: ${recalls.mkString(", ")}")
    info(f"mean: ${recalls.sum / recalls.size}%.3f")
    // 255 levels per dimension ⇒ score error ~3e-2 on unit vectors —
    // orders tighter than PQ's M=8 coding, so ranking is near-exact even
    // on the random worst case (gate with headroom below measured)
    assert(recalls.sum / recalls.size >= 0.8,
      s"SQ8 recall collapsed: $recalls")
    for (id <- probes.take(2)) {
      val exact = Ann.bruteTopK(emb, vecOf(id), 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val full = Sq.topKRerank(enc, emb, params, vecOf(id), 10, rerank = 500)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(full.map(_._1) === exact.map(_._1), s"probe $id ids")
      full.zip(exact).foreach { case ((_, a), (_, b)) =>
        assert(math.abs(a - b) < 1e-12, s"probe $id cosine") }
    }
  }

  test("the SQ scan plan: codegen sq_dot + TakeOrderedAndProject, no " +
      "lambda in the scan stage") {
    val df = Sq.topK(enc, params, vecOf(17L), 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("sq_dot"))
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("lambdafunction"),
      "the scan must not re-introduce HOF lambdas")
  }

  test("measured on-disk compression: int codes well under the floats " +
      "they replace") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sq").toString
    emb.write.mode("overwrite").parquet(s"$dir/floats")
    enc.write.mode("overwrite").parquet(s"$dir/codes")
    def bytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(spark.sessionState.newHadoopConf())
        .getContentSummary(path).getLength
    }
    val f = bytes(s"$dir/floats"); val c = bytes(s"$dir/codes")
    info(f"floats $f B, codes $c B — ${f.toDouble / c}%.1fx")
    assert(c * 2 < f, s"expected >=2x measured compression: $f vs $c")
  }
}
