package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Binary quantization (SURVEY B9 ANN family, [[Bq]]): sign-exact packing
  * (cluster expression ≡ driver twin ≡ brute-force signs), Hamming
  * arithmetic exactness, shortlist recall with an exact full-depth rerank,
  * the lambda-free codegen plan shape, and measured on-disk compression —
  * the 1-bit end of the PQ/SQ8/BQ quantization spectrum.
  */
class BqSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // unit-normalized corpus — cosine ranking == dot ranking (the SqSpec /
  // PqSpec deployment shape); sign pattern is unchanged by the positive
  // per-vector norm, so signatures match the raw corpus' exactly
  private lazy val emb = {
    val v = col("embedding").cast("array<double>")
    val norm = sqrt(graft.sim.VectorMath.dot(v, v))
    graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(v, x => x / norm).as("embedding"))
      .localCheckpoint()
  }
  private lazy val enc = Bq.encode(emb, 64).localCheckpoint()

  private def vecOf(id: Long): Seq[Double] =
    emb.filter(col("vec_id") === id)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)

  test("encode: one word for 64 dims, bit i == sign of dim i, and the " +
      "driver-side signature twin is bit-identical to the cluster path") {
    assert(Bq.words(64) === 1)
    assert(Bq.words(65) === 2)
    assert(Bq.words(1) === 1)
    val sigs = enc.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val vs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(sigs.keySet === vs.keySet)
    for ((id, sig) <- sigs) {
      assert(sig.length === 1, s"vec $id")
      assert(sig === Bq.signature(vs(id)), s"vec $id driver twin diverged")
      (0 until 64).foreach { i =>
        val bit = (sig.head >>> i) & 1L
        assert((bit == 1L) === (vs(id)(i) >= 0), s"vec $id dim $i")
      }
    }
  }

  test("multi-word packing: dims beyond 64 land in later words with the " +
      "same sign rule (cluster == driver on a 130-dim vector)") {
    import spark.implicits._
    val v = (0 until 130).map(i => if (i % 3 == 0) -1.0 else 1.0)
    val df = Seq((0L, v)).toDF("vec_id", "embedding")
    val sig = Bq.encode(df, 130).collect()(0).getSeq[Long](1)
    assert(sig.length === Bq.words(130) && sig.length === 3)
    assert(sig === Bq.signature(v))
    v.indices.foreach { i =>
      val bit = (sig(i / 64) >>> (i % 64)) & 1L
      assert((bit == 1L) === (v(i) >= 0), s"dim $i")
    }
  }

  test("hamming: the packed xor/popcount sum equals the brute-force " +
      "sign-disagreement count, for every corpus vector") {
    val probe = vecOf(17L)
    val got = Bq.topK(enc, Bq.signature(probe), Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for ((id, v) <- vs) {
      val brute = v.indices.count(i => (v(i) >= 0) != (probe(i) >= 0))
      assert(got(id) === brute, s"vec $id")
    }
  }

  test("retrieval: Hamming shortlist recall measured, and full-depth " +
      "rerank IS the exact scan") {
    val probes = Seq(17L, 42L, 123L, 321L, 499L)
    val n = emb.count().toInt
    // shortlist recall: does the exact top-10 survive into a 50-deep
    // Hamming shortlist? (the two-stage deployment question — NOT sign
    // ranking quality alone)
    val recalls = probes.map { id =>
      val probe = vecOf(id)
      val exact = Ann.bruteTopK(emb, probe, 10)
        .collect().map(_.getLong(0)).toSet
      val short = Bq.topK(enc, Bq.signature(probe), 50)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(short).size / 10.0
    }
    info(f"BQ shortlist recall@10 (depth 50) per probe: ${recalls.mkString(", ")}")
    info(f"mean: ${recalls.sum / recalls.size}%.3f")
    // 1 bit/dim on random 64-dim unit vectors is the documented
    // worst-case geometry (the PqSpec posture): gate loosely below
    // measured — the exactness story is the rerank, not the shortlist
    assert(recalls.sum / recalls.size >= 0.3,
      s"BQ shortlist recall collapsed: $recalls")
    for (id <- probes.take(2)) {
      val exact = Ann.bruteTopK(emb, vecOf(id), 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val full = Bq.topKRerank(enc, emb, vecOf(id), 10, rerank = n)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(full.map(_._1) === exact.map(_._1), s"probe $id ids")
      full.zip(exact).foreach { case ((_, a), (_, b)) =>
        assert(math.abs(a - b) < 1e-12, s"probe $id cosine") }
    }
  }

  test("the BQ scan plan: lambda-free codegen'd bit_count(xor) + " +
      "TakeOrderedAndProject") {
    val df = Bq.topK(enc, Bq.signature(vecOf(17L)), 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("bit_count"))
    assert(!plan.contains("lambdafunction"),
      "the scan must not introduce HOF lambdas")
  }

  test("encode is map-only: no exchange anywhere in the encode plan") {
    val df = Bq.encode(graft.core.Tables.embeddings(spark, sfDir), 64)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
  }

  test("measured on-disk compression: one long per vector, well under " +
      "the floats AND under the SQ8 codes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bq").toString
    emb.write.mode("overwrite").parquet(s"$dir/floats")
    enc.write.mode("overwrite").parquet(s"$dir/sigs")
    Sq.encode(emb, Sq.train(emb)).write.mode("overwrite")
      .parquet(s"$dir/sq")
    def bytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(spark.sessionState.newHadoopConf())
        .getContentSummary(path).getLength
    }
    val f = bytes(s"$dir/floats"); val b = bytes(s"$dir/sigs")
    val s8 = bytes(s"$dir/sq")
    info(f"floats $f B, sq8 $s8 B, bq $b B — ${f.toDouble / b}%.1fx vs floats")
    assert(b * 4 < f, s"expected >=4x measured compression vs floats: $f vs $b")
    assert(b < s8, s"BQ must beat SQ8 on disk: $s8 vs $b")
  }
}
