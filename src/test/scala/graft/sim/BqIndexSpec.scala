package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The BQ prefilter store inside the persisted IVF index
  * ([[Pq.writeIndex]](bqPrefilter) / [[Pq.probeIndexTopKBqSq]]): the
  * fully-quantized cheapest-first scan — full depth provably equals the
  * one-stage IVF-SQ scan, shortlist recall measured at working depth,
  * appends stay uniform (and dim-mismatched shards fail loudly), loud
  * refusal without the stores, and the Hamming stage keeps the static
  * partition prune. */
class BqIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val emb = {
    val v = col("embedding").cast("array<double>")
    val norm = sqrt(graft.sim.VectorMath.dot(v, v))
    graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(v, x => x / norm).as("embedding"))
      .localCheckpoint()
  }

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_bqidx").toString
    Pq.writeIndex(emb, d, mSub = 8, k = 16, nCentroids = 8,
      sqRefine = true, bqPrefilter = true)
    d
  }

  private def vecOf(id: Long): Seq[Double] =
    emb.filter(col("vec_id") === id)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("full-depth BQ→SQ equals the one-stage IVF-SQ scan — ids AND " +
      "cosines (the shortlist stops binding once it covers the lists)") {
    val n = emb.count().toInt
    for (id <- Seq(17L, 123L)) {
      val full = rows(Pq.probeIndexTopKBqSq(spark, dir, vecOf(id), 10,
        nprobe = 3, rerank = n))
      val oneStage = rows(Pq.probeIndexTopKSq(spark, dir, vecOf(id), 10,
        nprobe = 3))
      assert(full === oneStage, s"probe $id")
    }
  }

  test("working-depth shortlist recall vs the one-stage scan, measured") {
    val probes = Seq(17L, 42L, 123L, 321L, 499L)
    val recalls = probes.map { id =>
      val want = Pq.probeIndexTopKSq(spark, dir, vecOf(id), 10, nprobe = 3)
        .collect().map(_.getLong(0)).toSet
      val got = Pq.probeIndexTopKBqSq(spark, dir, vecOf(id), 10,
          nprobe = 3, rerank = 50)
        .collect().map(_.getLong(0)).toSet
      want.intersect(got).size / 10.0
    }
    info(f"BQ→SQ recall@10 (depth 50) per probe: ${recalls.mkString(", ")}")
    info(f"mean: ${recalls.sum / recalls.size}%.3f")
    assert(recalls.sum / recalls.size >= 0.3,
      s"BQ shortlist collapsed: $recalls")
  }

  test("appends carry the signature uniformly (self-retrieval through " +
      "the BQ stage) and a dim-mismatched shard fails LOUDLY") {
    import spark.implicits._
    val d2 = java.nio.file.Files.createTempDirectory("graft_bqidx2").toString
    Pq.writeIndex(emb, d2, mSub = 8, k = 16, nCentroids = 8,
      sqRefine = true, bqPrefilter = true)
    val novel = emb.filter(col("vec_id") === 17L)
      .select(lit(100000L).as("vec_id"), reverse(col("embedding"))
        .as("embedding")).localCheckpoint()
    Pq.appendIndex(novel, d2)
    val probe = novel.select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    val top = Pq.probeIndexTopKBqSq(spark, d2, probe, 1, nprobe = 1,
      rerank = 10).head()
    assert(top.getLong(0) === 100000L, "appended vector self-retrieves")
    val bad = Seq((200000L, (0 until 32).map(_.toDouble)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pq.appendIndex(bad, d2)
    }
    assert(e.getMessage.contains("dim mismatch"))
  }

  test("loud refusal: an index without the BQ store rejects the BqSq " +
      "probe by name") {
    val d3 = java.nio.file.Files.createTempDirectory("graft_bqidx3").toString
    Pq.writeIndex(emb, d3, mSub = 8, k = 16, nCentroids = 8,
      sqRefine = true)
    val e = intercept[IllegalArgumentException] {
      Pq.probeIndexTopKBqSq(spark, d3, vecOf(17L), 5, 1, 10)
    }
    assert(e.getMessage.contains("no BQ prefilter store"))
  }

  test("the Hamming stage keeps the static partition prune and stays " +
      "lambda-free codegen") {
    val probe = vecOf(17L)
    val root = graft.core.Versioned.resolveRoot(spark, dir)
    val df = spark.read.parquet(s"$root/codes")
      .filter(col("centroid_id").isin(0, 1))
      .select(col("vec_id"),
        Bq.hammingToProbe(col("sig"), Bq.signature(probe)).as("hamming"))
      .orderBy(asc("hamming"), asc("vec_id")).limit(50)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters: [") && l.contains("centroid_id")),
      s"expected a centroid_id partition filter:\n$plan")
    assert(plan.contains("bit_count"))
    assert(!plan.contains("lambdafunction"))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("the BATCHED BqSq probe equals the single-probe scan per probe — " +
      "ids, cosines AND ranks (the plan changes, the answer doesn't)") {
    val pids = Seq(17L, 42L, 123L)
    val probesDf = emb.filter(col("vec_id").isin(pids: _*))
    val batch = Pq.probeIndexTopKBqSqBatch(spark, dir, probesDf, 10,
        nprobe = 3, rerank = 50)
      .collect().groupBy(_.getLong(0))
      .map { case (pid, rs) =>
        pid -> rs.sortBy(_.getInt(3)).map(r =>
          (r.getLong(1), r.getDouble(2))).toSeq
      }
    for (id <- pids) {
      val single = rows(Pq.probeIndexTopKBqSq(spark, dir, vecOf(id), 10,
        nprobe = 3, rerank = 50))
      assert(batch(id) === single, s"probe $id")
    }
  }

  test("compaction carries the BQ store: probe identical pre/post") {
    val probe = vecOf(42L)
    val before = rows(Pq.probeIndexTopKBqSq(spark, dir, probe, 10, 3, 50))
    Pq.compactIndex(spark, dir)
    val after = rows(Pq.probeIndexTopKBqSq(spark, dir, probe, 10, 3, 50))
    assert(after === before)
  }
}
