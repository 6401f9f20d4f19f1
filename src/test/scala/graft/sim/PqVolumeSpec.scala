package graft.sim

import org.apache.spark.sql.functions._
import graft.{PqVolume, SparkSpec}

/** CI-scale gate for the PQ volume proof ([[graft.PqVolume]], committed
  * artifact dev/pq_volume.json): the planted-copy retrieval contract must
  * hold on the generated corpus — each held-out scaled copy's true cosine
  * top-1 over the index is its base by construction (identical direction
  * after normalization), and PQ must find it.
  *
  * Measured at this scale AND at 1M (the artifact): recall@1 = 1.0. The
  * gate sits at 0.9: random hash-derived directions are near-orthogonal in
  * 64 dims, so the base's ADC score dominates unless the encode/LUT path
  * is broken — a collapse reads ~1/n, not 0.9.
  */
class PqVolumeSpec extends SparkSpec {

  test("PQ volume contract at CI scale: planted-copy recall@1, batched " +
      "flat scan and pruned index probe agree") {
    val n = 20000L
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pqvol_ci").toString
    val all = PqVolume.corpus(spark, n).localCheckpoint()
    val base = all.filter(col("vec_id") % 10 =!= 3)
    Pq.writeIndex(base, s"$dir/pqidx", PqVolume.M, PqVolume.K,
      PqVolume.NCentroids, routerIters = 2, pqIters = 2)

    val sample = all.filter(col("vec_id") % 10 === 3)
      .filter(col("vec_id") % 100 === 3).limit(20)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toSeq
    val root = graft.core.Versioned.resolveRoot(spark, s"$dir/pqidx")
    val cb = spark.read.parquet(s"$root/codebooks").localCheckpoint()
    val cents = spark.read.parquet(s"$root/centroids").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1))).toSeq
    val codes = spark.read.parquet(s"$root/codes")
      .select("vec_id", "codes", "centroid_id").localCheckpoint()
    val luts = sample.map { case (_, v) => Pq.lutFor(cb, v, PqVolume.M) }
    val offs = sample.map { case (_, v) => PqVolume.offsetsFor(cents, v) }
    val top1 = PqVolume.batchedTop1(codes, luts, offs).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val recall = sample.zipWithIndex.count { case ((pid, _), i) =>
      top1(i) == pid - 3 }.toDouble / sample.size
    info(f"batched flat recall@1: $recall%.3f over ${sample.size} probes")
    assert(recall >= 0.9, s"PQ retrieval collapsed: $recall")

    // the pruned index probe agrees with the flat scan's verdicts on a
    // handful (nprobe=4 of 64 lists — the copy's base list is rank 1 by
    // construction, so pruning must not lose it)
    sample.take(3).zipWithIndex.foreach { case ((pid, v), i) =>
      val got = Pq.probeIndexTopK(spark, s"$dir/pqidx", v, 1, nprobe = 4)
        .head().getLong(0)
      assert(got === top1(i), s"probe $pid: pruned ≠ flat")
    }
  }
}
