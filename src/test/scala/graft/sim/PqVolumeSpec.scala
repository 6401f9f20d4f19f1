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

    // IVFADC+R on the volume corpus geometry (round 12): the exact
    // re-rank of a 200-deep ADC shortlist must retrieve at least as much
    // of the true top-10 as the raw ADC ranking it refines
    val rPairs = sample.take(3).map { case (_, v) =>
      val exact = Ann.bruteTopK(base, v, 10).collect()
        .map(_.getLong(0)).toSet
      val a = Pq.probeIndexTopK(spark, s"$dir/pqidx", v, 10,
          nprobe = PqVolume.NCentroids)
        .collect().map(_.getLong(0)).toSet
      val r = Pq.probeIndexTopKRerank(spark, s"$dir/pqidx", base, v, 10,
          nprobe = PqVolume.NCentroids, rerank = 200)
        .collect().map(_.getLong(0)).toSet
      (exact.intersect(a).size / 10.0, exact.intersect(r).size / 10.0)
    }
    val adc10 = rPairs.map(_._1).sum / 3
    val rr10 = rPairs.map(_._2).sum / 3
    info(f"recall@10 — ADC: $adc10%.3f, +rerank(200): $rr10%.3f")
    assert(rr10 >= adc10,
      f"exact re-rank must not lose recall: $adc10%.3f vs $rr10%.3f")

    // residual encoding gives up raw encoding's STRUCTURAL copy→base
    // retrieval (probe and base no longer share codes); the reranked
    // form restores the 1.0 contract — the cosine-1 base wins the exact
    // re-score whenever the shortlist contains it
    val rr1 = sample.take(5).count { case (pid, v) =>
      Pq.probeIndexTopKRerank(spark, s"$dir/pqidx", base, v, 1,
        nprobe = 4, rerank = 100).head().getLong(0) == pid - 3 }
    assert(rr1 === 5,
      s"re-rank must restore every planted copy's base at rank 1: $rr1/5")
  }
}
