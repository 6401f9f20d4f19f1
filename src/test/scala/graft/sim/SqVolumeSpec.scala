package graft.sim

import org.apache.spark.sql.functions._
import graft.{PqVolume, SqVolume, SparkSpec}

/** CI-scale gate for the SQ8 volume proof ([[graft.SqVolume]], committed
  * artifact dev/sq_volume.json): on the same planted geometry as the PQ
  * artifact, the batched `sq_dot` scan must retrieve every held-out
  * copy's base at rank 1 (SQ8 is near-exact — per-dimension error ≤
  * step/2 — so unlike PQ there is no structural excuse below 1.0 here;
  * the gate sits at 0.95 for hash-geometry slack) and recall@10 vs the
  * exact cosine scan must sit near 1 where PQ's coarse codes measure
  * ~0.1 on this geometry.
  */
class SqVolumeSpec extends SparkSpec {

  test("SQ8 volume contract at CI scale: planted-copy recall@1 via the " +
      "batched kernel, near-exact recall@10 vs the exact scan") {
    val n = 20000L
    val all = PqVolume.corpus(spark, n).localCheckpoint()
    val base = all.filter(col("vec_id") % 10 =!= 3).localCheckpoint()
    val p = Sq.train(base)
    val codes = Sq.encode(base, p).localCheckpoint()

    val sample = all.filter(col("vec_id") % 10 === 3)
      .filter(col("vec_id") % 100 === 3).limit(20)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toSeq
    val parts = sample.map { case (_, v) => Sq.queryParts(p, v) }
    val top1 = SqVolume.batchedTop1(codes, parts.map(_._2),
        parts.map(_._1))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val recall = sample.zipWithIndex.count { case ((pid, _), i) =>
      top1(i) == pid - 3 }.toDouble / sample.size
    info(f"batched recall@1: $recall%.3f over ${sample.size} probes")
    assert(recall >= 0.95, s"SQ8 retrieval must be near-exact: $recall")

    val r10 = sample.take(5).map { case (_, v) =>
      val exact = Ann.bruteTopK(base, v, 10)
        .collect().map(_.getLong(0)).toSet
      val sq = Sq.topK(codes, p, v, 10)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(sq).size / 10.0
    }
    val recall10 = r10.sum / r10.size
    info(f"recall@10 vs exact: $recall10%.3f")
    assert(recall10 >= 0.9,
      s"SQ8 recall@10 must be near-exact on this geometry: $recall10")
  }
}
