package graft.sim

import org.apache.spark.sql.functions._

import graft.{DedupVolume, SparkSpec}

/** CI-sized run of the MinHash/semantic volume-proof corpora: planted
  * ground truth is deterministic, so the recall gates are (near-)exact.
  * The million-row measurement lives in dev/dedup_volume.json
  * (runMain graft.DedupVolume). */
class DedupVolumeSpec extends SparkSpec {

  test("minhash volume corpus: exact copies always drop, near copies >=99%, no false drops") {
    val n = 10000L
    val docs = DedupVolume.docCorpus(spark, n).localCheckpoint()
    val kept = Dedup.dedupCorpus(docs, "doc_id", "text")
      .select("doc_id").localCheckpoint()
    val exactPlanted = n / 10
    val exactKept = kept.filter(col("doc_id") % 10 === 1).count()
    assert(exactKept === 0L,
      "exact copies share every band key — banding must catch all of them")
    val nearPlanted = n / 10
    val nearKept = kept.filter(col("doc_id") % 10 === 2).count()
    val nearRecall = 1.0 - nearKept.toDouble / nearPlanted
    info(f"near-copy recall $nearRecall%.4f (banding bound ~0.9997)")
    // Floor provenance (ADVICE r9 — so a future reseed that trips this has
    // a paper trail): with the default banding (32 hashes, 8 bands of
    // r=4) and the planted Jaccard s = 17/19, INDEPENDENT minhashes give
    // candidate probability 1−(1−s⁴)⁸ ≈ 0.99972. The deployed family is
    // 32 seeded affine rehashes of one xxhash64, so per-band collisions
    // are positively correlated and the realized recall sits below the
    // independence bound: measured 0.9951 at 1M docs
    // (dev/dedup_volume.json) and ≈0.995 here. 0.99 is that measurement
    // minus noise headroom — NOT a tunable; recall materially below
    // 0.995 after a reseed means the new seeds correlate worse and the
    // family (not this gate) should change.
    assert(nearRecall >= 0.99, f"near recall $nearRecall%.4f")
    // every base and every unique filler doc must survive: the exact
    // verify step makes false drops impossible, and each planted group's
    // min id is its base
    assert(kept.filter(col("doc_id") % 10 =!= 1 && col("doc_id") % 10 =!= 2)
      .count() === n - exactPlanted - nearPlanted)
    // fixture sanity: a near copy really shares 17 of its 19 3-gram
    // shingles with its base (Jaccard 17/19 ≈ 0.895 — above the 0.8
    // threshold, below exact)
    def shingleSet(id: Long): Set[String] = {
      val toks = docs.filter(col("doc_id") === id)
        .head.getAs[String]("text").split(' ')
      toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val (a, b) = (shingleSet(0), shingleSet(2))
    val j = a.intersect(b).size.toDouble / a.union(b).size
    assert(j > 0.85 && j < 0.95, f"planted near-copy jaccard $j%.3f")
  }

  test("semantic volume corpus: planted shard copies all drop against the index") {
    val n = 2000L
    // unit-normalized like the volume main: cosine verdicts are
    // scale-invariant (the exact path is unchanged), and normalization
    // bounds the PQ estimate's relative error — the ADC error divides by
    // |x|, so a small-norm vector can blow past any fixed margin
    val v0 = col("embedding")
    val nrm = sqrt(graft.sim.VectorMath.dot(v0, v0))
    val emb = DedupVolume.embCorpus(spark, n)
      .select(col("vec_id"), transform(v0, x => x / nrm).as("embedding"))
      .localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dedupvol_sem").toString
    SemDedup.writeIndex(emb, dir, nCentroids = 16, iters = 2, pqM = 4)
    val shard = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 2 * n).as("vec_id"),
        transform(col("embedding"), x => x * 0.25).as("embedding"))
    val keptN = SemDedup.semDedupShard(spark, shard, dir, 0.999999).count()
    assert(shard.count() === n / 10)
    assert(keptN === 0L,
      "every shard vector is a scaled copy of an indexed base — all drop")
    // the PQ-accelerated probe path reaches the same verdict at margin
    // 0.0: each candidate row faces its own stored per-row certificate
    // (`qerr`), so losslessness is proven row-wise — where a guessed
    // margin measurably was not, and the global-max certificate (still
    // stored; printed here) is provable but too loose to cut anything
    val margin = SemDedup.pqSafeMargin(spark, dir)
    info(f"global certificate margin (diagnostic): $margin%.4f")
    val keptPq = SemDedup.semDedupShard(spark, shard, dir, 0.999999,
      pqMargin = Some(0.0)).count()
    assert(keptPq === keptN, "ADC prefilter + exact verify must agree")
    // and at the loose global margin too (the pre-qerr fallback contract)
    val keptPqG = SemDedup.semDedupShard(spark, shard, dir, 0.999999,
      pqMargin = Some(margin)).count()
    assert(keptPqG === keptN, "global-margin prefilter must also agree")
  }
}
