package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CI-sized twin of [[graft.DecontVolume]] (the committed
  * dev/decont_volume.json run is a 100k-doc benchmark index probed by a
  * 1M-doc shard): recall on planted copied windows is a set-membership
  * theorem — an exactly copied 5-token window IS its benchmark gram and
  * both probe paths are exact — so every planted doc must flag with
  * EXACTLY one hit and every noise-namespace doc must stay clean. */
class DecontVolumeSpec extends SparkSpec {

  test("planted verdicts are exact at CI scale on both probe paths") {
    val nBench = 2000L; val nShard = 10000L
    val dir = java.nio.file.Files
      .createTempDirectory("graft_decontvol_ci").toString
    DecontIndex.writeIndex(
      graft.DecontVolume.benchDocs(spark, nBench), dir)
    val shard = graft.DecontVolume.shardDocs(spark, nBench, nShard)
      .localCheckpoint()

    val exact = DecontIndex.probeShard(shard, dir)
      .join(shard.select("doc_id", "j"), "doc_id")
    assert(exact.count() === nShard)
    assert(exact.filter(col("contaminated") =!=
      (pmod(col("j"), lit(10)) === 0)).isEmpty)
    assert(exact.filter(pmod(col("j"), lit(10)) === 0
      && col("n_hit") =!= 1).isEmpty)

    val bloom = DecontIndex.probeShardBloom(shard, dir)
      .join(shard.select("doc_id", "j"), "doc_id")
    assert(bloom.count() === nShard / 10)
    assert(bloom.filter(pmod(col("j"), lit(10)) =!= 0
      || col("n_hit") =!= 1).isEmpty)
  }
}
