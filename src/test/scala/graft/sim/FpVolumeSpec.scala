package graft.sim

import graft.SparkSpec

/** CI-sized twin of [[graft.FpVolume]] (the committed dev/fp_volume.json
  * run is 1M corpus / 100k shard): the radius-3 Manku-configuration index
  * must deliver its GUARANTEED recall — every planted ≤ 3-bit pair found
  * at exactly its planted hamming — on a 20k-row corpus, with any extra
  * pairs being true positives by the exact verify. */
class FpVolumeSpec extends SparkSpec {

  test("planted recall is exactly 1.0 at CI scale (guaranteed, not luck)") {
    import spark.implicits._
    val nCorpus = 20000L; val nShard = 2000
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fpvol_ci").toString
    FpIndex.writeIndex(graft.FpVolume.corpus(spark, nCorpus), dir,
      maxHamming = 3)
    val (rows, planted) = graft.FpVolume.shard(nCorpus, nShard)
    val got = FpIndex.probe(spark, rows.toDF("id", "fp"), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val plantedSet = planted.toSet
    assert(plantedSet.diff(got).isEmpty,
      s"guaranteed recall violated: ${plantedSet.diff(got).take(3)}")
    assert(plantedSet.nonEmpty && plantedSet.size === nShard / 2)
    // extras (if any) are true ≤3-bit pairs — verify exactness means the
    // result can only ever ADD real pairs, never lose planted ones
    got.diff(plantedSet).foreach { case (_, _, h) => assert(h <= 3) }
  }
}
