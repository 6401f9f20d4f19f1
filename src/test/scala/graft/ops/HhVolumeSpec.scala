package graft.ops

import graft.{HhVolume, SparkSpec}

/** CI-scale gate for the heavy-hitters volume proof ([[graft.HhVolume]],
  * committed artifact dev/hh_volume.json): on the generated corpus every
  * planted dominant (2.5% of the stream each) sits above the MG guarantee
  * line n/(k+1) ≈ 1.5%, so all of them MUST surface, with the invariant
  * est ≤ true ≤ est + Δ checkable exactly from the construction. */
class HhVolumeSpec extends SparkSpec {

  test("heavy-hitters volume contract at CI scale: all planted dominants " +
      "surface and the MG bound brackets their true counts") {
    val n = 400000L // divisible by 5·NHeavy → exact planted counts
    val toks = HhVolume.corpus(spark, n).localCheckpoint()
    val (sec, items, seen, maxErr, ok) = HhVolume.measure(toks, n)
    info(f"n=$seen maxErr=$maxErr items=${items.size} in $sec%.2fs")
    assert(seen === n)
    assert(ok, s"planted-dominant contract failed: $items")
  }
}
