package graft.text

import graft.{BpeVolume, SparkSpec}

/** CI-scale gate for the BPE volume proof ([[graft.BpeVolume]], committed
  * artifact dev/bpe_volume.json): on the compound-word corpus the pair
  * frequencies are stratified by construction (intra-morpheme ≈ n/6,
  * </w>-attach ≈ n/12, cross-boundary ≈ n/144), so greedy training MUST
  * spend its whole 36-merge budget rediscovering the planted morphemes —
  * and afterwards every vocabulary word segments at its morpheme
  * boundary. */
class BpeVolumeSpec extends SparkSpec {

  test("BPE volume contract at CI scale: all merges are morphology and " +
      "every word segments at the planted boundary") {
    val docs = BpeVolume.corpus(spark, 20000L).localCheckpoint()
    val model = Bpe.train(docs, BpeVolume.Merges)
    assert(model.size === BpeVolume.Merges)
    assert(BpeVolume.allIntraUnit(model),
      s"cross-boundary merge learned: ${model.merges}")
    assert(BpeVolume.segmentsAtBoundaries(spark, model))
  }
}
