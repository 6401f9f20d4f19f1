package graft.text

import graft.{SparkSpec, UnigramVolume}

/** CI-scale gate for the unigram volume proof ([[graft.UnigramVolume]],
  * committed artifact dev/unigram_volume.json): on the 8-char compound
  * corpus (above the piece-length cap, so whole words cannot be
  * memorized) hard-EM must starve every fragment and crossing piece to
  * zero votes and keep EXACTLY the planted morphemes, after which every
  * vocabulary word segments at its boundary — the same contract the 1M-doc
  * run measures. */
class UnigramVolumeSpec extends SparkSpec {

  test("unigram volume contract at CI scale: multis = the morpheme set, " +
      "every word segments at the planted boundary") {
    val docs = UnigramVolume.corpus(spark, 20000L).localCheckpoint()
    val model = Unigram.train(docs, UnigramVolume.TargetMultis)
    assert(model.multis === UnigramVolume.NMorph)
    assert(UnigramVolume.multisAreMorphemes(model),
      s"non-morpheme survivors: ${model.pieces.filter(p =>
        p._1.codePointCount(0, p._1.length) > 1)}")
    assert(UnigramVolume.segmentsAtBoundaries(spark, model))
  }
}
