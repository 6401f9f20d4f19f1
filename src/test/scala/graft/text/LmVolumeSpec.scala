package graft.text

import graft.{LmVolume, SparkSpec}

/** CI-scale gate for the LM quality-filter volume proof
  * ([[graft.LmVolume]], committed artifact dev/lm_volume.json): on the
  * generated corpus every planted noise doc is all-OOV under the
  * vocabulary cut (its tokens are globally unique by construction, no
  * hash collisions possible), so noise scores EXACTLY 0.0 while coherent
  * docs' ring transitions are all known — total separation; and the LM
  * index append equals the rebuild on a probe sample. */
class LmVolumeSpec extends SparkSpec {

  test("LM volume contract at CI scale: total noise/coherent separation " +
      "and append ≡ rebuild") {
    val n = 20000L
    val docs = LmVolume.corpus(spark, n).localCheckpoint()
    val (buildSec, scoreSec, noiseMax, cohMin, nNoise, nCoh, sep) =
      LmVolume.measure(docs)
    info(f"build $buildSec%.2fs score $scoreSec%.2fs " +
      f"noiseMax=$noiseMax%.6f cohMin=$cohMin%.6f")
    assert(nNoise === n / 10)
    assert(nCoh === n - n / 10)
    assert(noiseMax === 0.0, "planted noise must be all-OOV → exactly 0")
    assert(sep && cohMin > 0.5,
      s"coherent docs must score high: min=$cohMin")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lmvol_ci").toString
    assert(LmVolume.appendEqualsRebuild(docs, dir))
    // the trigram scorer keeps the same total separation
    val (s3, n3Max, c3Min, sep3) = LmVolume.measure3(docs)
    info(f"trigram: $s3%.2fs noiseMax=$n3Max%.6f cohMin=$c3Min%.6f")
    assert(n3Max === 0.0 && sep3 && c3Min > 0.5)
  }
}
