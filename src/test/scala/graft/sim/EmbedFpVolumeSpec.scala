package graft.sim

import graft.SparkSpec

/** CI-sized twin of [[graft.EmbedFpVolume]] (the committed
  * dev/embedfp_volume.json run is 1M vectors / 20k shard): the scaled
  * copies must deliver the STRUCTURAL recall theorem (positive scaling
  * preserves every sign, so the fingerprint is bit-identical and the
  * radius-3 probe finds it at hamming 0 — recall exactly 1.0), and the
  * planted-angle classes must calibrate to Charikar's 63·α/π estimator.
  */
class EmbedFpVolumeSpec extends SparkSpec {

  test("structural copy recall 1.0 and angle calibration at CI scale") {
    val line = graft.EmbedFpVolume.run(spark, 10000L, 1000)
    def num(k: String): Double =
      ("\"" + k + "\":([0-9.\\-]+)").r.findFirstMatchIn(line).get
        .group(1).toDouble
    assert(num("copy_recall") === 1.0,
      s"structural recall must be a theorem: $line")
    // Charikar calibration: sample mean hamming within 35% of 63·α/π
    // (250 pairs per class at CI size — generous but non-vacuous bounds)
    assert(math.abs(num("a05_mean_hamming") - num("a05_predicted"))
      <= 0.35 * num("a05_predicted") + 0.3, line)
    assert(math.abs(num("a15_mean_hamming") - num("a15_predicted"))
      <= 0.35 * num("a15_predicted"), line)
    // the honest LSH contract: a stochastic-hamming class is FOUND at a
    // rate, not a guarantee — α=0.05 (E[h]≈1) should mostly surface
    assert(num("a05_found_frac") >= 0.8, line)
  }
}
