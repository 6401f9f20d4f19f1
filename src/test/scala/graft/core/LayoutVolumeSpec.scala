package graft.core

import graft.SparkSpec

/** CI-sized twin of [[graft.LayoutVolume]] (the committed
  * dev/layout_volume.json run is a 16.7M-row grid / 128 files): the
  * pruning claims must hold at 512×512 / 64 files too — the b-stripe
  * reads ~everything under a single-column sort and prunes under BOTH
  * curves, the a-stripe prunes under both curves, and the cross-layout
  * row counts agree (enforced inside run()). Bounds are the slack
  * LayoutSpec ones (full-suite range-boundary drift), non-vacuous
  * against the 100% a-sort baseline measured in the same run. */
class LayoutVolumeSpec extends SparkSpec {

  test("all three layouts hold the claims at CI scale") {
    val line = graft.LayoutVolume.run(spark, 512L, 64)
    def frac(k: String): Double =
      ("\"" + k + "\":([0-9.]+)").r.findFirstMatchIn(line).get
        .group(1).toDouble
    assert(frac("b_stripe_a_sort_frac") >= 0.90, line)
    assert(frac("b_stripe_z_frac") <= 0.40, line)
    assert(frac("b_stripe_h_frac") <= 0.40, line)
    assert(frac("a_stripe_z_frac") <= 0.40, line)
    assert(frac("a_stripe_h_frac") <= 0.40, line)
    assert(frac("box_z_frac") <= 0.40, line)
    assert(frac("box_h_frac") <= 0.40, line)
    // file-level skipping (round 15): the DSv2 path drops FILES before
    // task creation — the b-stripe cannot skip a file of the a-sort
    // (every file spans all of b) but skips most under both curves; the
    // a-stripe skips under all three layouts
    assert(frac("b_stripe_a_sort_file_frac") >= 0.99, line)
    assert(frac("b_stripe_z_file_frac") <= 0.40, line)
    assert(frac("b_stripe_h_file_frac") <= 0.40, line)
    assert(frac("a_stripe_a_sort_file_frac") <= 0.15, line)
    assert(frac("a_stripe_z_file_frac") <= 0.40, line)
    assert(frac("a_stripe_h_file_frac") <= 0.40, line)
    assert(frac("box_z_file_frac") <= 0.40, line)
    assert(frac("box_h_file_frac") <= 0.40, line)
  }
}
