package graft.graph

import graft.SparkSpec

/** CI-sized twin of [[graft.GraphVolume]] (the committed
  * dev/graph_volume.json run is 100k cliques ≈ 500k nodes / 1.1M
  * edges): the planted-structure THEOREMS — every component label
  * equals v − v mod 40, every node sits in exactly 6 triangles — and
  * the fast-vs-deterministic PageRank parity must hold at any scale. */
class GraphVolumeSpec extends SparkSpec {

  test("component labels and triangle counts are exact; pagerank forms " +
      "agree, at CI scale") {
    val line = graft.GraphVolume.run(spark, 2000L)
    def num(k: String): Double =
      ("\"" + k + "\":([0-9.eE+\\-]+)").r.findFirstMatchIn(line).get
        .group(1).toDouble
    assert(num("cc_wrong") === 0.0, line)
    assert(num("tri_wrong") === 0.0, line)
    assert(num("cc_nodes") === 10000.0, line)
    assert(num("tri_nodes") === 10000.0,
      "every node is in its clique's triangles: " + line)
    assert(num("parity_max_abs_diff") <= 1e-12, line)
  }
}
