package graft.sim

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: path graph needs multiple propagation rounds") {
    // 1-2-3-4-5 is diameter 4 — min-label must flow several hops, so this
    // fails if the loop stops after one round. 10-11 is a second component;
    // 20-20 would be a self-loop (not produced by our detectors, but must
    // not break anything).
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (11L, 10L), (20L, 20L)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("clusters: keep flags exactly the component minimum") {
    val pairs = Seq((7L, 3L), (3L, 9L), (100L, 50L)).toDF("x", "y")
    val got = Dedup.clusters(pairs, "x", "y")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((3L, 3L, true), (7L, 3L, false), (9L, 3L, false),
      (50L, 50L, true), (100L, 50L, false)))
  }

  test("string ids work too (labels are min by type ordering)") {
    val pairs = Seq(("b", "c"), ("c", "a")).toDF("u", "v")
    val got = Dedup.connectedComponents(pairs, "u", "v")
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a"))
  }
}
