package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Sketch surface: Bloom-filter semi-join reduction (JoinPrefilter) and
  * count-min-sketch heavy hitters — the approximate structures a 100 TB
  * pipeline uses to avoid exact shuffles. */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("bloom semi-join reduction loses no matches and prunes hard") {
    val fact = Tables.events(spark, sf)
    // a "complex-predicate" dim the planner can't fold into the scan:
    // 3 of the 150 users
    val dim = fact.select(col("user_id")).distinct()
      .filter(col("user_id") % 50 === 0)
    val trueMatches = fact.join(dim, Seq("user_id"), "left_semi").count()
    val factCount = fact.count()

    val reduced = JoinPrefilter.bloomReduce(
      fact, col("user_id"), dim, col("user_id"),
      estItems = 1000L, numBits = 1L << 20)
    val reducedCount = reduced.count()

    // no false negatives: every true match survives the probe
    assert(reduced.join(dim, Seq("user_id"), "left_semi").count()
      === trueMatches)
    // effective: superset of matches, far below the unfiltered fact
    assert(reducedCount >= trueMatches)
    assert(reducedCount <= trueMatches + (factCount / 100),
      s"reduction too weak: $reducedCount vs $trueMatches matches")
  }

  test("count-min sketch overestimates boundedly (heavy hitters)") {
    val events = Tables.events(spark, sf)
    val eps = 0.005
    val total = events.count()
    val cms = events.stat.countMinSketch("event_type", eps, 0.99, 42)
    val exact = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      val est = cms.estimateCount(t)
      // CMS never underestimates; overestimate bounded by eps * stream size
      assert(est >= n, s"$t: est $est < exact $n")
      assert(est <= n + (eps * total).toLong, s"$t: est $est too high vs $n")
    }
  }
}
