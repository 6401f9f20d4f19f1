package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class StatsSpec extends SparkSpec {

  test("Welford aggregator matches two-pass variance on real data") {
    val values = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("value")).collect().map(_.getDouble(0))
    val mean = values.sum / values.length
    val expectedVar = values.map(v => (v - mean) * (v - mean)).sum / (values.length - 1)

    val got = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .agg(StableStats.stableStats(col("value")).as("s"))
      .select("s.n", "s.mean", "s.variance").head
    assert(got.getLong(0) === values.length.toLong)
    assert(math.abs(got.getDouble(1) - mean) / mean < 1e-12)
    assert(math.abs(got.getDouble(2) - expectedVar) / expectedVar < 1e-9)
  }

  test("Welford survives the catastrophic-cancellation regime") {
    import spark.implicits._
    // huge offset, tiny spread: naive E[x²]-E[x]² loses all precision here
    val xs = (0 until 1000).map(i => 1e9 + i * 1e-3)
    val exactVar = {
      val m = xs.sum / xs.size
      xs.map(v => (v - m) * (v - m)).sum / (xs.size - 1)
    }
    val got = xs.toDF("x").repartition(7)
      .agg(StableStats.stableStats(col("x")).as("s"))
      .select("s.variance").head.getDouble(0)
    assert(math.abs(got - exactVar) / exactVar < 1e-6,
      s"stable=$got exact=$exactVar")
  }

  test("partition layout does not change Welford results materially") {
    import spark.implicits._
    val xs = (1 to 5000).map(i => math.sin(i.toDouble) * 100 + 50)
    val a = xs.toDF("x").repartition(1)
      .agg(StableStats.stableStats(col("x")).as("s")).select("s.variance")
      .head.getDouble(0)
    val b = xs.toDF("x").repartition(13)
      .agg(StableStats.stableStats(col("x")).as("s")).select("s.variance")
      .head.getDouble(0)
    assert(math.abs(a - b) / a < 1e-12)
  }

  test("approx_count_distinct lands within its rsd bound") {
    val events = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    val exact = events.agg(countDistinct(col("user_id"))).head.getLong(0)
    val approx = events.agg(approx_count_distinct(col("user_id"), 0.05))
      .head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile stays within its rank-accuracy bound of exact") {
    // the t-digest scale path for high-cardinality columns (SURVEY B4.9):
    // with accuracy a, the returned value's true rank must be within n/a of
    // the target rank — checked against the exact sorted data
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.01")
    val accuracy = 100
    val sorted = li.select("l_extendedprice").na.drop()
      .collect().map(_.getDouble(0)).sorted
    val n = sorted.length
    for (p <- Seq(0.25, 0.5, 0.9)) {
      val approx = li.agg(
        percentile_approx(col("l_extendedprice"), lit(p), lit(accuracy)))
        .head.getDouble(0)
      val rank = sorted.count(_ <= approx).toDouble / n
      assert(math.abs(rank - p) <= 1.0 / accuracy + 0.01,
        s"p=$p approx=$approx realized-rank=$rank")
    }
  }

  test("ln/log10 behave sanely (oracle-excluded, unit-covered instead)") {
    import spark.implicits._
    val r = Seq(1.0, math.E, 10.0, 100.0).toDF("x")
      .select(log(col("x")).as("ln"), log10(col("x")).as("l10"))
      .collect()
    assert(math.abs(r(1).getDouble(0) - 1.0) < 1e-15)
    assert(math.abs(r(2).getDouble(1) - 1.0) < 1e-15)
    assert(math.abs(r(3).getDouble(1) - 2.0) < 1e-15)
  }
}
