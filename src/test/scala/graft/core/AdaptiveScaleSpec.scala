package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Executable proof of the two built-in scale mechanisms the repo's
  * posture cites but (until now) never exercised (SURVEY §4 optimizer
  * table; OPERATORS.md scale notes):
  *
  *  1. AQE skew-join splitting — at 100 TB a hot join key turns one
  *     reducer into the job's critical path; AQE splits the oversized
  *     shuffle partition into many sub-reads at runtime, each joined
  *     against a replicated copy of the other side. This is the
  *     JOIN-side complement of `ops/Skew`'s salted AGGREGATION.
  *  2. Dynamic partition pruning — a filter on a dim table prunes the
  *     partitioned fact SCAN at runtime (the dim's join keys arrive via
  *     the reused broadcast), so a 100 TB date-partitioned fact reads
  *     only the partitions the dim filter selects.
  *
  * Both tests gate on the executed adaptive plan string (same mechanism
  * as ExplainAudit) AND on result equality, so they fail loudly if a
  * conf default or plan shape ever changes out from under the posture.
  */
class AdaptiveScaleSpec extends SparkSpec {

  /** Set runtime confs, run the body, restore previous values. */
  private def withConf(kv: (String, String)*)(body: => Unit): Unit = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    import spark.implicits._
    // 90% of fact rows share key 0 — the shuffle partition holding key 0
    // dwarfs the median. Thresholds are lowered to make the 2.8 MB hot
    // partition count as skewed on a unit-test corpus; at cluster scale
    // the defaults (256 MB / 5x median) play the same role.
    val fact = spark.range(0, 100000)
      .select(
        when(col("id") % 10 < 9, lit(0L)).otherwise(col("id") % 1000)
          .as("k"),
        col("id").as("v"))
    val dim = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") * 7).as("w"))

    withConf(
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // keep the SMJ shape
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32k",
      // keep AQE from folding the tiny non-skewed partitions into one
      // before the skew check reads their sizes
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val joined = fact.join(dim, "k")
      val n = joined.count()
      assert(n === 100000L, "inner join must not drop rows")

      // count() runs its own plan; re-execute the join terminally so the
      // adaptive plan we inspect is the one with the skew decision
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the sort-merge join as skew-split:\n$plan")
      // and the skewed shuffle read shows the split partitions
      assert(plan.contains("skewed"),
        s"AQEShuffleRead must report skewed sub-partitions:\n$plan")
    }
  }

  test("a dim filter dynamically prunes the partitioned fact scan") {
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString

    // Fact: orders written partitioned by order month (the layout a
    // 100 TB date-partitioned warehouse table would have).
    val orders = Tables.orders(spark, sf)
      .withColumn("mon", substring(col("o_orderdate").cast("string"), 1, 7))
    orders.write.mode("overwrite").partitionBy("mon").parquet(dir)
    val factMonths = orders.select("mon").distinct().count()

    // Dim: month → quarter lookup. The filter is on QUARTER, so static
    // partition pruning cannot apply — only the dim join can reveal
    // which months survive.
    val dim = orders.select("mon").distinct()
      .withColumn("quarter",
        concat(substring(col("mon"), 1, 5), lit("Q"),
          (floor((substring(col("mon"), 6, 2).cast("int") - 1) / 3) + 1)
            .cast("string")))

    val fact = spark.read.parquet(dir)
    val q = dim.filter(col("quarter") === "1995-Q1")
    val joined = fact.join(q, "mon")
      .groupBy("mon").agg(count(lit(1)).as("n"))
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // The optimized logical plan spells the filter
    // `dynamicpruningexpression(...)`; the executed physical plan delivers
    // it as a `SubqueryBroadcast dynamicpruning#N` feeding the fact scan's
    // PartitionFilters. Gate on both layers.
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("SubqueryBroadcast dynamicpruning"),
      s"fact scan must carry a runtime partition-pruning subquery:\n$physical")
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dynamicpruning"),
      s"optimizer must inject the DPP filter:\n$optimized")

    // Result equality with the statically-filtered computation — and the
    // dim filter is genuinely selective (else the proof is vacuous)
    val expected = orders.filter(col("mon").isin("1995-01", "1995-02", "1995-03"))
      .groupBy("mon").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(got.nonEmpty && got.size.toLong < factMonths,
      s"filter must select a strict subset of the $factMonths partitions")
  }
}
