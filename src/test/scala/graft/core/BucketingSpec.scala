package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Co-located joins via bucketing — the 100 TB shuffle-elimination story
  * (SURVEY §2 B1.5 note / scale posture). Both fact tables are written
  * bucketed by the join key; the join then needs NO exchange on either
  * side: each bucket pair joins locally. At cluster scale this converts
  * the biggest shuffle in the workload into a local sort-merge. */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join plans without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001" // warehouse dir: temp, set in SparkSpec

    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    Tables.lineitem(spark, sf).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    // disable broadcast so the join keeps the large-x-large SortMergeJoin
    // shape this test is about (at sf0.001 AQE would broadcast instead)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString

      // the join itself must consume bucketed scans directly — no
      // ShuffleExchange feeding the SortMergeJoin
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected SortMergeJoin in:\n$plan")
      val beforeAgg = plan.substring(joinIdx)
      assert(!beforeAgg.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"scan must be bucket-aware:\n$plan")

      // and the result matches the unbucketed join
      val expected = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(expected).count() === 0)
      assert(expected.exceptAll(joined).count() === 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
