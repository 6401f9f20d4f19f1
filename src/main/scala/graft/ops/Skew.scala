package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation — the salting pattern for hot keys (SURVEY scale
  * posture; complements AQE's automatic skew-join splitting, which only
  * covers sort-merge joins, not aggregations).
  *
  * A skewed `groupBy(k).agg(...)` puts one reducer behind the hot key.
  * Salting splits each key into `saltBuckets` sub-keys for the partial
  * phase, so the hot key's rows spread over many reducers; a second, tiny
  * aggregation over the per-salt partials restores exact totals. Works for
  * any algebraic aggregate (sum/count/min/max — anything with an
  * associative merge). Totals are exact under ANY partition layout because
  * the merge is associative; the salt itself is
  * `pmod(xxhash64(monotonically_increasing_id()))`, which depends on
  * partition layout, so the salt ASSIGNMENT (which bucket a given row
  * lands in) is not reproducible across repartitionings — only the final
  * per-key totals are. No rand(): same-plan re-execution (e.g. task retry)
  * stays consistent within a run.
  */
object Skew {

  /** Exact count per key, skew-resistant. */
  def saltedCount(df: DataFrame, key: Column, saltBuckets: Int = 32): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy("key")
      .agg(sum(col("partial")).as("cnt"))

  /** Exact decimal sum per key, skew-resistant (decimal partials keep the
    * two-phase result identical to the direct aggregation — double sums
    * would differ in summation order). */
  def saltedSum(df: DataFrame, key: Column, value: Column,
      saltBuckets: Int = 32): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value.cast("decimal(18,4)")).as("partial"))
      .groupBy("key")
      .agg(sum(col("partial")).as("total"))
}
