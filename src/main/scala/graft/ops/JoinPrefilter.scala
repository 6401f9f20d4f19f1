package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftexpr.BloomBridge

/** Semi-join reduction — the 100 TB join lever AQE's runtime filters apply
  * automatically when statistics justify it, exposed here as an explicit
  * operator for when the planner can't see it (a dim filtered by a complex
  * predicate, a pre-staged key set, a reduction reused across several
  * queries).
  *
  * Shape: one tiny aggregation over the dim keys builds a Bloom filter
  * (partial+final, bytes-sized result), broadcast as a 1-row dimension; the
  * fact side applies `might_contain` map-side BEFORE its shuffle. A Bloom
  * probe never false-negatives, so no matching row is lost; false positives
  * (rate set by numBits/estItems) only cost wasted shuffle, never wrong
  * results — the real join still decides membership.
  */
object JoinPrefilter {

  /** Returns `fact` reduced to rows whose `factKey` might appear in
    * `dim`'s `dimKey` set. numBits default (1 << 23 = 1 MiB) gives
    * fpp ≈ 0.1% at one million dim keys. The filter arrives at the fact
    * side as a scalar subquery (executed once, result broadcast), so the
    * probe is a map-side predicate — the fact never joins or shuffles to
    * be reduced. */
  def bloomReduce(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: Column, estItems: Long = 1000000L,
      numBits: Long = 1L << 23): DataFrame = {
    val bloom = dim.agg(
      BloomBridge.bloomAgg(xxhash64(dimKey), estItems, numBits)
        .as("__graft_bloom"))
    fact.where(BloomBridge.mightContain(bloom, xxhash64(factKey)))
  }
}
