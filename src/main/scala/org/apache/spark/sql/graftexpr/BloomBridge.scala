package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain,
  Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column bridge to Spark's Bloom-filter machinery (the same expressions
  * AQE's `InjectRuntimeFilter` uses for runtime row-level filtering), which
  * ships in catalyst but is not registered in the public function registry.
  * Living in a `org.apache.spark.sql` subpackage grants access to the
  * `private[sql]` Column↔Expression bridge, same as the other graftexpr
  * expressions.
  *
  * Both sides take the 64-bit key hash (xxhash64) — `BloomFilterAggregate`
  * is LongType-only by design. */
object BloomBridge {

  /** Aggregate: build a Bloom filter over `keyHash` (binary output). */
  def bloomAgg(keyHash: Column, estItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(keyHash),
      Literal(estItems), Literal(numBits)).toAggregateExpression())

  /** Scalar probe: `might_contain(<scalar subquery over bloomDf>, keyHash)`.
    * `BloomFilterMightContain` requires its filter side to be a CONSTANT or
    * scalar subquery (never a join column) so codegen can load the filter
    * once per task — the subquery form keeps the whole thing in the plan:
    * Spark executes the 1-row aggregate once and broadcasts its bytes, the
    * exact mechanics of AQE's injected runtime filters. `bloomDf` must be
    * a 1-row, 1-column (binary) aggregation, e.g. `dim.agg(bloomAgg(...))`.
    * A probe never false-negatives; false positives only cost shuffle. */
  def mightContain(bloomDf: DataFrame, keyHash: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ScalarSubquery(bloomDf.queryExecution.analyzed),
      ExpressionUtils.expression(keyHash)))
}
