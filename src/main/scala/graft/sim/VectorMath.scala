package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE definition of the dot product / cosine used across the
  * similarity stack. Fold order is load-bearing: a left fold from 0.0 is
  * sequence-identical to DuckDB's `list_reduce` (0.0+x1 ≡ x1 in IEEE), which
  * is what makes the cosine queries bit-exact against the oracle — so every
  * caller must share this expression rather than re-derive it.
  *
  * Physical form: the custom codegen'd loop
  * [[org.apache.spark.sql.graftexpr.DotProductExpr]] — the same IEEE
  * sequence as the previous `aggregate(zip_with(a,b,_*_), 0.0, _+_)`
  * composition (results bit-identical, proven by the unchanged oracle
  * hashes), minus the HigherOrderFunction interpretation overhead and the
  * per-row product-array allocation that dominated the 1.3M-pair dedup
  * join. The composed form stays below as the cross-check used in tests. */
object VectorMath {

  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftexpr.DotProductExpr.column(a, b)

  /** Reference composition of built-ins — semantically identical to [[dot]]
    * (same left fold); kept for property tests and as the fallback if the
    * custom expression is ever unavailable. */
  def dotViaHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
}
