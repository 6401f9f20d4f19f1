package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE definition of the dot product / cosine used across the
  * similarity stack. Fold order is load-bearing: a left fold from 0.0 is
  * sequence-identical to DuckDB's `list_reduce` (0.0+x1 ≡ x1 in IEEE), which
  * is what makes the cosine queries bit-exact against the oracle — so every
  * caller must share this expression rather than re-derive it. */
object VectorMath {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
}
