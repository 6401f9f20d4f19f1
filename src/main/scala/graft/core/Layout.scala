package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data LAYOUT management — multi-dimensional clustering for scan
  * pruning (SURVEY §2 B1 posture work; the category every lakehouse
  * engine ships as Z-ORDER/CLUSTER BY): a table queried by conjunctive
  * range predicates on TWO dimensions cannot be sorted to serve both —
  * a sort on `a` gives perfect min/max pruning on `a` and none on `b`.
  * Interleaving the dimensions' bits (the Z-order / Morton curve —
  * Morton 1966, the published technique under Delta/Iceberg OPTIMIZE
  * ZORDER) makes rows close in (a, b) close in z, so sorting by z gives
  * every row group a TIGHT min/max box on BOTH columns and parquet's
  * row-group statistics skip most of the table for a 2-D box query.
  *
  * Spark specifics (vanilla, no DSv2 stats): file-level skipping keys
  * only on partition columns, so the pruning this buys happens at the
  * PARQUET ROW-GROUP level — the reader opens each footer and drops row
  * groups whose [min, max] on a filtered column misses the predicate;
  * the win is measured as the scan's output-rows metric, not files
  * listed (LayoutSpec measures exactly that, z-ordered vs single-column
  * sorted, same query). At 100 TB the same layout also feeds
  * range-partition pruning if z ranges are promoted to directory
  * partitions — noted, not done: the row-group form is the general one.
  *
  * Determinism: the z-value is pure bit arithmetic on BIGINTs —
  * integer-exact, partitioning-independent, and mirrored op-for-op in
  * the `fn_zorder` oracle. */
object Layout {

  /** Morton/Z-value of two non-negative dimensions, `bits` bits each,
    * interleaved a-even/b-odd into one BIGINT: bit 2i = a's bit i,
    * bit 2i+1 = b's bit i. A fixed tree of shift/and/or builtins —
    * whole-stage-codegen'd, no UDF, no lambda. Caller owns the range
    * contract (values ≥ 2^bits fold into the top z-stripe — clamp or
    * bucket first; the declared query buckets with pmod). */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until bits).map { i =>
      (shiftright(al, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)))
        .bitwiseOR(
          shiftright(bl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ bitwiseOR _)
  }

  /** The oracle's identical arithmetic (DuckDB spells shift/and/or as
    * operators): spliced, not copied, wherever a z oracle is declared. */
  def zValueSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i)} " +
        s"| (($b >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " | ", ")")

  /** Write `df` Z-clustered on (a, b): range-partition by the z-value
    * into `nFiles` files and sort inside each — every output row group
    * covers a compact Morton-curve segment, i.e. a tight (a, b) box.
    * Restartable by delete-and-rerun (same content either way). */
  def writeZOrdered(df: DataFrame, dir: String, a: Column, b: Column,
      nFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(a, b, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
}
