package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental distinct counting over PERSISTED HLL sketches — the
  * companion to [[graft.sim.IncrementalDedup]] on the metrics side: a
  * 100 TB corpus can't re-scan history to answer "how many distinct users
  * this month", so each arriving day is reduced ONCE to ~kB-sized
  * DataSketches HLL state (Spark 4's `hll_sketch_agg`), appended under its
  * own day partition, and any later window query unions just the matching
  * sketches — never the fact data.
  *
  * Mergeability is the whole point: HLL union is associative and
  * commutative, so per-(day, type) sketches compose into any day-range ×
  * type-set estimate. The sketch table is tiny (days × types rows), the
  * day-filtered read partition-prunes (plan-gated in SketchSpec), and a
  * new day's append never rewrites old partitions — history is immutable.
  *
  * TEST-only surface (SURVEY §7.5.7: approximate ops are never
  * oracle-declared); SketchSpec pins the estimates within the configured
  * accuracy of exact distincts and proves append-only incrementality.
  */
object IncrementalDistinct {

  /** One sketch row per (day, event_type): `lgK = 12` ⇒ ≤ 0.8% standard
    * error at 4 kB max sketch size. `SaveMode.Append` + `partitionBy(day)`
    * is the incremental contract — call once per arriving day (or backfill
    * range); existing day partitions are never touched. Accidentally
    * re-appending a day is harmless for the DISTINCT estimates (HLL union
    * is idempotent over identical data) but doubles that day's `n_events`
    * sum — dedupe the ingest ledger, not the sketches. */
  def appendDailySketches(events: DataFrame, path: String,
      lgK: Int = 12): Unit =
    events
      .withColumn("day", to_date(col("ts")))
      .groupBy("day", "event_type")
      .agg(hll_sketch_agg(col("user_id"), lgK).as("sketch"),
        count(lit(1)).as("n_events"))
      .write.mode("append").partitionBy("day").parquet(path)

  /** The sketch table, optionally day-bounded — the bounds land on the
    * partition column so the scan reads only the matching day directories. */
  def sketches(spark: SparkSession, path: String,
      fromDay: Option[String] = None, toDay: Option[String] = None): DataFrame = {
    val t = spark.read.parquet(path)
    val lo = fromDay.map(d => col("day") >= lit(d)).getOrElse(lit(true))
    val hi = toDay.map(d => col("day") <= lit(d)).getOrElse(lit(true))
    t.filter(lo && hi)
  }

  /** Distinct-user estimate per event_type over a day window — one union
    * of kB sketches per type, no fact data touched. */
  def distinctUsersByType(spark: SparkSession, path: String,
      fromDay: Option[String] = None, toDay: Option[String] = None): DataFrame =
    sketches(spark, path, fromDay, toDay)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("distinct_users"),
        sum(col("n_events")).as("n_events"))
      .orderBy("event_type")

  /** Overall distinct-user estimate over a day window. An empty window (no
    * matching sketch partitions) estimates 0 — `hll_union_agg` over zero
    * rows yields NULL, which a bare getLong would turn into an NPE. */
  def distinctUsers(spark: SparkSession, path: String,
      fromDay: Option[String] = None, toDay: Option[String] = None): Long =
    sketches(spark, path, fromDay, toDay)
      .agg(coalesce(hll_sketch_estimate(hll_union_agg(col("sketch"))), lit(0L)))
      .head.getLong(0)
}
