package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided parquet tables (TESTDATA.md).
  *
  * Design notes (SURVEY.md §1.3):
  *  - `events.parquet` carries `timestamp[ns]`, which Spark 4 refuses to read
  *    by default (`PARQUET_TYPE_ILLEGAL`). We read ns-as-long and truncate to
  *    microseconds with integer division — `ts div 1000` stays in Long space
  *    (a double division would lose bits above 2^53 and corrupt microseconds)
  *    and matches DuckDB's silent ns→µs truncation bit-exactly.
  *  - DataFrames are memoized per (session, path): plan construction is cheap
  *    but schema discovery is a driver round-trip per call, and Bench runs
  *    many queries against the same files in one session.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  // Per-session plan cache, purged on access. Rounds 1–3 used a WeakHashMap,
  // but that never reclaims anything here: the cached DataFrames strongly
  // reference their SparkSession — the map's key — so every entry's value
  // keeps its own key reachable (the classic value→key WeakHashMap trap).
  // The honest lifetime is explicit: key strongly on the session object
  // (identity — hashCode could collide across sessions) and drop any entry
  // whose underlying SparkContext has stopped before each lookup. Sessions
  // cloned via newSession() share one context and thus expire together,
  // which matches when their cached plans actually die.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, DataFrame]]()

  private def purgeStopped(): Unit = {
    val it = cache.keySet.iterator
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
  }

  /** Live entry count, for tests/diagnostics (post-purge). */
  private[core] def cachedSessionCount: Int = { purgeStopped(); cache.size }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    purgeStopped()
    val perSession = cache.computeIfAbsent(spark,
      _ => scala.collection.concurrent.TrieMap.empty[String, DataFrame])
    perSession.getOrElseUpdate(s"$dir/$name", {
      if (name == "events") {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(s"$dir/events.parquet")
        raw.schema("ts").dataType match {
          // timestamp[ns] files (nanosAsLong): truncate to µs in Long space
          case org.apache.spark.sql.types.LongType =>
            raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          // timestamp[us] files arrive as TIMESTAMP_NTZ; reinterpret the
          // wall-clock as UTC instant (sessions run with UTC timezone, so
          // the cast is value-preserving and matches DuckDB's TIMESTAMP)
          case _: org.apache.spark.sql.types.TimestampNTZType =>
            raw.withColumn("ts", col("ts").cast("timestamp"))
          case _ => raw
        }
      } else spark.read.parquet(s"$dir/$name.parquet")
    })
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
