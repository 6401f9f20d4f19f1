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

  // WeakHashMap keyed on the session object itself: identity (not hashCode,
  // which can collide across sessions) and entries vanish when a session is
  // GC'd — a cached plan pins its session, so a strong key would leak every
  // stopped session for the JVM lifetime.
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, DataFrame]]())

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = cache.synchronized {
      var m = cache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        cache.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate(s"$dir/$name", {
      if (name == "events") {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read
          .parquet(s"$dir/events.parquet")
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
