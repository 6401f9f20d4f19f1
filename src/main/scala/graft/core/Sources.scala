package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Non-parquet sources and the partitioned sink — SURVEY.md §2 B1.2/B1.5.
  *
  * Schemas are always explicit (`inferSchema` double-scans the data and can
  * drift between runs — determinism rule, SURVEY §1.3); the partitioned sink
  * is the 100 TB story: date/key-partitioned layout so downstream scans
  * prune directories instead of reading everything.
  */
object Sources {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE") // malformed rows → nulls, never throws
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** PERMISSIVE read that CAPTURES each malformed source line verbatim in
    * a `_corrupt` column (null for clean rows), so callers can route bad
    * rows to a dead-letter sink and alert on their rate instead of
    * silently nulling them — the production quarantine pattern. The
    * corrupt column must be part of the declared schema; Spark refuses
    * queries that project ONLY the corrupt column (cache first if you
    * need that). */
  def readCsvQuarantine(spark: SparkSession, path: String,
      schema: StructType, header: Boolean = true): DataFrame =
    spark.read.schema(schema.add("_corrupt", org.apache.spark.sql.types.StringType))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** Hive-style partitioned parquet sink. Readers get partition pruning for
    * free on `partitionCols` predicates. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
