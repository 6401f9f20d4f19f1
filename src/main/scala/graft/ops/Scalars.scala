package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY.md §2 B8 scalar-function families — filled in phase P3. */
object Scalars {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
