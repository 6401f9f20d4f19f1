package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY.md §2 B9 text analytics — filled in phase P5. */
object TextOps {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
