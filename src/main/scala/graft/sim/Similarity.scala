package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY.md §2 B9 similarity/dedup — filled in phase P5. */
object Similarity {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
