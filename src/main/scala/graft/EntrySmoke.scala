package graft
import org.apache.spark.sql.SparkSession

/** Dev smoke: drives the flagship query and (optionally) the raw-text
  * firewall pipeline end-to-end. Usage:
  *   runMain graft.EntrySmoke [logPath confPath]
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(20, false)
    args match {
      case Array(logPath, confPath) =>
        val report = domain.LogParse.usageReportFromRaw(spark, logPath, confPath)
        println("RAW_REPORT:")
        report.show(50, false)
      case _ =>
    }
    spark.stop()
  }
}
