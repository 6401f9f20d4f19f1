package graft

import org.apache.spark.sql.SparkSession

import graft.domain.{LogParse, RawLogVolume}

/** Volume proof for the raw syslog→report path: generates a multi-hundred-MB
  * gzip ASA corpus from the sf events (sharded so the non-splittable gzip
  * still reads in parallel), runs [[LogParse.usageReportFromRaw]] over it,
  * asserts the report equals the parquet-derived flagship (hits × copies),
  * and prints one JSON line with uncompressed-MB/s parse throughput.
  *
  * Usage: runMain graft.RawLogBench [sfDir] [workDir] [copies] [files]
  */
object RawLogBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse("/tmp/graft_rawlog")
    val copies = args.lift(2).map(_.toInt).getOrElse(30)
    val files = args.lift(3).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (logDir, confPath, rawBytes, nLines) =
      RawLogVolume.generate(spark, sfDir, workDir, copies, files)
    val mb = rawBytes / 1e6
    println(f"[rawlog] generated $nLines%d lines, $mb%.0f MB uncompressed, " +
      s"$files gzip shards at $logDir")

    val t0 = System.nanoTime()
    val report = LogParse.usageReportFromRaw(spark, logDir, confPath)
    val got = RawLogVolume.normalizedRows(report)
    val sec = (System.nanoTime() - t0) / 1e9

    val want = RawLogVolume.expected(spark, sfDir, copies)
    val ok = got == want
    if (!ok) {
      println(s"[rawlog] MISMATCH missing=${want.diff(got)} extra=${got.diff(want)}")
    }
    val line = f"""{"metric":"rawlog_mb_per_sec","value":${mb / sec}%.1f,""" +
      f""""unit":"MB/s","mb":$mb%.1f,"sec":$sec%.2f,"lines":$nLines,""" +
      s""""copies":$copies,"files":$files,"report_equal":$ok,"sf":"$sfDir"}"""
    println(line)
    Artifacts.write("rawlog_bench.json", line)
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
