package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names (dev loop; the driver
    // always passes exactly two)
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, Option.empty[Set[String]])
      case Array(a, b, c) => (a, b, Some(c.split(',').toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Deterministic (sorted) order + per-query timing + an end-of-run
    // failure roll-up: round 10 lost 38 queries to a single root cause
    // (events schema change) and the only evidence was 38 interleaved
    // stderr lines the driver's log tail didn't keep. The summary line is
    // the LAST thing printed, so any tail capture shows what failed.
    // SPARK_GRAFT_VERIFY_PAR (default 4) runs queries concurrently on the
    // shared session — each query writes its own directory and the only
    // shared mutable state (temp-view registration, Tables plan cache) is
    // idempotent, so overlap is safe and hides per-query plan/codegen
    // latency behind execution.
    val todo = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val par = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "4").toInt.max(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    val failed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    todo.foreach { case (name, fn) =>
      pool.execute { () =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          System.err.println(
            f"[verify] $name ok ${(System.nanoTime() - t0) / 1e9}%.2fs")
        } catch { case e: Throwable =>
          failed.add(name)
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    pool.shutdown()
    // awaitTermination's result matters (ADVICE r11): on timeout the
    // unfinished queries are in NEITHER the ok nor the FAILED list, so a
    // log-tail parse would mistake a truncated run for a clean one. Print
    // an explicit marker and stop the stragglers before summarizing.
    val finished =
      pool.awaitTermination(2, java.util.concurrent.TimeUnit.HOURS)
    if (!finished) {
      val cut = pool.shutdownNow().size()
      System.err.println(s"[verify] TIMED OUT after 2h: ~$cut queries " +
        "never started, in-flight ones abandoned — results are INCOMPLETE")
    }
    val nFail = failed.size()
    System.err.println(s"[verify] done: ${todo.size - nFail}/${todo.size} ok" +
      (if (finished) "" else " (TIMED OUT — incomplete)") +
      (if (nFail == 0) "" else
        s"; FAILED: ${failed.toArray.mkString(", ")}"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
