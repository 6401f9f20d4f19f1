package graft

import org.apache.spark.sql.SparkSession

/** Plan audit — prints `explain("formatted")` for selected queries and runs
  * automated assertions on the physical plans the 100 TB posture depends on:
  * parquet filter pushdown, column pruning, broadcast joins for dims,
  * TakeOrderedAndProject for top-k, whole-stage codegen presence.
  *
  * Usage: runMain graft.ExplainAudit [sfDir] [queryName...]
  *        (no query names → run the assertion suite and print a summary)
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (args.length > 1) {
      args.drop(1).foreach { name =>
        println(s"===== $name =====")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
      spark.stop(); return
    }

    def plan(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      // collect() (not count(): that builds a different plan) so THIS plan's
      // AQE finalizes — codegen spans only appear in the final plan
      df.collect()
      df.queryExecution.executedPlan.toString
    }

    val checks: Seq[(String, String, String => Boolean)] = Seq(
      ("filter_compound", "parquet filter pushdown (PushedFilters)",
        p => p.contains("PushedFilters: [") && !p.contains("PushedFilters: []")),
      ("agg_basic", "pruned read schema (only needed columns)",
        p => !p.contains("l_orderkey")),
      ("agg_basic", "partial+final hash aggregation",
        p => "HashAggregate".r.findAllIn(p).size >= 2),
      ("join_broadcast_inner", "dimension broadcast (BroadcastHashJoin)",
        p => p.contains("BroadcastHashJoin")),
      ("fw_first_match", "ruleset broadcast in first-match",
        p => p.contains("BroadcastHashJoin")),
      ("topk", "top-k without global sort (TakeOrderedAndProject)",
        p => p.contains("TakeOrderedAndProject")),
      ("topk_per_group", "per-group top-k limit pushdown (WindowGroupLimit)",
        p => p.contains("WindowGroupLimit")),
      ("join_left_anti", "anti join planned as broadcast/shuffle hash",
        p => p.contains("Anti")),
      ("sim_cosine_topk", "ANN baseline stays TakeOrdered (no full sort)",
        p => p.contains("TakeOrderedAndProject")),
      ("agg_basic", "whole-stage codegen present",
        p => p.contains("WholeStageCodegen") || p.contains("*(")),
      ("text_tokenize_tf", "generate+partial agg before exchange",
        p => p.indexOf("HashAggregate") < p.indexOf("Exchange")
          || p.contains("partial_count"))
    )

    var fails = 0
    checks.foreach { case (q, what, ok) =>
      val p = plan(q)
      val good = ok(p)
      if (!good) fails += 1
      println(s"${if (good) "PASS" else "FAIL"}  $q: $what")
      if (!good) println(p.linesIterator.take(40).mkString("\n"))
    }
    println(s"AUDIT ${if (fails == 0) "CLEAN" else s"$fails FAILURES"}")
    spark.stop()
    if (fails > 0) sys.exit(1)
  }
}
