package graft

/** Gates the physical-plan shapes every round, not just when someone
  * remembers to run the ExplainAudit main. Runs at sf0.001 so the whole
  * audit (one collect per distinct query) stays in seconds. */
class ExplainAuditSpec extends SparkSpec {
  test("physical plans keep their 100TB-posture shapes") {
    val results = ExplainAudit.run(spark, "/root/testdata/sf0.001")
    val failed = results.filterNot(_._3)
    assert(failed.isEmpty, failed.map { case (q, what, _, p) =>
      s"$q: $what\n${p.linesIterator.take(30).mkString("\n")}"
    }.mkString("\n\n"))
  }

  // The fw checks mix negative spellings (!contains("hashpartitioning(
  // event_id")) with positive structure (matcher-once). Negative checks
  // pass vacuously if the spelling ever drifts — so prove the pair is NOT
  // vacuous by building both known regressions and watching them fail.
  test("audit checks are not vacuous: known regressed plans actually fail") {
    import org.apache.spark.sql.functions._
    import graft.domain.Fw
    val d = "/root/testdata/sf0.001"

    // regression 1: the pre-r5 per-event join + groupBy(event_id)
    // formulation of fw_hit_count — a full-fact shuffle at scale
    val joined = Fw.matchFirst(Fw.fwEvents(spark, d), Fw.rulesDf(spark),
        "event_id")
      .groupBy("acl", "rule_seq").agg(count(lit(1)).as("hits"))
    joined.collect()
    val joinedPlan = joined.queryExecution.executedPlan.toString
    val perEvent = ExplainAudit.checks.find { case (q, what, _) =>
      q == "fw_hit_count" && what.startsWith("no per-event exchange") }.get._3
    assert(!perEvent(joinedPlan),
      "per-event-exchange check must fail on the old join+groupBy path")

    // regression 2: the r6 double-evaluation — a deterministic (pushable)
    // filter over the matcher column lets the optimizer substitute the
    // whole matcher tree into a scan-level filter, evaluating it twice
    val pushed = Fw.fwEvents(spark, d)
      .withColumn("rule_seq",
        coalesce(Fw.firstMatchCol(Fw.ruleset), lit(-2)))
      .where(col("rule_seq") =!= -2)
      .groupBy("acl", "rule_seq").agg(count(lit(1)).as("hits"))
    pushed.collect()
    val pushedPlan = pushed.queryExecution.executedPlan.toString
    assert(!ExplainAudit.matcherOnce(pushedPlan),
      "matcher-once check must fail when the filter pushes below the " +
        "matcher projection (double evaluation)")
    // ...and the declared query's plan still passes it, same session
    val good = SparkEntry.queries("fw_hit_count")(spark, d)
    good.collect()
    assert(ExplainAudit.matcherOnce(good.queryExecution.executedPlan.toString))
  }
}
