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
}
