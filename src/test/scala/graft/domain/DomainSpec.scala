package graft.domain

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Raw-text domain path: ASA log parsing (A1/A3), config parsing +
  * object-group expansion (A2/A6), end-to-end usage report. */
class DomainSpec extends SparkSpec {

  test("ipToLong converts dotted quads (codegen'd, no UDF)") {
    import spark.implicits._
    val out = Seq("10.0.0.0", "192.168.0.44", "255.255.255.255", "0.0.0.1")
      .toDF("ip").select(LogParse.ipToLong(col("ip")).as("v"))
      .as[Long].collect().toSeq
    assert(out === Seq(167772160L, 3232235564L, 4294967295L, 1L))
  }

  test("parse106100 extracts fields, tolerates syslog prefix, drops malformed") {
    val raw = LogParse.readLogs(spark, resource("fwlogs/sample.log"))
    assert(raw.count() === 10)
    val parsed = LogParse.parse106100(raw)
    assert(parsed.count() === 6) // 4 junk/other-msgid lines dropped
    val byAcl = parsed.groupBy("acl").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byAcl === Map("acl_1" -> 5, "acl_2" -> 1))
    val prefixed = parsed.filter(col("src_ip") === LogParse.ipToLong(lit("10.0.3.3")))
    assert(prefixed.count() === 1) // the syslog-prefixed line parsed too
    val row = prefixed.collect()(0)
    assert(row.getAs[Long]("dst_ip") === 3232235783L) // 192.168.1.7
    assert(row.getAs[Int]("dst_port") === 8080)
  }

  test("gzipped logs read identically to plain text") {
    val plain = LogParse.parse106100(
      LogParse.readLogs(spark, resource("fwlogs/sample.log")))
    val gz = LogParse.parse106100(
      LogParse.readLogs(spark, resource("fwlogs/sample.log.gz")))
    assert(gz.count() === plain.count())
    assert(gz.exceptAll(plain).count() === 0)
  }

  test("parse106023 extracts implicit-deny lines") {
    val denies = LogParse.parse106023(
      LogParse.readLogs(spark, resource("fwlogs/sample.log")))
    val rows = denies.collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("acl") === "acl_2")
    assert(rows(0).getAs[Int]("dst_port") === 22)
  }

  test("generated volume corpus: raw syslog report equals parquet pipeline") {
    // the in-suite twin of graft.RawLogBench: same generator, same equality,
    // small scale — sf0.001 events, 2 copies, 2 gzip shards. Proves the
    // rendered config parses back to the fixture semantics (object-groups,
    // nested group-object, named/range ports), the 106100/106023 volume
    // lines round-trip, malformed lines drop, and the raw-path report
    // equals the oracle-checked flagship with hits exactly doubled.
    val work = java.nio.file.Files.createTempDirectory("rawlog").toString
    val (logDir, confPath, bytes, nLines) =
      RawLogVolume.generate(spark, "/root/testdata/sf0.001", work,
        copies = 2, files = 2)
    assert(bytes > 0 && nLines > 2000)
    val got = RawLogVolume.normalizedRows(
      LogParse.usageReportFromRaw(spark, logDir, confPath))
    val want = RawLogVolume.expected(spark, "/root/testdata/sf0.001", 2)
    assert(got === want,
      s"missing=${want.diff(got)} extra=${got.diff(want)}")
  }

  test("parseConfig expands object-groups in first-match order") {
    val conf = scala.io.Source.fromFile(resource("fwconf/sample.conf"))
      .getLines().toSeq
    val rules = Ruleset.parseConfig(conf)
    assert(rules.map(r => (r.acl, r.ruleSeq)) ===
      Seq(("acl_1", 10), ("acl_1", 20), ("acl_1", 30), ("acl_2", 10)))
    val r10 = rules.head
    assert(r10.srcs.map(_.cidr) === Seq("10.0.0.0/8"))
    assert(r10.dsts.map(_.cidr) === Seq("192.168.0.44/32", "192.168.1.0/24"))
    assert(r10.ports === Seq(Ruleset.PortEntry(80, 80),
      Ruleset.PortEntry(443, 443), Ruleset.PortEntry(8080, 8443)))
    // nested group-object resolves transitively
    val df = Ruleset.toRulesDf(spark, rules)
    assert(df.count() === 6 + 1 + 1 + 1) // cartesian expansion of arrays
  }

  test("parseConfig: named ports, forward group refs, loud undefined-group error") {
    val conf = Seq(
      "access-list acl_x extended permit tcp any object-group late-group eq www",
      "access-list acl_x extended permit tcp any any range ftp-data ftp",
      "object-group network late-group", // defined AFTER first reference
      " network-object host 192.168.0.99")
    val rules = Ruleset.parseConfig(conf)
    assert(rules.length === 2)
    assert(rules(0).ports === Seq(Ruleset.PortEntry(80, 80))) // www -> 80
    assert(rules(0).dsts.map(_.cidr) === Seq("192.168.0.99/32")) // forward ref
    assert(rules(1).ports === Seq(Ruleset.PortEntry(20, 21))) // ftp-data..ftp

    val bad = Seq("access-list a extended permit tcp any object-group nope eq 80")
    val err = intercept[IllegalArgumentException](Ruleset.parseConfig(bad))
    assert(err.getMessage.contains("nope"))
  }

  test("end-to-end raw pipeline: report matches hand-computed hit counts") {
    val rows = LogParse.usageReportFromRaw(spark,
      resource("fwlogs/sample.log"), resource("fwconf/sample.conf"))
      .collect()
    val report = rows
      .map(r => (r.getAs[String]("acl"), r.getAs[Int]("rule_seq")) ->
        r.getAs[Long]("hits")).toMap
    assert(report === Map(
      ("acl_1", 10) -> 3L, // 443 + 80 to web-servers, 8080 to 192.168.1.0/24
      ("acl_1", 20) -> 1L, // host 10.0.1.17 -> any :22
      ("acl_1", 30) -> 1L, // deny ip any any catch-all
      ("acl_2", 10) -> 1L, // udp port-range rule
      ("acl_2", -1) -> 1L  // the one 106023 default-deny line
    ))
    // 106023 traffic is reported as implicit-deny, never as a real rule
    val denyRow = rows.find(_.getAs[Int]("rule_seq") == -1).get
    assert(denyRow.getAs[String]("action") === "implicit-deny")
  }

  test("entry-level usage: dead group members report zero; brute-force equality") {
    import scala.jdk.CollectionConverters._
    // self-contained config with PLANTED dead members (a host and a port
    // range no traffic touches) — the report's reason to exist
    val conf = Seq(
      "object-group network targets",
      " network-object host 192.168.0.10",
      " network-object host 192.168.9.99", // dead
      "object-group service svc tcp",
      " port-object eq 80",
      " port-object range 9000 9100", // dead
      "access-list acl_a extended permit tcp 10.0.0.0 255.0.0.0 object-group targets object-group svc",
      "access-list acl_a extended deny ip any any")
    val log = Seq(
      "%ASA-6-106100: access-list acl_a permitted tcp inside/10.0.0.5(1024) -> outside/192.168.0.10(80) hit-cnt 1 first hit [0x0, 0x0]",
      "%ASA-6-106100: access-list acl_a permitted tcp inside/10.0.0.6(1025) -> outside/192.168.0.10(80) hit-cnt 1 first hit [0x0, 0x0]",
      "%ASA-6-106100: access-list acl_a denied tcp inside/10.0.0.7(1026) -> outside/1.2.3.4(22) hit-cnt 1 first hit [0x0, 0x0]")
    val dir = java.nio.file.Files.createTempDirectory("graft_entry")
    val confP = dir.resolve("c.conf"); java.nio.file.Files.write(confP, conf.asJava)
    val logP = dir.resolve("l.log"); java.nio.file.Files.write(logP, log.asJava)
    val got = LogParse.entryUsageFromRaw(spark, logP.toString, confP.toString)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getInt(3)) ->
        ((r.getString(4), r.getLong(5)))).toMap
    assert(got.size === 5 + 3) // one row per configured entry, nothing else
    assert(got(("acl_a", 10, "src", 0)) === (("10.0.0.0/8", 2L)))
    assert(got(("acl_a", 10, "dst", 0)) === (("192.168.0.10/32", 2L)))
    assert(got(("acl_a", 10, "dst", 1)) === (("192.168.9.99/32", 0L)))
    assert(got(("acl_a", 10, "port", 0)) === (("80-80", 2L)))
    assert(got(("acl_a", 10, "port", 1)) === (("9000-9100", 0L)))
    assert(got(("acl_a", 20, "src", 0)) === (("0.0.0.0/0", 1L)))
    assert(got(("acl_a", 20, "port", 0)) === (("0-65535", 1L)))

    // shared multi-group fixture: full equivalence with a brute-force
    // first-match + first-entry attribution model
    val sconf = scala.io.Source.fromFile(resource("fwconf/sample.conf"))
      .getLines().toSeq
    val rules = Ruleset.parseConfig(sconf)
    val parsed = LogParse.parse106100(
        LogParse.readLogs(spark, resource("fwlogs/sample.log")))
      .select("acl", "proto", "src_ip", "dst_ip", "dst_port").collect()
    val exp = scala.collection.mutable.Map
      .empty[(String, Int, String, Int), Long].withDefaultValue(0L)
    parsed.foreach { r =>
      val (acl, proto, s, d, p) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getInt(4).toLong)
      rules.find(rr => rr.acl == acl
          && (rr.proto == "ip" || rr.proto == proto)
          && rr.srcs.exists(e => s >= e.lo && s <= e.hi)
          && rr.dsts.exists(e => d >= e.lo && d <= e.hi)
          && rr.ports.exists(e => p >= e.lo && p <= e.hi))
        .foreach { rr =>
          exp((acl, rr.ruleSeq, "src",
            rr.srcs.indexWhere(e => s >= e.lo && s <= e.hi))) += 1
          exp((acl, rr.ruleSeq, "dst",
            rr.dsts.indexWhere(e => d >= e.lo && d <= e.hi))) += 1
          exp((acl, rr.ruleSeq, "port",
            rr.ports.indexWhere(e => p >= e.lo && p <= e.hi))) += 1
        }
    }
    val got2 = LogParse.entryUsageFromRaw(spark,
        resource("fwlogs/sample.log"), resource("fwconf/sample.conf"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getInt(3)) ->
        r.getLong(5)).toMap
    val allEntries = rules.flatMap(rr =>
      rr.srcs.indices.map(i => (rr.acl, rr.ruleSeq, "src", i)) ++
      rr.dsts.indices.map(i => (rr.acl, rr.ruleSeq, "dst", i)) ++
      rr.ports.indices.map(i => (rr.acl, rr.ruleSeq, "port", i))).toSet
    assert(got2.keySet === allEntries)
    allEntries.foreach(k => assert(got2(k) === exp(k), s"entry $k"))
  }

  test("fw_entry_usage equals the brute-force first-match + first-entry model") {
    val d = "/root/testdata/sf0.001"
    // fixture sanity: the entry expansion PARTITIONS each original range
    // (rule-level semantics unchanged) and contains multi-entry dims
    Fw.ruleset.zip(Fw.entryRuleset).foreach { case (r, er) =>
      assert(er.srcs.map(e => (e.lo, e.hi)).foldLeft(r.srcLo) {
        case (next, (lo, hi)) => assert(lo === next); hi + 1
      } === r.srcHi + 1)
      assert(er.ports.map(p => (p.lo, p.hi)).foldLeft(r.portLo) {
        case (next, (lo, hi)) => assert(lo === next); hi + 1
      } === r.portHi + 1)
    }
    assert(Fw.entryRuleset.exists(_.srcs.length > 1))

    val events = Fw.fwEvents(spark, d)
      .select("acl", "proto", "src_ip", "dst_ip", "dst_port").collect()
    val exp = scala.collection.mutable.Map
      .empty[(String, Int, String, Int), Long].withDefaultValue(0L)
    events.foreach { r =>
      val (acl, proto, s, dst, p) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getInt(4).toLong)
      Fw.entryRuleset.filter(_.acl == acl).sortBy(_.ruleSeq)
        .find(rr => (rr.proto == "ip" || rr.proto == proto)
          && rr.srcs.exists(e => s >= e.lo && s <= e.hi)
          && rr.dsts.exists(e => dst >= e.lo && dst <= e.hi)
          && rr.ports.exists(e => p >= e.lo && p <= e.hi))
        .foreach { rr =>
          exp((acl, rr.ruleSeq, "src",
            rr.srcs.indexWhere(e => s >= e.lo && s <= e.hi))) += 1
          exp((acl, rr.ruleSeq, "dst",
            rr.dsts.indexWhere(e => dst >= e.lo && dst <= e.hi))) += 1
          exp((acl, rr.ruleSeq, "port",
            rr.ports.indexWhere(e => p >= e.lo && p <= e.hi))) += 1
        }
    }
    val got = Fw.entryUsage(spark, d).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getInt(3)) ->
        r.getLong(5)).toMap
    val allEntries = Fw.entryRuleset.flatMap(rr =>
      rr.srcs.indices.map(i => (rr.acl, rr.ruleSeq, "src", i)) ++
      rr.dsts.indices.map(i => (rr.acl, rr.ruleSeq, "dst", i)) ++
      rr.ports.indices.map(i => (rr.acl, rr.ruleSeq, "port", i))).toSet
    assert(got.keySet === allEntries,
      "one row per configured entry, dead members included")
    allEntries.foreach(k => assert(got(k) === exp(k), s"entry $k"))
    // the report must be non-trivial on the fixture: live entries, dead
    // members of LIVE rules (the question rule-level usage can't answer),
    // and a split dimension with both halves exercised
    assert(got.values.exists(_ > 0))
    val liveRules = got.filter(_._2 > 0).keySet.map(k => (k._1, k._2))
    assert(got.exists { case (k, h) =>
      h === 0L && liveRules.contains((k._1, k._2)) },
      "a live rule must carry a dead member")
    assert(liveRules.exists { case (acl, seq) =>
      got.getOrElse((acl, seq, "dst", 0), 0L) > 0 &&
        got.getOrElse((acl, seq, "dst", 1), 0L) > 0 },
      "a split dst group must have both halves hit")
  }

  test("raw-config scalar matcher: OR-chains equal the cartesian join form") {
    import spark.implicits._
    // parsed rules have entry LISTS per side; firstMatchColRaw folds each
    // side to an OR-chain (linear terms) while matchFirst joins the full
    // src×dst×port expansion — brute force arbitrates both
    val conf = scala.io.Source.fromFile(resource("fwconf/sample.conf"))
      .getLines().toSeq
    val rawRules = Ruleset.parseConfig(conf)
    assert(rawRules.exists(r => r.dsts.length > 1 && r.ports.length > 1),
      "fixture must exercise multi-entry OR-chains")
    val rng = new scala.util.Random(7)
    val protos = Seq("tcp", "udp", "icmp")
    val events = (1 to 400).map { i =>
      if (rng.nextInt(10) < 7) { // inside some rule's box ~70% of the time
        val r = rawRules(rng.nextInt(rawRules.size))
        val s = r.srcs(rng.nextInt(r.srcs.size))
        val d = r.dsts(rng.nextInt(r.dsts.size))
        val p = r.ports(rng.nextInt(r.ports.size))
        (i.toLong, r.acl, protos(rng.nextInt(3)),
          s.lo + (if (s.hi > s.lo) rng.nextLong().abs % (s.hi - s.lo + 1) else 0L),
          d.lo + (if (d.hi > d.lo) rng.nextLong().abs % (d.hi - d.lo + 1) else 0L),
          p.lo + rng.nextInt(p.hi - p.lo + 1))
      } else
        (i.toLong, s"acl_${rng.nextInt(3)}", protos(rng.nextInt(3)),
          rng.nextLong().abs % (1L << 32), rng.nextLong().abs % (1L << 32),
          rng.nextInt(65536))
    }
    val eventsDf = events.toDF("event_id", "acl", "proto", "src_ip",
      "dst_ip", "dst_port")
    val expected = events.flatMap { case (id, acl, proto, src, dst, port) =>
      rawRules.find(r => r.acl == acl && (r.proto == "ip" || r.proto == proto) &&
          r.srcs.exists(e => src >= e.lo && src <= e.hi) &&
          r.dsts.exists(e => dst >= e.lo && dst <= e.hi) &&
          r.ports.exists(e => port >= e.lo && port <= e.hi))
        .map(r => id -> r.ruleSeq)
    }.toMap
    assert(expected.nonEmpty, "fixture should produce at least one match")
    val got = eventsDf.withColumn("rule_seq", Fw.firstMatchColRaw(rawRules))
      .filter(col("rule_seq").isNotNull).select("event_id", "rule_seq")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === expected)
    val joinGot = Fw.matchFirst(eventsDf,
        Ruleset.toRulesDf(spark, rawRules), "event_id")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(joinGot === expected)
  }

  test("raw-path report plan: map-side matcher, no per-event exchange") {
    // the scale gate for usageReportFromRaw: first-match must resolve in
    // the map stage (scalar matcher visible as a CASE WHEN dispatch), and
    // nothing may exchange per log line — no synthetic event id at all
    val report = LogParse.usageReportFromRaw(spark,
      resource("fwlogs/sample.log"), resource("fwconf/sample.conf"))
    report.collect()
    val plan = report.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(event_id"), plan.take(2000))
    assert(!plan.contains("monotonically_increasing_id"), plan.take(2000))
    assert(plan.contains("CASE WHEN"),
      "scalar first-match dispatch must appear in the executed plan")
    // one regex pass per line: a nullable-key or pre-agg IS NOT NULL
    // regression re-substitutes the parse under every matcher comparison
    // (measured: 84 regexp_replace occurrences, 3× slower at volume);
    // healthy plan has ~2 per branch (pushed line filter + pack project)
    val finalPlan = plan.split("== Initial Plan ==").head
    val nRegex = "regexp_replace".r.findAllIn(finalPlan).size
    assert(nRegex <= 8, s"parse re-substitution suspected: $nRegex regexp_replace nodes")
  }

  test("first-match join is equivalent to a brute-force linear scan") {
    import spark.implicits._
    // deterministic pseudo-random corpus: 300 events x 20 rules
    val rng = new scala.util.Random(42)
    val protos = Seq("tcp", "udp")
    val rules = (1 to 20).map { i =>
      val prefix = Seq(8, 16, 24, 32)(rng.nextInt(4))
      val base = (rng.nextLong().abs % (1L << 32)) & (-1L << (32 - prefix))
      val pLo = rng.nextInt(60000)
      Fw.Rule(s"acl_${rng.nextInt(3)}", i * 10,
        if (rng.nextBoolean()) "permit" else "deny",
        if (rng.nextInt(5) == 0) "ip" else protos(rng.nextInt(2)),
        "x", base, base + (1L << (32 - prefix)) - 1,
        "y", 0L, (1L << 32) - 1,
        pLo, pLo + rng.nextInt(5000))
    }
    // bias ~70% of events into some rule's (src, port) box so both matched
    // and unmatched paths are exercised; acl/proto still drawn independently
    // so first-match has to disambiguate overlapping candidates
    val events = (1 to 300).map { i =>
      if (rng.nextInt(10) < 7) {
        val r = rules(rng.nextInt(rules.size))
        (i.toLong, r.acl, protos(rng.nextInt(2)),
          r.srcLo + (if (r.srcHi > r.srcLo) rng.nextLong().abs % (r.srcHi - r.srcLo + 1) else 0L),
          rng.nextLong().abs % (1L << 32),
          r.portLo + rng.nextInt(r.portHi - r.portLo + 1))
      } else
        (i.toLong, s"acl_${rng.nextInt(3)}", protos(rng.nextInt(2)),
          rng.nextLong().abs % (1L << 32), rng.nextLong().abs % (1L << 32),
          rng.nextInt(65536))
    }
    val rulesDf = spark.createDataFrame(rules).toDF(
      "acl", "rule_seq", "action", "proto", "src_cidr", "src_lo", "src_hi",
      "dst_cidr", "dst_lo", "dst_hi", "port_lo", "port_hi")
    val eventsDf = events.toDF("event_id", "acl", "proto", "src_ip",
      "dst_ip", "dst_port")

    val got = Fw.matchFirst(eventsDf, rulesDf, "event_id")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap

    val expected = events.flatMap { case (id, acl, proto, src, dst, port) =>
      rules.find(r => r.acl == acl && (r.proto == "ip" || r.proto == proto) &&
          src >= r.srcLo && src <= r.srcHi &&
          dst >= r.dstLo && dst <= r.dstHi &&
          port >= r.portLo && port <= r.portHi)
        .map(r => id -> r.ruleSeq)
    }.toMap
    assert(got === expected)
    assert(expected.nonEmpty, "fixture should produce at least one match")

    // the shuffle-free expression form must agree with the join form
    val exprGot = eventsDf
      .withColumn("rule_seq", Fw.firstMatchCol(rules))
      .filter(col("rule_seq").isNotNull)
      .select("event_id", "rule_seq")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(exprGot === expected)
  }
}
