package graft.domain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Firewall-ruleset usage analysis — the reference's headline capability
  * (SURVEY.md §1.1, §2 Part A), recast Spark-first.
  *
  * The reference matches each connection-log event against an *ordered*
  * ruleset with first-match semantics (linear scan per event: CIDR containment
  * on src/dst, port range, protocol equality), sums hits per rule, and reports
  * per-rule usage plus the rules that were never hit.
  *
  * Spark design — two matchers, chosen by where the ruleset lives:
  *
  *  - [[firstMatchCol]] (a literal ruleset, the declared queries): first-match
  *    is a pure scalar expression evaluated per event in the map stage — no
  *    join and NO per-event aggregation, so the only exchange in the whole
  *    count family is the final partial+final hash aggregate over the tiny
  *    (acl, rule_seq) keyspace. At 100 TB the fact table never shuffles at
  *    all. (An earlier round disambiguated first-match with
  *    `groupBy(event_id).agg(min(rule_seq))` after a broadcast join — correct,
  *    but that groupBy exchanges ONE ROW PER EVENT: a full-fact shuffle that
  *    dominates everything at scale. ExplainAudit now pins its absence.)
  *  - [[matchFirst]] (a ruleset that is runtime DATA — a DataFrame whose
  *    rows are not known on the driver): broadcast the rules, equi-join on
  *    `acl` with range residuals, then `min(rule_seq)` per event. The
  *    per-event groupBy is the price of a truly data-driven ruleset; the
  *    broadcast keeps the match itself shuffle-free. The parsed-config raw
  *    path in [[LogParse]] does NOT pay this price: `parseConfig` yields
  *    driver-side rules, so [[firstMatchColRaw]] builds the scalar matcher
  *    from them and the raw path is map-only too.
  *
  * No raw firewall logs ship in testdata, so the oracle-checked queries run
  * over a deterministic in-query derivation from `events` (FIXTURES.md §2);
  * the raw ASA-text parsing path is in [[LogParse]] and is ScalaTest-covered.
  */
object Fw {

  /** One expanded firewall rule. CIDRs are precomputed to inclusive long
    * ranges; `cidr` strings are carried for the human-readable report. */
  final case class Rule(
      acl: String, ruleSeq: Int, action: String, proto: String,
      srcCidr: String, srcLo: Long, srcHi: Long,
      dstCidr: String, dstLo: Long, dstHi: Long,
      portLo: Int, portHi: Int)

  def ipToLong(ip: String): Long =
    ip.split('.').foldLeft(0L)((acc, o) => acc * 256 + o.toLong)

  private def rule(acl: String, seq: Int, action: String,
      src: String, dst: String, portLo: Int, portHi: Int): Rule = {
    def range(cidr: String): (Long, Long) = {
      val Array(ip, pfx) = cidr.split('/')
      val lo = ipToLong(ip)
      (lo, lo + (1L << (32 - pfx.toInt)) - 1)
    }
    val (slo, shi) = range(src)
    val (dlo, dhi) = range(dst)
    Rule(acl, seq, action, "tcp", src, slo, shi, dst, dlo, dhi, portLo, portHi)
  }

  /** The fixture ruleset (FIXTURES.md §2): per-ACL specific rules + catch-all
    * deny, one rule shadowed by an earlier catch-all (must count 0 via
    * first-match), and one rule on a nonexistent ACL (never matches — keeps
    * the unused-rules report non-empty). */
  val ruleset: Seq[Rule] = Seq(
    rule("acl_0", 10, "permit", "10.0.0.0/8",  "192.168.0.0/24",   80,    80),
    rule("acl_0", 20, "permit", "10.0.0.0/8",  "192.168.0.0/24",  443,   443),
    rule("acl_0", 30, "deny",   "10.0.0.0/8",  "192.168.0.0/24",    1, 65535),
    rule("acl_0", 40, "permit", "10.0.0.0/8",  "192.168.0.0/24",   80,  8443), // shadowed by seq 30
    rule("acl_1", 10, "permit", "10.0.5.0/24", "192.168.0.0/24",    1, 65535),
    rule("acl_1", 20, "permit", "10.0.0.0/8",  "192.168.0.0/25",    1,  1023),
    rule("acl_1", 30, "deny",   "10.0.0.0/8",  "192.168.0.0/24",    1, 65535),
    rule("acl_2", 10, "permit", "10.0.0.0/8",  "192.168.0.0/24", 8080,  8443),
    rule("acl_2", 20, "permit", "10.0.0.0/9",  "192.168.0.128/25",  1, 65535),
    rule("acl_2", 30, "deny",   "10.0.0.0/8",  "192.168.0.0/24",    1, 65535),
    rule("acl_3", 10, "permit", "10.0.0.0/8",  "192.168.0.0/24",    1, 65535),
    rule("acl_9", 99, "permit", "10.0.0.0/8",  "192.168.0.0/24",    1, 65535)  // ACL never referenced
  )

  private val ruleCols = Seq("acl", "rule_seq", "action", "proto",
    "src_cidr", "src_lo", "src_hi", "dst_cidr", "dst_lo", "dst_hi",
    "port_lo", "port_hi")

  def rulesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ruleset.map(r => (r.acl, r.ruleSeq, r.action, r.proto, r.srcCidr, r.srcLo,
      r.srcHi, r.dstCidr, r.dstLo, r.dstHi, r.portLo, r.portHi))
      .toDF(ruleCols: _*)
  }

  /** A ruleset as a named SQL VALUES CTE — generated from the same
    * constants as the DataFrame side so Spark and the DuckDB oracle can
    * never drift. */
  def rulesSqlCteFor(name: String, rules: Seq[Rule]): String = {
    val rows = rules.map(r =>
      s"('${r.acl}', ${r.ruleSeq}, '${r.action}', '${r.proto}', " +
      s"'${r.srcCidr}', ${r.srcLo}, ${r.srcHi}, " +
      s"'${r.dstCidr}', ${r.dstLo}, ${r.dstHi}, ${r.portLo}, ${r.portHi})")
      .mkString(", ")
    s"$name(${ruleCols.mkString(", ")}) AS (SELECT * FROM (VALUES $rows))"
  }

  def rulesSqlCte: String = rulesSqlCteFor("rules", ruleset)

  /** Entry-expanded revision of [[ruleset]] for the ENTRY-level usage
    * report (`fw_entry_usage`, A6/A13): each dimension's single range is
    * split into a PARTITION of sub-entries (the object-group members), so
    * rule-level first-match semantics are IDENTICAL to [[ruleset]] — a
    * rule matches iff some member of each dimension covers the event, and
    * the members union exactly to the original range. Derived by
    * TRANSFORMING the live constants (the [[prevRuleset]] discipline:
    * never a second hand-copied list that could drift). Naturally-dead
    * members make the report non-trivial: derived traffic sources live in
    * 10.0.0.0/16 and ports in {22,80,443,8080,8443}, so the upper half of
    * every split source group (and most split port bands) is dead weight —
    * exactly what the entry report exists to find. */
  val entryRuleset: Seq[Ruleset.RawRule] = ruleset.map { r =>
    def ip(v: Long) =
      s"${(v >> 24) & 255}.${(v >> 16) & 255}.${(v >> 8) & 255}.${v & 255}"
    def halves(cidr: String, lo: Long, hi: Long): Seq[Ruleset.NetEntry] = {
      val pfx = cidr.split('/')(1).toInt
      if (pfx >= 32) Seq(Ruleset.NetEntry(cidr, lo, hi))
      else {
        val mid = lo + (hi - lo) / 2
        Seq(Ruleset.NetEntry(s"${ip(lo)}/${pfx + 1}", lo, mid),
          Ruleset.NetEntry(s"${ip(mid + 1)}/${pfx + 1}", mid + 1, hi))
      }
    }
    def portSplit(lo: Int, hi: Int): Seq[Ruleset.PortEntry] =
      if (lo >= hi) Seq(Ruleset.PortEntry(lo, hi))
      else {
        val mid = (lo + hi) / 2
        Seq(Ruleset.PortEntry(lo, mid), Ruleset.PortEntry(mid + 1, hi))
      }
    Ruleset.RawRule(r.acl, r.ruleSeq, r.action, r.proto,
      halves(r.srcCidr, r.srcLo, r.srcHi),
      halves(r.dstCidr, r.dstLo, r.dstHi),
      portSplit(r.portLo, r.portHi))
  }

  /** The "previous revision" of the fixture ruleset for the churn report —
    * derived by TRANSFORMING the live [[ruleset]] constants (never a second
    * hand-copied list, so the two revisions cannot drift apart): since this
    * revision, acl_0/40 was added, acl_2/10's port band was widened
    * (8090 → 8443), and a deny on acl_1 seq 15 was removed. */
  val prevRuleset: Seq[Rule] = ruleset.flatMap {
    case r if r.acl == "acl_0" && r.ruleSeq == 40 => None
    case r if r.acl == "acl_2" && r.ruleSeq == 10 => Some(r.copy(portHi = 8090))
    case r => Some(r)
  } :+ rule("acl_1", 15, "deny", "10.9.0.0/16", "192.168.0.0/24", 1, 65535)

  def prevRulesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    prevRuleset.map(r => (r.acl, r.ruleSeq, r.action, r.proto, r.srcCidr,
      r.srcLo, r.srcHi, r.dstCidr, r.dstLo, r.dstHi, r.portLo, r.portHi))
      .toDF(ruleCols: _*)
  }

  /** Deterministic connection-log derivation from an `events`-shaped
    * DataFrame (FIXTURES.md §2) — shared by the batch queries and the
    * streaming twin so the two can never drift. FLOOR before the bigint
    * cast: Spark's double→long cast truncates while DuckDB's rounds
    * half-even, so the truncation must be explicit. */
  def deriveFw(events: DataFrame): DataFrame = deriveFwMod(events, 4)

  /** Same derivation with a configurable ACL universe: `aclMod` = 5 sends a
    * fifth of the traffic to `acl_4`, which has no configured rules — the
    * analog of traffic that falls through to the implicit default-deny
    * (ASA message 106023), used by `fw_deny_stats`. */
  def deriveFwMod(events: DataFrame, aclMod: Int): DataFrame =
    events.select(
      col("event_id"),
      col("ts"),
      (lit(167772160L) + (col("user_id") % 256) * 256 + (col("event_id") % 256))
        .as("src_ip"),
      (lit(3232235520L) + (floor(col("value")).cast("long") % 256)).as("dst_ip"),
      when(col("event_type") === "view", 80)
        .when(col("event_type") === "click", 443)
        .when(col("event_type") === "signup", 8443)
        .when(col("event_type") === "purchase", 8080)
        .otherwise(22).as("dst_port"),
      lit("tcp").as("proto"),
      concat(lit("acl_"), (col("user_id") % aclMod).cast("string")).as("acl"))

  def fwEvents(spark: SparkSession, dir: String): DataFrame =
    deriveFw(Tables.events(spark, dir))

  /** The identical derivation as a SQL CTE, parameterized like
    * [[deriveFwMod]] so Spark and oracle can never drift. */
  def fwSqlCteMod(name: String, aclMod: Int): String =
    s"""$name AS (SELECT event_id, ts,
       |  167772160 + (user_id % 256) * 256 + (event_id % 256) AS src_ip,
       |  3232235520 + (CAST(FLOOR(value) AS BIGINT) % 256) AS dst_ip,
       |  CASE event_type WHEN 'view' THEN 80 WHEN 'click' THEN 443
       |    WHEN 'signup' THEN 8443 WHEN 'purchase' THEN 8080 ELSE 22 END AS dst_port,
       |  'tcp' AS proto,
       |  'acl_' || CAST(user_id % $aclMod AS VARCHAR) AS acl
       |FROM events)""".stripMargin

  val fwSqlCte: String = fwSqlCteMod("fw", 4)

  // `proto = 'ip'` in a rule matches any protocol (Cisco semantics).
  private val matchCondSql =
    """e.acl = r.acl AND (r.proto = 'ip' OR e.proto = r.proto)
      |  AND e.src_ip BETWEEN r.src_lo AND r.src_hi
      |  AND e.dst_ip BETWEEN r.dst_lo AND r.dst_hi
      |  AND e.dst_port BETWEEN r.port_lo AND r.port_hi""".stripMargin

  /** Generic first-match join: `events` needs columns (acl, proto, src_ip,
    * dst_ip, dst_port) plus a unique `idCol`; `rules` the flat rule schema.
    * Equi-keyed on acl (BroadcastHashJoin) with range residuals; the
    * reference's ordered linear scan becomes min(rule_seq) per event. */
  def matchFirst(events: DataFrame, rules: DataFrame, idCol: String): DataFrame =
    events.alias("e")
      .join(broadcast(rules).alias("r"), expr(matchCondSql))
      .groupBy(col(s"e.$idCol").as(idCol), col("e.acl").as("acl"))
      .agg(min(col("r.rule_seq")).as("rule_seq"))

  /** First-match as a pure scalar expression over a literal ruleset — the
    * reference's per-event linear scan, fully codegen'd: a `when` chain
    * DISPATCHES on the event's `acl`, and each branch unrolls that ACL's
    * rules into `least(when(match₁, seq₁), when(match₂, seq₂), …)` — `least`
    * ignores NULLs, so each branch is min-rule_seq-over-matches within the
    * ACL, NULL when nothing matches. Per event this evaluates one string
    * dispatch plus only the few rules of its own ACL — the same work a hash
    * probe + residual checks would do, without the join. (Two rejected
    * forms, both measured: `array_min(transform(filter(typedLit(rules),…)))`
    * runs the lambda INTERPRETED per row — HigherOrderFunctions don't
    * codegen; and a flat un-dispatched `least` over all rules re-evaluates
    * every other ACL's predicates per event, which is what made the round-4
    * A/B read ~2× slower than the broadcast join. With the dispatch this
    * form wins: no join, no shuffle, no per-event aggregation state — which
    * also makes it legal after a streaming watermark, where a
    * join+groupBy(event) formulation trips Spark's multi-stateful-operator
    * correctness check.) */
  def firstMatchCol(rules: Seq[Rule]): Column =
    firstMatchColRaw(rules.map(r => Ruleset.RawRule(r.acl, r.ruleSeq, r.action,
      r.proto,
      Seq(Ruleset.NetEntry(r.srcCidr, r.srcLo, r.srcHi)),
      Seq(Ruleset.NetEntry(r.dstCidr, r.dstLo, r.dstHi)),
      Seq(Ruleset.PortEntry(r.portLo, r.portHi)))))

  /** [[firstMatchCol]] over PARSED config rules ([[Ruleset.RawRule]]), whose
    * src/dst/port sides are entry LISTS (object-group expansions). A rule
    * matches iff some (src × dst × port) combination matches, and the
    * product distributes: ∃s ∃d ∃p (s ∧ d ∧ p) ≡ (∃s) ∧ (∃d) ∧ (∃p) — so
    * each side becomes an OR-chain and the expression stays LINEAR in the
    * config's entry count, never the cartesian blow-up the join-side
    * `toRulesDf` expansion pays. This is what lets the raw-config path use
    * the same map-side matcher as the literal fixture ruleset. */
  def firstMatchColRaw(rules: Seq[Ruleset.RawRule]): Column = {
    require(rules.nonEmpty, "empty ruleset")
    def anyOf(preds: Seq[Column]): Column = preds.reduce(_ || _)
    def ruleMatch(r: Ruleset.RawRule): Column = {
      // proto is a driver constant: 'ip' (matches anything) drops the term
      // entirely instead of emitting a runtime-trivial comparison
      val ranges =
        anyOf(r.srcs.map(e => col("src_ip").between(e.lo, e.hi))) &&
        anyOf(r.dsts.map(e => col("dst_ip").between(e.lo, e.hi))) &&
        anyOf(r.ports.map(p => col("dst_port").between(p.lo, p.hi)))
      when(if (r.proto == "ip") ranges
           else (col("proto") === r.proto) && ranges,
        lit(r.ruleSeq))
    }
    val branches = rules.groupBy(_.acl).toSeq.sortBy(_._1).map { case (acl, rs) =>
      val scan = rs.sortBy(_.ruleSeq).map(ruleMatch)
      (col("acl") === acl, if (scan.length == 1) scan.head else least(scan: _*))
    }
    branches.tail.foldLeft(when(branches.head._1, branches.head._2)) {
      case (chain, (pred, v)) => chain.when(pred, v)
    }
  }

  /** Pins a computed column so it is evaluated WHERE IT IS WRITTEN —
    * exactly once. Catalyst pushes filters through a deterministic
    * projection REGARDLESS of the filter's own determinism (a projection
    * never changes cardinality, so the push is always "safe"), and the push
    * SUBSTITUTES the projection's expression into the moved predicate: a
    * filter over the matcher column becomes a scan-level copy of the whole
    * matcher (and the event derivation under it), evaluated per row in
    * addition to the projection's own copy. Measured on the count family at
    * sf0.1: 1.18 s doubled vs 0.41 s evaluated once.
    *
    * The wrapper marks the projected FIELD nondeterministic —
    * `fields.forall(_.deterministic)` is the one gate the
    * push-through-Project rule respects — with zero execution cost
    * (codegen emits exactly the child's code).
    *
    * History, because this regressed SILENTLY once already: the first
    * barrier marked the FILTER nondeterministic via an always-false
    * `pred || rand(7) < -1.0` arm. Spark 4.1.2 is range-aware about
    * `rand()` — it folds the arm to `false` and drops it — and a
    * nondeterministic filter condition never blocked the through-Project
    * push anyway (only scan-level DataFilters), so the matcher silently
    * doubled while every result hash stayed green. The opaque
    * [[org.apache.spark.sql.graftexpr.EvalHereExpr]] has no range or
    * algebra for any optimizer version to exploit (its scaladoc records
    * the stage-retry trade), and ExplainAudit's matcher-once gate
    * ([[matcherLeastCount]]) counts matcher trees in every count-family
    * plan so a future bypass turns a red test, not a silent 2×.
    *
    * SECOND trade, beyond stage-retry: a nondeterministic projected field
    * blocks push-through-Project for EVERY later filter, not just the
    * sentinel one — a scan-pushable predicate applied AFTER the pinned
    * projection (a time/day filter, say) silently loses parquet pushdown
    * and partition pruning. Rule for future fw queries: apply scan-level
    * predicates to the fact table BEFORE [[matchedScalar]]'s projection
    * (they push from there), and keep only matcher-derived filters above
    * the pin. */
  private def pinnedHere(c: Column): Column =
    org.apache.spark.sql.graftexpr.EvalHereExpr.column(c)

  /** Number of `least(` nodes in ONE instantiation of [[firstMatchCol]]
    * over the fixture [[ruleset]]: ACLs with ≥2 rules fold their ordered
    * scan into a single `least(CASE WHEN …)`; single-rule ACLs emit a bare
    * CASE. ExplainAudit counts `least(CASE WHEN` occurrences in each fw
    * count-family final plan against this constant — the known regression
    * (filter pushed below the matcher projection with full alias
    * substitution, the 2.8× double evaluation) duplicates the whole tree
    * and doubles the count, so equality-not-just-presence is the gate. */
  val matcherLeastCount: Int =
    ruleset.groupBy(_.acl).count { case (_, rs) => rs.size >= 2 }

  /** Matched events via the scalar matcher: ONE narrow projection over the
    * fact table — no join, no exchange. Carries every event column plus the
    * matched `rule_seq`, so each count-family query below aggregates straight
    * into its own (tiny) keyspace with map-side partials. Unmatched rows
    * carry a non-null -2 sentinel (dropped by the filter above the pinned
    * projection, and the non-nullable key also keeps join-constraint
    * inference from re-manufacturing a pushable IS NOT NULL in the report
    * joins). The matcher column itself is [[pinnedHere]] so the filter can
    * never be pushed through it with the matcher substituted in — the
    * double-evaluation regression the matcher-once plan gate watches for. */
  private def matchedScalar(spark: SparkSession, dir: String): DataFrame =
    fwEvents(spark, dir)
      .withColumn("rule_seq",
        pinnedHere(coalesce(firstMatchCol(ruleset), lit(-2))))
      .where(col("rule_seq") =!= -2)

  private def hits(spark: SparkSession, dir: String): DataFrame =
    matchedScalar(spark, dir).groupBy("acl", "rule_seq")
      .agg(count(lit(1)).as("hits"))

  private val firstMatchSqlCte: String =
    s"""matched AS (
       |  SELECT e.event_id, e.acl, MIN(r.rule_seq) AS rule_seq,
       |         MIN(e.src_ip) AS src_ip, MIN(e.ts) AS ts
       |  FROM fw e JOIN rules r ON $matchCondSql
       |  GROUP BY e.event_id, e.acl),
       |hits AS (SELECT acl, rule_seq, COUNT(*) AS hits FROM matched GROUP BY acl, rule_seq)""".stripMargin

  private def withCtes(body: String): String =
    s"WITH $fwSqlCte, $rulesSqlCte, $firstMatchSqlCte $body"

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fw_parse" -> ((s, d) => fwEvents(s, d).orderBy("event_id")),
    "fw_first_match" -> ((s, d) =>
      matchedScalar(s, d).select("event_id", "acl", "rule_seq")
        .orderBy("event_id")),
    "fw_hit_count" -> ((s, d) => hits(s, d).orderBy("acl", "rule_seq")),
    "fw_unused_rules" -> ((s, d) =>
      rulesDf(s).join(hits(s, d), Seq("acl", "rule_seq"), "left_anti")
        .select("acl", "rule_seq", "action", "src_cidr", "dst_cidr")
        .orderBy("acl", "rule_seq")),
    "fw_usage_report" -> ((s, d) => usageReport(s, d)),
    "fw_entry_usage" -> ((s, d) => entryUsage(s, d)),
    "fw_top_talkers" -> ((s, d) =>
      // heaviest sources: per src_ip event count + distinct ACLs touched
      matchedScalar(s, d).groupBy("src_ip")
        .agg(count(lit(1)).as("hits"),
          countDistinct(col("acl")).as("n_acls"))
        .orderBy(desc("hits"), asc("src_ip"))
        .limit(25)),
    "fw_action_share" -> ((s, d) =>
      // permit vs deny traffic share per ACL: aggregate to per-rule hit
      // counts FIRST, then join the ruleset for its action — the join and
      // re-aggregation touch ruleset-sized data, never the fact stream
      hits(s, d)
        .join(broadcast(rulesDf(s)), Seq("acl", "rule_seq"))
        .groupBy("acl", "action")
        .agg(sum("hits").as("hits"))
        .orderBy("acl", "action")),
    // Static ruleset lint: rule pairs where an EARLIER rule's match space
    // fully contains a later one's — the later rule can never fire (the
    // structural cause behind most "unused rule" findings, vs. the traffic-
    // based evidence of fw_unused_rules). Pure dimension-side self-join:
    // ruleset-sized (thousands), never touches the fact table, so it costs
    // nothing at any traffic scale.
    "fw_shadowed_rules" -> ((s, d) =>
      rulesDf(s).alias("r1").join(rulesDf(s).alias("r2"),
          col("r1.acl") === col("r2.acl")
            && col("r1.rule_seq") < col("r2.rule_seq")
            && (col("r1.proto") === "ip" || col("r1.proto") === col("r2.proto"))
            && col("r1.src_lo") <= col("r2.src_lo")
            && col("r1.src_hi") >= col("r2.src_hi")
            && col("r1.dst_lo") <= col("r2.dst_lo")
            && col("r1.dst_hi") >= col("r2.dst_hi")
            && col("r1.port_lo") <= col("r2.port_lo")
            && col("r1.port_hi") >= col("r2.port_hi"))
        .select(col("r1.acl").as("acl"),
          col("r1.rule_seq").as("shadowing_seq"),
          col("r1.action").as("shadowing_action"),
          col("r2.rule_seq").as("shadowed_seq"),
          col("r2.action").as("shadowed_action"))
        .orderBy("acl", "shadowing_seq", "shadowed_seq")),
    // Rule usage over time — the "is this rule still exercised, and when"
    // dimension of the usage report: hourly hit series per ACL. At scale
    // this is the scalar-matched fact stream feeding a (bucket, acl)
    // aggregation whose keyspace is hours × acls — tiny, no skew. (The
    // countDistinct exchanges (bucket, acl, src_ip) triples — the declared
    // result needs them; that is distinct-source cardinality, not a
    // per-event shuffle.)
    "fw_hits_timeseries" -> ((s, d) =>
      matchedScalar(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("acl"))
        .agg(count(lit(1)).as("hits"),
          countDistinct(col("src_ip")).as("distinct_sources"))
        .select(col("window.start").as("bucket_start"), col("acl"),
          col("hits"), col("distinct_sources"))
        .orderBy("bucket_start", "acl")),
    "fw_per_rule_stats" -> ((s, d) =>
      matchedScalar(s, d).groupBy("acl", "rule_seq")
        .agg(count(lit(1)).as("hits"),
          countDistinct(col("src_ip")).as("distinct_sources"),
          min(col("ts")).as("first_seen"),
          max(col("ts")).as("last_seen"))
        .orderBy("acl", "rule_seq")),
    // Horizontal-sweep detection (the classic firewall-log security query):
    // sources touching unusually many distinct destinations. One pass over
    // the derived connection log, no rule join at all — a groupBy(src_ip)
    // whose keyspace is the source-address population; two COUNT(DISTINCT)s
    // expand to the standard two-phase distinct aggregation. The absolute
    // threshold is fixture-calibrated; the DESC ordering + LIMIT keeps the
    // report the "top offenders" page at any scale.
    "fw_port_scan" -> ((s, d) =>
      fwEvents(s, d)
        .groupBy("src_ip")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("dst_ip")).as("n_dsts"),
          countDistinct(col("dst_port")).as("n_ports"))
        .filter(col("n_dsts") >= 3)
        .orderBy(desc("n_dsts"), desc("n_events"), asc("src_ip"))
        .limit(50)),
    // Ruleset drift report — what changed between two config revisions
    // (the review artifact an operator wants NEXT to the usage report:
    // "these rules are unused AND they were only just added"). Pure
    // dimension-side full-outer join on the rule identity; per-side match
    // predicates compared field-wise. Ruleset-sized at any traffic volume.
    "fw_rule_churn" -> ((s, d) => {
      val cur = rulesDf(s).alias("c")
      val prev = prevRulesDf(s).alias("p")
      val same = Seq("action", "proto", "src_lo", "src_hi", "dst_lo",
        "dst_hi", "port_lo", "port_hi")
        .map(f => col(s"c.$f") === col(s"p.$f")).reduce(_ && _)
      cur.join(prev,
          col("c.acl") === col("p.acl")
            && col("c.rule_seq") === col("p.rule_seq"), "full_outer")
        .select(
          coalesce(col("c.acl"), col("p.acl")).as("acl"),
          coalesce(col("c.rule_seq"), col("p.rule_seq")).as("rule_seq"),
          when(col("p.acl").isNull, "added")
            .when(col("c.acl").isNull, "removed")
            .when(!same, "changed")
            .otherwise("unchanged").as("status"))
        .filter(col("status") =!= "unchanged")
        .orderBy("acl", "rule_seq")
    }),

    // 106023 analog (the reference's stage-3 default-deny report): traffic
    // matching NO configured rule. The widened derivation (acl universe % 5)
    // routes a fifth of the traffic to rule-less acl_4; the broadcast
    // anti-join is the scale shape — no shuffle on the fact side, the miss
    // set streams straight into a tiny-keyspace aggregation.
    "fw_deny_stats" -> ((s, d) =>
      deriveFwMod(Tables.events(s, d), 5).alias("e")
        .join(broadcast(rulesDf(s)).alias("r"), expr(matchCondSql), "left_anti")
        .groupBy("acl", "dst_port")
        .agg(count(lit(1)).as("n_denied"),
          countDistinct(col("src_ip")).as("distinct_sources"))
        .orderBy("acl", "dst_port"))
  )

  /** ENTRY-level usage over the parquet fixture — the oracled twin of
    * [[LogParse.entryUsageFromRaw]] (which serves the raw-config path,
    * brute-force-tested in DomainSpec): for each object-group member of
    * each configured rule, how much of the rule's traffic that MEMBER
    * covered, including the zero rows. Attribution is per dimension
    * (src / dst / port), each event crediting its FIRST covering entry in
    * config order — never the src×dst×port cartesian. All attribution is
    * CASE folds over the [[entryRuleset]] driver constants stacked on the
    * scalar matcher — map-side, linear in the config's entry count. The
    * three dimension attributions leave the matcher as ONE explode into
    * (dim, entry_ix) rows feeding ONE partial-aggregated groupBy whose
    * keyspace is config-sized: one fact scan, one matcher evaluation, one
    * exchange (plan-gated). A rollup-per-dimension union formulation read
    * 3× here — Catalyst prunes each union branch to its own dimension
    * column, making the three combo subtrees non-identical, so exchange
    * reuse never fires and the FACT TABLE is scanned once per dimension
    * (measured: 3 parquet scans in the final plan — the difference
    * between one 100 TB pass and three). */
  def entryUsage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def firstIx(spans: Seq[(Long, Long)], v: Column): Column =
      spans.zipWithIndex.foldRight(lit(-1)) {
        case (((lo, hi), ix), els) =>
          when(v.between(lo, hi), lit(ix)).otherwise(els)
      }
    def dimIx(pick: Ruleset.RawRule => Seq[(Long, Long)], v: Column): Column =
      entryRuleset.foldRight(lit(-1)) { case (r, els) =>
        when(col("acl") === r.acl && col("rule_seq") === r.ruleSeq,
          firstIx(pick(r), v)).otherwise(els)
      }
    val hitRoll = matchedScalar(spark, dir)
      .select(col("acl"), col("rule_seq"), explode(array(
        struct(lit("src").as("dim"),
          dimIx(_.srcs.map(e => (e.lo, e.hi)), col("src_ip")).as("entry_ix")),
        struct(lit("dst").as("dim"),
          dimIx(_.dsts.map(e => (e.lo, e.hi)), col("dst_ip")).as("entry_ix")),
        struct(lit("port").as("dim"),
          dimIx(_.ports.map(p => (p.lo.toLong, p.hi.toLong)),
            col("dst_port").cast("long")).as("entry_ix")))).as("e"))
      .select(col("acl"), col("rule_seq"),
        col("e.dim").as("dim"), col("e.entry_ix").as("entry_ix"))
      .groupBy("acl", "rule_seq", "dim", "entry_ix")
      .agg(count(lit(1)).as("hits"))
    val entryDim = entryRuleset.flatMap { r =>
      r.srcs.zipWithIndex.map { case (e, i) =>
        (r.acl, r.ruleSeq, "src", i, e.cidr) } ++
      r.dsts.zipWithIndex.map { case (e, i) =>
        (r.acl, r.ruleSeq, "dst", i, e.cidr) } ++
      r.ports.zipWithIndex.map { case (p, i) =>
        (r.acl, r.ruleSeq, "port", i, s"${p.lo}-${p.hi}") }
    }.toDF("acl", "rule_seq", "dim", "entry_ix", "entry")
    entryDim.join(hitRoll, Seq("acl", "rule_seq", "dim", "entry_ix"), "left")
      .select(col("acl"), col("rule_seq"), col("dim"), col("entry_ix"),
        col("entry"), coalesce(col("hits"), lit(0L)).as("hits"))
      .orderBy("acl", "rule_seq", "dim", "entry_ix")
  }

  /** [[entryRuleset]] flattened to a SQL VALUES CTE
    * `entries(acl, rule_seq, dim, entry_ix, entry, lo, hi)` — generated
    * from the same constants as the DataFrame side so Spark and the
    * DuckDB oracle can never drift (the [[rulesSqlCteFor]] discipline). */
  def entriesSqlCte: String = {
    val rows = entryRuleset.flatMap { r =>
      r.srcs.zipWithIndex.map { case (e, i) =>
        s"('${r.acl}', ${r.ruleSeq}, 'src', $i, '${e.cidr}', ${e.lo}, ${e.hi})" } ++
      r.dsts.zipWithIndex.map { case (e, i) =>
        s"('${r.acl}', ${r.ruleSeq}, 'dst', $i, '${e.cidr}', ${e.lo}, ${e.hi})" } ++
      r.ports.zipWithIndex.map { case (p, i) =>
        s"('${r.acl}', ${r.ruleSeq}, 'port', $i, '${p.lo}-${p.hi}', ${p.lo}, ${p.hi})" }
    }.mkString(", ")
    s"entries(acl, rule_seq, dim, entry_ix, entry, lo, hi) AS (SELECT * FROM (VALUES $rows))"
  }

  /** The flagship: every configured rule with its hit count (0 if never hit),
    * busiest first — the reference's final report (SURVEY §7.2). */
  def usageReport(spark: SparkSession, dir: String): DataFrame =
    rulesDf(spark)
      .join(hits(spark, dir), Seq("acl", "rule_seq"), "left_outer")
      .select(col("acl"), col("rule_seq"), col("action"), col("src_cidr"),
        col("dst_cidr"), col("port_lo"), col("port_hi"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .orderBy(desc("hits"), asc("acl"), asc("rule_seq"))

  def oracleSql: Map[String, String] = Map(
    "fw_parse" ->
      s"WITH $fwSqlCte SELECT * FROM fw ORDER BY event_id",
    "fw_first_match" -> withCtes(
      "SELECT event_id, acl, rule_seq FROM matched ORDER BY event_id"),
    "fw_hit_count" -> withCtes(
      "SELECT acl, rule_seq, hits FROM hits ORDER BY acl, rule_seq"),
    "fw_unused_rules" -> withCtes(
      """SELECT r.acl, r.rule_seq, r.action, r.src_cidr, r.dst_cidr
        |FROM rules r WHERE NOT EXISTS (
        |  SELECT 1 FROM hits h WHERE h.acl = r.acl AND h.rule_seq = r.rule_seq)
        |ORDER BY r.acl, r.rule_seq""".stripMargin),
    "fw_usage_report" -> withCtes(
      """SELECT r.acl, r.rule_seq, r.action, r.src_cidr, r.dst_cidr,
        |       r.port_lo, r.port_hi, COALESCE(h.hits, 0) AS hits
        |FROM rules r LEFT JOIN hits h ON h.acl = r.acl AND h.rule_seq = r.rule_seq
        |ORDER BY COALESCE(h.hits, 0) DESC, r.acl, r.rule_seq""".stripMargin),
    // the matched CTE here is local (not the shared firstMatchSqlCte)
    // because entry attribution needs dst_ip/dst_port carried through the
    // per-event first-match disambiguation; per-dim attribution is the
    // min covering entry_ix — identical to the Spark side's first-in-
    // config-order CASE, since entries are checked in index order
    "fw_entry_usage" ->
      s"""WITH $fwSqlCte, $rulesSqlCte, $entriesSqlCte,
         |m AS (
         |  SELECT e.event_id, e.acl, MIN(r.rule_seq) AS rule_seq,
         |         MIN(e.src_ip) AS src_ip, MIN(e.dst_ip) AS dst_ip,
         |         MIN(e.dst_port) AS dst_port
         |  FROM fw e JOIN rules r ON $matchCondSql
         |  GROUP BY e.event_id, e.acl),
         |att AS (
         |  SELECT m.event_id, m.acl, m.rule_seq, en.dim,
         |         MIN(en.entry_ix) AS entry_ix
         |  FROM m JOIN entries en
         |    ON en.acl = m.acl AND en.rule_seq = m.rule_seq
         |   AND ((en.dim = 'src' AND m.src_ip BETWEEN en.lo AND en.hi)
         |     OR (en.dim = 'dst' AND m.dst_ip BETWEEN en.lo AND en.hi)
         |     OR (en.dim = 'port' AND m.dst_port BETWEEN en.lo AND en.hi))
         |  GROUP BY 1, 2, 3, 4),
         |h AS (SELECT acl, rule_seq, dim, entry_ix, COUNT(*) AS hits
         |  FROM att GROUP BY 1, 2, 3, 4)
         |SELECT en.acl, en.rule_seq, en.dim, en.entry_ix, en.entry,
         |       COALESCE(h.hits, 0) AS hits
         |FROM entries en LEFT JOIN h
         |  ON h.acl = en.acl AND h.rule_seq = en.rule_seq
         |  AND h.dim = en.dim AND h.entry_ix = en.entry_ix
         |ORDER BY en.acl, en.rule_seq, en.dim, en.entry_ix""".stripMargin,
    "fw_top_talkers" -> withCtes(
      """SELECT src_ip, COUNT(*) AS hits, COUNT(DISTINCT acl) AS n_acls
        |FROM matched GROUP BY src_ip
        |ORDER BY hits DESC, src_ip ASC LIMIT 25""".stripMargin),
    "fw_action_share" -> withCtes(
      """SELECT m.acl, r.action, COUNT(*) AS hits
        |FROM matched m JOIN rules r
        |  ON m.acl = r.acl AND m.rule_seq = r.rule_seq
        |GROUP BY m.acl, r.action ORDER BY m.acl, r.action""".stripMargin),
    "fw_shadowed_rules" ->
      s"""WITH $rulesSqlCte
         |SELECT r1.acl AS acl, r1.rule_seq AS shadowing_seq,
         |       r1.action AS shadowing_action,
         |       r2.rule_seq AS shadowed_seq, r2.action AS shadowed_action
         |FROM rules r1 JOIN rules r2 ON r1.acl = r2.acl
         |  AND r1.rule_seq < r2.rule_seq
         |  AND (r1.proto = 'ip' OR r1.proto = r2.proto)
         |  AND r1.src_lo <= r2.src_lo AND r1.src_hi >= r2.src_hi
         |  AND r1.dst_lo <= r2.dst_lo AND r1.dst_hi >= r2.dst_hi
         |  AND r1.port_lo <= r2.port_lo AND r1.port_hi >= r2.port_hi
         |ORDER BY acl, shadowing_seq, shadowed_seq""".stripMargin,
    "fw_hits_timeseries" -> withCtes(
      """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket_start, acl,
        |       COUNT(*) AS hits, COUNT(DISTINCT src_ip) AS distinct_sources
        |FROM matched GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "fw_per_rule_stats" -> withCtes(
      """SELECT acl, rule_seq, COUNT(*) AS hits,
        |       COUNT(DISTINCT src_ip) AS distinct_sources,
        |       MIN(ts) AS first_seen, MAX(ts) AS last_seen
        |FROM matched GROUP BY acl, rule_seq ORDER BY acl, rule_seq""".stripMargin),
    "fw_port_scan" ->
      s"""WITH $fwSqlCte
         |SELECT src_ip, COUNT(*) AS n_events,
         |       COUNT(DISTINCT dst_ip) AS n_dsts,
         |       COUNT(DISTINCT dst_port) AS n_ports
         |FROM fw GROUP BY src_ip HAVING COUNT(DISTINCT dst_ip) >= 3
         |ORDER BY n_dsts DESC, n_events DESC, src_ip LIMIT 50""".stripMargin,
    "fw_rule_churn" ->
      s"""WITH $rulesSqlCte, ${rulesSqlCteFor("prev", prevRuleset)},
         |labeled AS (
         |  SELECT COALESCE(c.acl, p.acl) AS acl,
         |    COALESCE(c.rule_seq, p.rule_seq) AS rule_seq,
         |    CASE WHEN p.acl IS NULL THEN 'added'
         |      WHEN c.acl IS NULL THEN 'removed'
         |      WHEN c.action <> p.action OR c.proto <> p.proto
         |        OR c.src_lo <> p.src_lo OR c.src_hi <> p.src_hi
         |        OR c.dst_lo <> p.dst_lo OR c.dst_hi <> p.dst_hi
         |        OR c.port_lo <> p.port_lo OR c.port_hi <> p.port_hi
         |      THEN 'changed' ELSE 'unchanged' END AS status
         |  FROM rules c FULL OUTER JOIN prev p
         |    ON c.acl = p.acl AND c.rule_seq = p.rule_seq)
         |SELECT acl, rule_seq, status FROM labeled
         |WHERE status <> 'unchanged' ORDER BY acl, rule_seq""".stripMargin,

    "fw_deny_stats" ->
      s"""WITH ${fwSqlCteMod("fw5", 5)}, $rulesSqlCte
         |SELECT acl, dst_port, COUNT(*) AS n_denied,
         |       COUNT(DISTINCT src_ip) AS distinct_sources
         |FROM fw5 e
         |WHERE NOT EXISTS (SELECT 1 FROM rules r WHERE $matchCondSql)
         |GROUP BY acl, dst_port ORDER BY acl, dst_port""".stripMargin
  )
}
