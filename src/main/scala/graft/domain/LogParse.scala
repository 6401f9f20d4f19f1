package graft.domain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw firewall-log parsing — SURVEY.md §2 A1/A3/A8.
  *
  * The reference streams Cisco ASA/FWSM syslog (message 106100 for per-rule
  * connection logging, 106023 for default-deny) and regex-parses each line in
  * a Python mapper. Here the same extraction is declared with codegen'd
  * `regexp_extract` columns over `spark.read.text` (gzip handled natively by
  * the Hadoop line reader), so the scan parallelizes per file split and
  * malformed lines become NULLs that are filtered, never exceptions.
  */
object LogParse {

  /** %ASA-6-106100: access-list <acl> permitted|denied <proto>
    *   <ifc>/<src>(<sport>) -> <ifc>/<dst>(<dport>) hit-cnt <n> ...
    * An optional syslog prefix (timestamp/hostname) is tolerated. */
  val pat106100: String =
    """^.*?%ASA-\d-106100: access-list (\S+) (permitted|denied) (\S+) """ +
    """\S+/(\d{1,3}(?:\.\d{1,3}){3})\((\d+)\) -> """ +
    """\S+/(\d{1,3}(?:\.\d{1,3}){3})\((\d+)\) hit-cnt (\d+).*$"""

  /** %ASA-4-106023: Deny <proto> src <ifc>:<ip>/<port> dst <ifc>:<ip>/<port>
    *   by access-group "<acl>" */
  val pat106023: String =
    """^.*?%ASA-\d-106023: Deny (\S+) src \S+?:(\d{1,3}(?:\.\d{1,3}){3})/(\d+) """ +
    """dst \S+?:(\d{1,3}(?:\.\d{1,3}){3})/(\d+) by access-group "(\S+)".*$"""

  /** Dotted-quad → long, as a codegen'd column expression (no UDF). */
  def ipToLong(c: Column): Column =
    aggregate(split(c, "\\."), lit(0L), (acc, o) => acc * 256 + o.cast("long"))

  def readLogs(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Single-pass multi-group extraction: Catalyst does not CSE
    * regexp_extract calls with different group indexes, so per-field
    * extraction would run the anchored pattern once PER FIELD per line.
    * Instead regexp_replace packs all groups into one \u0001-delimited
    * string in ONE pass; non-matching lines come back unchanged (the
    * pattern demands the delimiter-free " -> " syntax, so a packed line
    * can never equal its input) and are dropped before the split. */
  private def packExtract(raw: DataFrame, pattern: String,
      nGroups: Int): DataFrame = {
    val replacement = (1 to nGroups).map(i => s"$$$i").mkString("\u0001")
    raw
      .select(regexp_replace(col("value"), pattern, replacement).as("packed"),
        col("value"))
      .where(col("packed") =!= col("value"))
      .select(split(col("packed"), "\u0001").as("g"))
  }

  /** Parse 106100 lines to the standard connection schema; non-matching
    * lines are dropped (never throw). */
  def parse106100(raw: DataFrame): DataFrame =
    packExtract(raw, pat106100, 8)
      .select(
        element_at(col("g"), 1).as("acl"),
        element_at(col("g"), 2).as("action_logged"),
        element_at(col("g"), 3).as("proto"),
        ipToLong(element_at(col("g"), 4)).as("src_ip"),
        element_at(col("g"), 5).cast("int").as("src_port"),
        ipToLong(element_at(col("g"), 6)).as("dst_ip"),
        element_at(col("g"), 7).cast("int").as("dst_port"),
        element_at(col("g"), 8).cast("long").as("hit_cnt"))

  /** Parse 106023 default-deny lines (no ACL rule matched — the implicit
    * deny); kept separate because the reference reports them separately. */
  def parse106023(raw: DataFrame): DataFrame =
    packExtract(raw, pat106023, 6)
      .select(
        element_at(col("g"), 6).as("acl"),
        element_at(col("g"), 1).as("proto"),
        ipToLong(element_at(col("g"), 2)).as("src_ip"),
        element_at(col("g"), 3).cast("int").as("src_port"),
        ipToLong(element_at(col("g"), 4)).as("dst_ip"),
        element_at(col("g"), 5).cast("int").as("dst_port"))

  /** End-to-end raw pipeline: syslog text + config text → per-rule usage
    * report (the reference's three stages in one lazy plan), INCLUDING the
    * 106023 default-deny traffic: denied-by-implicit-deny counts appear per
    * ACL as `rule_seq = -1, action = 'implicit-deny'` rows alongside the
    * configured rules — no configured rule matched this traffic by
    * definition, so no real rule_seq applies. */
  def usageReportFromRaw(spark: SparkSession, logPath: String,
      confPath: String): DataFrame = {
    import spark.implicits._
    val confLines = scala.util.Using.resource(
      scala.io.Source.fromFile(confPath))(_.getLines().toSeq)
    val rules = Ruleset.parseConfig(confLines)
    val raw = readLogs(spark, logPath)
    // parseConfig yields driver-side rules, so first-match is the same
    // map-side scalar matcher the parquet family uses — no join, no
    // per-event exchange: the only shuffle over the parsed fact stream is
    // the final (acl, rule_seq) aggregate, whose keyspace is the ruleset.
    // (An earlier round disambiguated with matchFirst + groupBy(event_id),
    // which exchanges one row per log line — the scale-killer at 100 TB;
    // DomainSpec now pins its absence in the executed plan.)
    //
    // Unmatched lines are NOT filtered here: a `rule_seq IS NOT NULL`
    // predicate gets pushed below the parse projections with full alias
    // substitution, so the scan-level filter would re-run the anchored
    // regex once per range comparison inside the matcher (measured: 84
    // regexp_replace occurrences in the plan, 69→32 MB/s). Instead the
    // no-match group aggregates under a -2 sentinel — a handful of rows —
    // and drops out of the rule-lines left-outer join below (configured
    // seqs are positive; -1 is the implicit-deny report marker). The
    // sentinel ALSO makes the join keys non-nullable: a nullable key would
    // make constraint inference manufacture that same IS NOT NULL filter
    // from the join and push it down anyway (measured, same 84×
    // regex plan) — with both keys provably non-null there is nothing to
    // infer, and the parse runs once per line.
    val matchSeq =
      if (rules.isEmpty) lit(-2)
      else coalesce(Fw.firstMatchColRaw(rules), lit(-2))
    val hits = parse106100(raw)
      .withColumn("rule_seq", matchSeq)
      .withColumn("acl", coalesce(col("acl"), lit("")))
      .groupBy("acl", "rule_seq").agg(count(lit(1)).as("hits"))
    // report per configured rule line (one row per access-list line; the
    // matcher never needs the object-group cartesian expansion)
    val ruleReport = rules.map(r => (r.acl, r.ruleSeq, r.action)).distinct
      .toDF("acl", "rule_seq", "action")
      .join(hits, Seq("acl", "rule_seq"), "left_outer")
      .select(col("acl"), col("rule_seq"), col("action"),
        coalesce(col("hits"), lit(0L)).as("hits"))
    val denyReport = parse106023(raw)
      .groupBy("acl")
      .agg(count(lit(1)).as("hits"))
      .select(col("acl"), lit(-1).as("rule_seq"),
        lit("implicit-deny").as("action"), col("hits"))
    ruleReport.unionByName(denyReport)
      .orderBy(desc("hits"), asc("acl"), asc("rule_seq"))
  }

  /** ENTRY-level usage — the finer-grained report under A6/A13: for each
    * object-group member (network-object / port-object / inline entry) of
    * each configured rule, how much of the rule's traffic that MEMBER
    * covered, including the zero rows — the "which group members are dead
    * weight" question that rule-level usage cannot answer (a rule can be
    * hot while half its group entries never match anything).
    *
    * Attribution: the firing rule is first-match (rule order, the scalar
    * matcher); within it, each dimension (src / dst / port) attributes to
    * its FIRST covering entry in config order — per dimension, not the
    * src×dst×port cartesian, because "is this member dead" is a
    * per-member question and the cartesian would smear one packet across
    * combinations. All attribution is CASE folds over the driver-side
    * config constants — map-side, LINEAR in the config's entry count, no
    * join and no per-event exchange (the only shuffle keys on the
    * (rule, entry-index) aggregate, whose keyspace is config-sized).
    * Unparsed/unmatched lines aggregate under sentinel indexes and drop in
    * the entry-dimension join — never a filter above the parse projection
    * (the pushdown-regex hazard documented in [[usageReportFromRaw]]).
    *
    * Returns (acl, rule_seq, dim, entry_ix, entry, hits) with one row per
    * configured entry, hits ≥ 0, ordered for report stability. */
  def entryUsageFromRaw(spark: SparkSession, logPath: String,
      confPath: String): DataFrame = {
    import spark.implicits._
    val confLines = scala.util.Using.resource(
      scala.io.Source.fromFile(confPath))(_.getLines().toSeq)
    val rules = Ruleset.parseConfig(confLines)
    require(rules.nonEmpty, "empty ruleset")

    def firstIx(spans: Seq[(Long, Long)], v: Column): Column =
      spans.zipWithIndex.foldRight(lit(-1)) {
        case (((lo, hi), ix), els) => when(v.between(lo, hi), lit(ix)).otherwise(els)
      }
    def dimIx(pick: Ruleset.RawRule => Seq[(Long, Long)], v: Column): Column =
      rules.foldRight(lit(-1)) { case (r, els) =>
        when(col("acl") === r.acl && col("rule_seq") === r.ruleSeq,
          firstIx(pick(r), v)).otherwise(els)
      }

    val combos = parse106100(raw = readLogs(spark, logPath))
      .withColumn("rule_seq",
        coalesce(Fw.firstMatchColRaw(rules), lit(-2)))
      .withColumn("acl", coalesce(col("acl"), lit("")))
      .withColumn("six",
        dimIx(_.srcs.map(e => (e.lo, e.hi)), col("src_ip")))
      .withColumn("dix",
        dimIx(_.dsts.map(e => (e.lo, e.hi)), col("dst_ip")))
      .withColumn("pix",
        dimIx(_.ports.map(p => (p.lo.toLong, p.hi.toLong)),
          col("dst_port").cast("long")))
      .groupBy("acl", "rule_seq", "six", "dix", "pix")
      .agg(count(lit(1)).as("cnt"))

    def rollup(dim: String, ixCol: String): DataFrame =
      combos.groupBy(col("acl"), col("rule_seq"),
          col(ixCol).as("entry_ix"))
        .agg(sum(col("cnt")).as("hits"))
        .withColumn("dim", lit(dim))
    val hitRoll = rollup("src", "six")
      .unionByName(rollup("dst", "dix"))
      .unionByName(rollup("port", "pix"))

    // the full entry dimension from the same parsed constants — zero-hit
    // members appear with hits = 0; sentinel traffic never joins
    val entryDim = rules.flatMap { r =>
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
}
