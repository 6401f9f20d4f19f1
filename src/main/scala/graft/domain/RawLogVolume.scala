package graft.domain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Volume fixture for the raw syslog→report path (SURVEY §1.1 stage 2).
  *
  * [[LogParse.usageReportFromRaw]] is the closest analog to what the
  * reference actually runs — syslog text + config text in, per-rule usage
  * report out — but the ScalaTest fixtures exercise it on hand-written
  * lines only. This object generates an ASA syslog corpus of arbitrary
  * volume (gzip, many files, so the read parallelizes per file — gzip is
  * not splittable, which is exactly why the generator shards it) whose
  * logical events are THE SAME events the oracle-checked `fw_usage_report`
  * derives from parquet, so the raw-text report can be asserted equal to
  * the parquet report at any volume. [[graft.RawLogBench]] runs it at
  * multi-hundred-MB scale and records MB/s; DomainSpec runs the same
  * assertion small inside `sbt test`.
  *
  * Layout of the generated corpus:
  *  - 106100 lines: every mod-4-derived event, `copies`× (each copy is a
  *    distinct log line of the same logical connection, so expected hits =
  *    parquet hits × copies);
  *  - 106023 lines: the rule-less acl_4 slice of the mod-5 derivation —
  *    implicit-deny traffic exercising the default-deny report path;
  *  - malformed lines (one per 106100-shard) that must be dropped, never
  *    thrown on.
  */
object RawLogVolume {

  /** Dotted quad from a long, codegen-only (no UDF). */
  private def longToIp(c: Column): Column = format_string("%d.%d.%d.%d",
    shiftright(c, 24).bitwiseAND(lit(255L)),
    shiftright(c, 16).bitwiseAND(lit(255L)),
    shiftright(c, 8).bitwiseAND(lit(255L)),
    c.bitwiseAND(lit(255L)))

  /** The fixture ruleset rendered as Cisco ASA config text — through
    * object-groups (network, nested group-object, service, named ports)
    * so the raw path exercises A2/A6 expansion, not just line parsing.
    * `Ruleset.parseConfig` on this text expands to exactly the match
    * semantics of [[Fw.ruleset]]; rule_seq is positional (10, 20, …) per
    * ACL, so acl_9's fixture seq 99 parses as 10 — comparisons rank-
    * normalize seqs, which first-match semantics are invariant under. */
  val configText: String =
    """! generated volume fixture - graft RawLogVolume (ASCII only: the
      |! raw path reads config with the platform default charset)
      |object-group network net_10slash8
      |  network-object 10.0.0.0 255.0.0.0
      |object-group network net_192slash24
      |  network-object 192.168.0.0 255.255.255.0
      |object-group network net_outer
      |  group-object net_192slash24
      |object-group service svc_high tcp
      |  port-object range 8080 8443
      |access-list acl_0 extended permit tcp object-group net_10slash8 object-group net_192slash24 eq www
      |access-list acl_0 extended permit tcp object-group net_10slash8 192.168.0.0 255.255.255.0 eq https
      |access-list acl_0 extended deny tcp 10.0.0.0 255.0.0.0 object-group net_outer range 1 65535
      |access-list acl_0 extended permit tcp object-group net_10slash8 object-group net_192slash24 range 80 8443
      |access-list acl_1 extended permit tcp 10.0.5.0 255.255.255.0 object-group net_192slash24 range 1 65535
      |access-list acl_1 extended permit tcp object-group net_10slash8 192.168.0.0 255.255.255.128 range 1 1023
      |access-list acl_1 extended deny tcp object-group net_10slash8 object-group net_outer range 1 65535
      |access-list acl_2 extended permit tcp object-group net_10slash8 object-group net_192slash24 object-group svc_high
      |access-list acl_2 extended permit tcp 10.0.0.0 255.128.0.0 192.168.0.128 255.255.255.128 range 1 65535
      |access-list acl_2 extended deny tcp object-group net_10slash8 object-group net_192slash24 range 1 65535
      |access-list acl_3 extended permit tcp object-group net_10slash8 object-group net_192slash24 range 1 65535
      |access-list acl_9 extended permit tcp object-group net_10slash8 object-group net_192slash24 range 1 65535
      |""".stripMargin

  /** Generate the gzip syslog corpus under `outDir` (`logs/` subdir) and
    * the config file next to it. Returns (logDir, confPath, uncompressed
    * log bytes, total lines). */
  def generate(spark: SparkSession, sfDir: String, outDir: String,
      copies: Int, files: Int): (String, String, Long, Long) = {
    val events = Tables.events(spark, sfDir)
    val copy = explode(sequence(lit(1), lit(copies)))

    val permitted = Fw.deriveFw(events)
      .withColumn("c", copy)
      .select(format_string(
        "Jun %02d 2026 %02d:%02d:%02d fw01 : %%ASA-6-106100: access-list %s " +
          "%s tcp inside/%s(%d) -> outside/%s(%d) hit-cnt 1 first hit",
        (col("event_id") % 28) + 1,
        col("event_id") % 24, col("c") % 60, (col("event_id") * 7) % 60,
        col("acl"),
        // the logged action is cosmetic for the report (rule identity is
        // re-derived by matching) — alternate it for realism
        when(col("event_id") % 3 === 0, "denied").otherwise("permitted"),
        longToIp(col("src_ip")), (col("event_id") % 60000) + 1024,
        longToIp(col("dst_ip")), col("dst_port")).as("value"))

    val denied = Fw.deriveFwMod(events, 5)
      .filter(col("acl") === "acl_4")
      .withColumn("c", copy)
      .select(format_string(
        "Jun %02d 2026 %02d:%02d:%02d fw01 : %%ASA-4-106023: Deny tcp " +
          "src inside:%s/%d dst outside:%s/%d by access-group \"%s\" [0x0, 0x0]",
        (col("event_id") % 28) + 1,
        col("event_id") % 24, col("c") % 60, (col("event_id") * 7) % 60,
        longToIp(col("src_ip")), (col("event_id") % 60000) + 1024,
        longToIp(col("dst_ip")), col("dst_port"), col("acl")).as("value"))

    import spark.implicits._
    val malformed = (1 to files).map(i =>
      s"Jun 01 2026 00:00:0$i fw01 : %ASA-6-302013: Built outbound TCP " +
        "connection (not a rule-logging message)").toDF("value")
      .union(Seq("totally unparseable garbage  line").toDF("value"))

    val lines = permitted.union(denied).union(malformed)
    val logDir = s"$outDir/logs"
    // shard BEFORE gzip: one .gz file == one read task, so `files` is the
    // read parallelism knob at any volume
    lines.repartition(files)
      .write.mode("overwrite").option("compression", "gzip").text(logDir)

    // stats from the WRITTEN shards, not the generator lineage: one
    // generation pass total, and the numbers describe the artifact on disk
    val stats = spark.read.text(logDir).agg(
      sum(length(col("value")) + 1).cast("long"), count(lit(1))).head
    val confPath = s"$outDir/fw.conf"
    java.nio.file.Files.write(java.nio.file.Paths.get(confPath),
      configText.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (logDir, confPath, stats.getLong(0), stats.getLong(1))
  }

  /** Rank-normalized (acl, seqRank, action, hits) rows of a usage report:
    * rule_seq is replaced by its 10·rank position within the ACL, which
    * first-match hit counts are invariant under (only rule ORDER matters).
    * Driver-side on purpose — reports are ruleset-sized. */
  def normalizedRows(report: DataFrame): Set[(String, Int, String, Long)] = {
    val rows = report.select("acl", "rule_seq", "action", "hits").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSeq
    val rank = rows.map(t => (t._1, t._2)).distinct.groupBy(_._1).flatMap {
      case (_, seqs) =>
        // rank over the POSITIVE seqs only: an implicit-deny (-1) row keeps
        // its seq AND must not shift its siblings' ranks, or an ACL with
        // both kinds would rank its first real rule 20 on one side of a
        // comparison and 10 on the other
        val (neg, pos) = seqs.partition(_._2 < 0)
        neg.map(k => k -> k._2) ++
          pos.sortBy(_._2).zipWithIndex.map { case (k, i) => k -> ((i + 1) * 10) }
    }
    rows.map(t => (t._1, rank((t._1, t._2)), t._3, t._4)).toSet
  }

  /** The raw-path report expected from `generate(...)`'s corpus: the
    * parquet-derived flagship report with hits × copies, plus one
    * implicit-deny row for the acl_4 slice. */
  def expected(spark: SparkSession, sfDir: String, copies: Int)
      : Set[(String, Int, String, Long)] = {
    val parquet = normalizedRows(Fw.usageReport(spark, sfDir))
      .map { case (acl, seq, action, hits) => (acl, seq, action, hits * copies) }
    val nAcl4 = Fw.deriveFwMod(Tables.events(spark, sfDir), 5)
      .filter(col("acl") === "acl_4").count()
    parquet + (("acl_4", -1, "implicit-deny", nAcl4 * copies))
  }
}
