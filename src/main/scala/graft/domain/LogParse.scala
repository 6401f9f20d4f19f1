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

  /** Parse 106100 lines to the standard connection schema; non-matching
    * lines yield empty extracts and are dropped. */
  def parse106100(raw: DataFrame): DataFrame = {
    val v = col("value")
    raw
      .select(
        regexp_extract(v, pat106100, 1).as("acl"),
        regexp_extract(v, pat106100, 2).as("action_logged"),
        regexp_extract(v, pat106100, 3).as("proto"),
        regexp_extract(v, pat106100, 4).as("src_ip_str"),
        regexp_extract(v, pat106100, 5).as("src_port_str"),
        regexp_extract(v, pat106100, 6).as("dst_ip_str"),
        regexp_extract(v, pat106100, 7).as("dst_port_str"),
        regexp_extract(v, pat106100, 8).as("hit_cnt_str"))
      .where(col("acl") =!= "")
      .select(col("acl"), col("action_logged"), col("proto"),
        ipToLong(col("src_ip_str")).as("src_ip"),
        col("src_port_str").cast("int").as("src_port"),
        ipToLong(col("dst_ip_str")).as("dst_ip"),
        col("dst_port_str").cast("int").as("dst_port"),
        col("hit_cnt_str").cast("long").as("hit_cnt"))
  }

  /** Parse 106023 default-deny lines (no ACL rule matched — the implicit
    * deny); kept separate because the reference reports them separately. */
  def parse106023(raw: DataFrame): DataFrame = {
    val v = col("value")
    raw
      .select(
        regexp_extract(v, pat106023, 1).as("proto"),
        regexp_extract(v, pat106023, 2).as("src_ip_str"),
        regexp_extract(v, pat106023, 3).as("src_port_str"),
        regexp_extract(v, pat106023, 4).as("dst_ip_str"),
        regexp_extract(v, pat106023, 5).as("dst_port_str"),
        regexp_extract(v, pat106023, 6).as("acl"))
      .where(col("acl") =!= "")
      .select(col("acl"), col("proto"),
        ipToLong(col("src_ip_str")).as("src_ip"),
        col("src_port_str").cast("int").as("src_port"),
        ipToLong(col("dst_ip_str")).as("dst_ip"),
        col("dst_port_str").cast("int").as("dst_port"))
  }

  /** End-to-end raw pipeline: syslog text + config text → per-rule usage
    * report (the reference's three stages in one lazy plan). */
  def usageReportFromRaw(spark: SparkSession, logPath: String,
      confPath: String): DataFrame = {
    val rules = Ruleset.toRulesDf(spark,
      Ruleset.parseConfig(
        scala.io.Source.fromFile(confPath).getLines().toSeq))
    val events = parse106100(readLogs(spark, logPath))
      .withColumn("event_id", monotonically_increasing_id())
    val hits = Fw.matchFirst(events, rules, "event_id")
      .groupBy("acl", "rule_seq").agg(count(lit(1)).as("hits"))
    // report per configured rule line (object-group expansion collapsed back)
    rules.select("acl", "rule_seq", "action").distinct()
      .join(hits, Seq("acl", "rule_seq"), "left_outer")
      .select(col("acl"), col("rule_seq"), col("action"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .orderBy(desc("hits"), asc("acl"), asc("rule_seq"))
  }
}
