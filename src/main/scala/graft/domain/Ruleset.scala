package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cisco-style config parsing + object-group expansion — SURVEY.md §2 A2/A6.
  *
  * The reference's preprocessing stage parses `access-list` lines from an
  * ASA/FWSM config, expands `object-group` references into concrete entries,
  * and numbers each rule by position (first-match order). Config files are
  * tiny dimensions, so parsing is driver-side Scala (exactly as the
  * reference is single-process here); the *expansion* — one rule with group
  * refs becoming N concrete rows — is done distributed-style with `explode`
  * over the parsed array columns ([[toRulesDf]]) for consumers that need the
  * flat rule relation (the [[Fw.matchFirst]] join form, reports). The match
  * itself no longer needs the expansion: [[Fw.firstMatchColRaw]] folds the
  * entry lists into OR-chains inside the map-side scalar matcher.
  *
  * Grammar (public Cisco syntax subset):
  * {{{
  * object-group network <name>
  *   network-object host <ip>
  *   network-object <ip> <mask>
  *   group-object <other-group>
  * object-group service <name> tcp
  *   port-object eq <port>
  *   port-object range <lo> <hi>
  * access-list <acl> extended <permit|deny> <proto> <src> <dst> [<ports>]
  *   where <src>/<dst> ::= any | host <ip> | <ip> <mask> | object-group <g>
  *         <ports>     ::= eq <p> | range <lo> <hi> | object-group <svc>
  * }}}
  */
object Ruleset {

  final case class NetEntry(cidr: String, lo: Long, hi: Long)
  final case class PortEntry(lo: Int, hi: Int)
  final case class RawRule(acl: String, ruleSeq: Int, action: String,
      proto: String, srcs: Seq[NetEntry], dsts: Seq[NetEntry],
      ports: Seq[PortEntry])

  private def maskToPrefix(mask: String): Int =
    java.lang.Long.bitCount(Fw.ipToLong(mask))

  private def net(ip: String, prefix: Int): NetEntry = {
    val lo = Fw.ipToLong(ip)
    NetEntry(s"$ip/$prefix", lo, lo + (1L << (32 - prefix)) - 1)
  }

  val anyNet: NetEntry = NetEntry("0.0.0.0/0", 0L, (1L << 32) - 1)
  val anyPort: PortEntry = PortEntry(0, 65535)

  /** Well-known service names (Cisco configs use these more often than
    * numbers). Unknown names in a port spec fall back to any-port rather
    * than crashing the parse. */
  private val namedPorts = Map(
    "ftp-data" -> 20, "ftp" -> 21, "ssh" -> 22, "telnet" -> 23,
    "smtp" -> 25, "domain" -> 53, "www" -> 80, "http" -> 80,
    "pop3" -> 110, "ntp" -> 123, "https" -> 443, "syslog" -> 514)

  private def port(tok: String): Option[Int] =
    tok.toIntOption.orElse(namedPorts.get(tok))

  /** Parse config lines into ordered rules with groups expanded.
    *
    * Two passes: object-group definitions are collected over the whole file
    * first, so `access-list` lines and `group-object` nesting may reference
    * groups defined later. A reference to a group that exists nowhere in
    * the config throws (silently dropping the rule would corrupt
    * first-match order). Unknown *directives* are still ignored — configs
    * carry plenty of irrelevant lines. */
  def parseConfig(lines: Seq[String]): Seq[RawRule] = {
    val rawNet = scala.collection.mutable.Map.empty[String, Vector[(String, List[String])]]
    val svcGroups = scala.collection.mutable.Map.empty[String, Vector[PortEntry]]
    var current: Option[(String, String)] = None // (kind, name)

    def tokensOf(raw: String): (Boolean, List[String]) =
      (raw.startsWith(" ") || raw.startsWith("\t"),
        raw.trim.split("\\s+").toList.filter(_.nonEmpty))

    // pass 1: collect group bodies (network bodies kept symbolic so nested
    // group-object can resolve after everything is known)
    lines.foreach { raw =>
      tokensOf(raw) match {
        case (false, "object-group" :: "network" :: name :: _) =>
          current = Some(("network", name)); rawNet(name) = Vector.empty
        case (false, "object-group" :: "service" :: name :: _) =>
          current = Some(("service", name)); svcGroups(name) = Vector.empty
        case (true, "network-object" :: rest) =>
          current.collect { case ("network", n) =>
            rawNet(n) = rawNet(n) :+ ("network-object", rest) }
        case (true, "group-object" :: g :: _) =>
          current.collect { case ("network", n) =>
            rawNet(n) = rawNet(n) :+ ("group-object", List(g)) }
        case (true, "port-object" :: "eq" :: p :: _) =>
          current.collect { case ("service", n) =>
            port(p).foreach(v => svcGroups(n) = svcGroups(n) :+ PortEntry(v, v)) }
        case (true, "port-object" :: "range" :: lo :: hi :: _) =>
          current.collect { case ("service", n) =>
            for (l <- port(lo); h <- port(hi))
              svcGroups(n) = svcGroups(n) :+ PortEntry(l, h) }
        case (false, _) => current = None
        case _ =>
      }
    }

    val netGroups = scala.collection.mutable.Map.empty[String, Vector[NetEntry]]
    def resolveGroup(name: String, seen: Set[String]): Vector[NetEntry] =
      netGroups.getOrElseUpdate(name, {
        require(!seen.contains(name), s"object-group cycle at '$name'")
        val body = rawNet.getOrElse(name,
          throw new IllegalArgumentException(
            s"access-list references undefined object-group '$name'"))
        body.flatMap {
          case ("network-object", "host" :: ip :: _) => Vector(net(ip, 32))
          case ("network-object", ip :: mask :: _) if ip.count(_ == '.') == 3 =>
            Vector(net(ip, maskToPrefix(mask)))
          case ("group-object", g :: _) => resolveGroup(g, seen + name)
          case _ => Vector.empty
        }
      })

    def resolveNet(tokens: List[String]): (Seq[NetEntry], List[String]) =
      tokens match {
        case "any" :: rest => (Seq(anyNet), rest)
        case "host" :: ip :: rest => (Seq(net(ip, 32)), rest)
        case "object-group" :: g :: rest => (resolveGroup(g, Set.empty), rest)
        case ip :: mask :: rest if ip.count(_ == '.') == 3 =>
          (Seq(net(ip, maskToPrefix(mask))), rest)
        case rest => (Seq.empty, rest)
      }

    def resolvePorts(tokens: List[String]): Seq[PortEntry] = tokens match {
      case "eq" :: p :: _ =>
        port(p).map(v => Seq(PortEntry(v, v))).getOrElse(Seq(anyPort))
      case "range" :: lo :: hi :: _ =>
        (for (l <- port(lo); h <- port(hi)) yield Seq(PortEntry(l, h)))
          .getOrElse(Seq(anyPort))
      case "object-group" :: g :: _ =>
        svcGroups.getOrElse(g,
          throw new IllegalArgumentException(
            s"access-list references undefined service group '$g'"))
      case _ => Seq(anyPort)
    }

    // pass 2: the access-list lines, in order
    val rules = scala.collection.mutable.ArrayBuffer.empty[RawRule]
    val seqPerAcl = scala.collection.mutable.Map.empty[String, Int]
    lines.foreach { raw =>
      tokensOf(raw) match {
        case (false, "access-list" :: acl :: "extended" :: action :: proto :: rest) =>
          val (srcs, afterSrc) = resolveNet(rest)
          val (dsts, afterDst) = resolveNet(afterSrc)
          val ports = resolvePorts(afterDst)
          val seq = seqPerAcl.getOrElse(acl, 0) + 10
          seqPerAcl(acl) = seq
          rules += RawRule(acl, seq, action, proto, srcs, dsts, ports)
        case _ =>
      }
    }
    rules.toSeq
  }

  /** Expand (rule × srcs × dsts × ports) with `explode` — the A6 generator
    * shape — into the flat rule schema [[Fw.matchFirst]] expects. */
  def toRulesDf(spark: SparkSession, rules: Seq[RawRule]): DataFrame = {
    import spark.implicits._
    rules.toDS()
      .withColumn("src", explode(col("srcs")))
      .withColumn("dst", explode(col("dsts")))
      .withColumn("port", explode(col("ports")))
      .select(col("acl"), col("ruleSeq").as("rule_seq"), col("action"),
        col("proto"),
        col("src.cidr").as("src_cidr"), col("src.lo").as("src_lo"),
        col("src.hi").as("src_hi"),
        col("dst.cidr").as("dst_cidr"), col("dst.lo").as("dst_lo"),
        col("dst.hi").as("dst_hi"),
        col("port.lo").as("port_lo"), col("port.hi").as("port_hi"))
  }
}
