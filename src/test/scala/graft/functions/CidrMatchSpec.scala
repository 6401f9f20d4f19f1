package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.CidrMatch.cidr_match

class CidrMatchSpec extends SparkSpec {

  private def ip(s: String): Long = graft.domain.Fw.ipToLong(s)

  test("cidr_match agrees with the built-in bit-op composition") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (1 to 2000).map { _ =>
      (rng.nextLong().abs % (1L << 32), rng.nextLong().abs % (1L << 32),
        rng.nextInt(33))
    }
    val df = rows.toDF("ip", "net", "prefix")
    val both = df.select(
      cidr_match(col("ip"), col("net"), col("prefix")).as("custom"),
      (shiftrightunsigned(col("ip"), 0) === col("ip")).as("sanity"), // force eval
      expr("(ip >> (32 - prefix)) = (net >> (32 - prefix)) OR prefix = 0")
        .as("builtin"))
    assert(both.filter(col("custom") =!= col("builtin")).count() === 0)
  }

  test("cidr_match handles known cases, nulls, and prefix edges") {
    import spark.implicits._
    val df = Seq(
      (ip("10.0.5.7"), ip("10.0.0.0"), 8, true),
      (ip("10.0.5.7"), ip("10.0.5.0"), 24, true),
      (ip("10.0.5.7"), ip("10.0.6.0"), 24, false),
      (ip("192.168.0.44"), ip("192.168.0.44"), 32, true),
      (ip("192.168.0.45"), ip("192.168.0.44"), 32, false),
      (ip("8.8.8.8"), ip("10.0.0.0"), 0, true) // /0 matches everything
    ).toDF("ip", "net", "prefix", "expected")
    assert(df.filter(
      cidr_match(col("ip"), col("net"), col("prefix")) =!= col("expected"))
      .count() === 0)
    // null propagation
    val n = Seq((Some(ip("10.0.0.1")), None: Option[Long], 8))
      .toDF("ip", "net", "prefix")
      .select(cidr_match(col("ip"), col("net"), col("prefix")).as("r"))
      .head
    assert(n.isNullAt(0))
  }

  test("cidr_match registers for SQL and runs through codegen") {
    CidrMatch.register(spark)
    val got = spark.sql(
      s"SELECT cidr_match(CAST(${ip("10.0.5.7")} AS BIGINT), " +
        s"CAST(${ip("10.0.0.0")} AS BIGINT), 8) AS m, " +
        s"cidr_match(CAST(${ip("11.0.5.7")} AS BIGINT), " +
        s"CAST(${ip("10.0.0.0")} AS BIGINT), 8) AS n").head
    assert(got.getBoolean(0) === true && got.getBoolean(1) === false)

    // ruleset filter through the custom expression matches the range form
    import spark.implicits._
    val events = graft.domain.Fw.fwEvents(spark, "/root/testdata/sf0.001")
    val viaExpr = events.filter(
      cidr_match(col("src_ip"), lit(ip("10.0.5.0")), lit(24))).count()
    val viaRange = events.filter(
      col("src_ip").between(ip("10.0.5.0"), ip("10.0.5.255"))).count()
    assert(viaExpr === viaRange && viaExpr > 0)
  }

  test("GraftExtensions injects cidr_match into a fresh session") {
    import org.apache.spark.sql.SparkSession
    val prev = spark // keep the shared session alive; only swap the default
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[1]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .appName("graft-ext-test")
        .getOrCreate() // reuses the JVM's SparkContext, new session state
      val r = s2.sql("SELECT cidr_match(167773447L, 167773440L, 24) AS m").head
      assert(r.getBoolean(0))
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
