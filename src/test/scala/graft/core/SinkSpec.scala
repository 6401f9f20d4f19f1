package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** B1.2 CSV/JSON scans with explicit schemas and B1.5 partitioned sink,
  * including the partition-pruning proof in the physical plan. */
class SinkSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_sink").toString

  test("partitioned sink prunes partitions on read") {
    val dir = tmp()
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    Sources.writePartitioned(docs, s"$dir/docs", Seq("lang"))

    val back = spark.read.parquet(s"$dir/docs")
    assert(back.count() === docs.count())

    val pruned = back.filter(col("lang") === "en")
    val physical = pruned.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition pruning in plan:\n$physical")
    val expected = docs.filter(col("lang") === "en").count()
    assert(pruned.count() === expected)
    // partition column survives the round trip (moved into the path)
    assert(back.columns.toSet === docs.columns.toSet)
  }

  test("orc round-trips losslessly with predicate pushdown") {
    val dir = tmp()
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.write.orc(s"$dir/docs_orc")
    val back = spark.read.orc(s"$dir/docs_orc")
    assert(back.schema === docs.schema)
    assert(back.count() === docs.count())
    // ORC scans push filters like parquet ones — same 100TB posture
    val plan = back.filter(col("n_chars") > 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      !plan.contains("PushedFilters: []"),
      s"expected ORC filter pushdown:\n$plan")
  }

  test("csv round-trips with explicit schema; malformed rows go null") {
    val dir = tmp()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,name,score\n1,alpha,1.5\n2,beta,2.5\nnot_a_number,gamma,oops\n"
        .getBytes)
    val df = Sources.readCsv(spark, s"$dir/in.csv", schema)
    val rows = df.orderBy(asc_nulls_last("id")).collect()
    assert(rows.length === 3)
    assert(rows(0).getLong(0) === 1L && rows(0).getDouble(2) === 1.5)
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(2)) // malformed → nulls
  }

  test("csv quarantine captures raw malformed lines for a dead-letter sink") {
    val dir = tmp()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,name,score\n1,alpha,1.5\nBAD,gamma,oops\n2,beta,2.5\n".getBytes)
    // cache: corrupt-column-only projections are refused on the raw scan
    val df = Sources.readCsvQuarantine(spark, s"$dir/in.csv", schema).cache()
    try {
      val good = df.filter(col("_corrupt").isNull)
      val bad = df.filter(col("_corrupt").isNotNull)
      assert(good.count() === 2)
      assert(good.select("id").collect().map(_.getLong(0)).sorted.toSeq
        === Seq(1L, 2L))
      // the raw line survives verbatim — routable to a dead-letter sink
      assert(bad.select("_corrupt").collect().map(_.getString(0)).toSeq
        === Seq("BAD,gamma,oops"))
    } finally df.unpersist()
  }

  test("json reads with explicit schema incl. nested struct") {
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in.json"),
      """{"id":1,"meta":{"k":10}}
        |{"id":2,"meta":{"k":20}}
        |{"id":3}
        |""".stripMargin.getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("meta", StructType(Seq(StructField("k", IntegerType))))))
    val rows = Sources.readJson(spark, s"$dir/in.json", schema)
      .select(col("id"), col("meta.k").as("k")).orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
      .toSeq === Seq((1L, 10), (2L, 20), (3L, -1)))
  }
}
