package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation on skewed data") {
    import spark.implicits._
    // 90% of rows share one hot key
    val rows = (1 to 20000).map { i =>
      (if (i % 10 == 0) s"key_${i % 7}" else "hot_key", i.toDouble / 4)
    }
    val df = rows.toDF("k", "v").repartition(8)

    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast("decimal(18,4)")).as("total"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap

    val saltedC = Skew.saltedCount(df, col("k")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedS = Skew.saltedSum(df, col("k"), col("v")).collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap

    assert(saltedC === direct.view.mapValues(_._1).toMap)
    assert(saltedS.keySet === direct.keySet)
    direct.foreach { case (k, (_, total)) =>
      assert(saltedS(k).compareTo(total) === 0, s"sum mismatch for $k")
    }
    // the partial phase really fans the hot key out over many salt buckets
    val partials = df.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(32L)))
      .filter(col("k") === "hot_key")
      .select(countDistinct(col("__salt"))).head.getLong(0)
    assert(partials >= 16, s"hot key only used $partials salt buckets")
  }

  // skewed fact table: one hot key carries 90% of rows; dim carries
  // DUPLICATE rows for one key so the test catches any multiplicity bug
  // in the replicate-right construction
  private def skewedJoinData = {
    import spark.implicits._
    val fact = (1 to 20000).map { i =>
      (if (i % 10 == 0) (i % 7).toLong else 99L, i.toLong, i.toDouble / 4)
    }.toDF("fk", "row_id", "v").repartition(8)
    val dim = ((0L to 6L).map(k => (k, s"dim_$k")) ++
      Seq((99L, "hot_a"), (99L, "hot_b"), (123L, "unmatched")))
      .toDF("dk", "label")
    (fact, dim)
  }

  test("salted join equals plain join, duplicate right rows included") {
    val (fact, dim) = skewedJoinData
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("fk", "row_id", "v", "dk", "label").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getString(4)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val plain = canon(fact.join(dim, col("fk") === col("dk")))
    val salted = canon(Relational.saltedJoin(fact, dim, "fk", "dk",
      xxhash64(col("row_id"))))
    assert(salted === plain)
    // each hot-key left row matched BOTH duplicate dim rows exactly once
    assert(plain.filter(_._1._1 == 99L).values.forall(_ == 1))
  }

  test("salting really spreads the hot key across sub-keys") {
    val (fact, _) = skewedJoinData
    val spread = fact.filter(col("fk") === 99L)
      .select(countDistinct(
        pmod(xxhash64(col("row_id")), lit(Relational.SkewSalts.toLong))))
      .head.getLong(0)
    assert(spread === Relational.SkewSalts.toLong,
      s"hot key reached only $spread of ${Relational.SkewSalts} sub-keys")
  }
}
