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
}
