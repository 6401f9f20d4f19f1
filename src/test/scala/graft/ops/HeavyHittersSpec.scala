package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The Misra–Gries invariant, asserted as stated — est ≤ true ≤ est + Δ
  * with Δ = (n − Σstored)/(k+1) — plus heavy-hitter completeness
  * (true > n/(k+1) ⇒ present), at two different partitionings (counts may
  * differ between them; the BOUND may not), per group, and on the local
  * single-buffer path where the sketch must be EXACT while under k
  * distinct items.
  */
class HeavyHittersSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def tokens = graft.core.Tables.documents(spark, sfDir)
    .select(explode(split(col("text"), " ")).as("tok"),
      col("lang"))
    .localCheckpoint()

  // the natural vocabulary is near-uniform (no token reaches n/(k+1)), so
  // the completeness guarantee needs a PLANTED dominant token: ~1/8 of the
  // stream, far above the n/(k+1) threshold at any tested k
  private def skewed = {
    import spark.implicits._
    val base = tokens.select("tok")
    val n = base.count()
    base.union(spark.range(n / 8).select(lit("zz_heavy").as("tok")))
      .localCheckpoint()
  }

  private def checkInvariant(k: Int, parts: Int): Unit = {
    val df = skewed
    val exact = df.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val row = df.repartition(parts)
      .agg(HeavyHitters.heavyHitters(col("tok"), k).as("hh"))
      .select("hh.*").head()
    assert(row.getLong(0) === n, "sketch n must be the true row count")
    val delta = row.getLong(2)
    val items = row.getSeq[org.apache.spark.sql.Row](3)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(items.size <= k)
    for ((item, est) <- items) {
      val t = exact(item)
      assert(est <= t, s"$item: est $est must not exceed true $t")
      assert(t - est <= delta,
        s"$item: undercount ${t - est} exceeds bound $delta (k=$k, parts=$parts)")
    }
    // completeness: anything above n/(k+1) is guaranteed present
    val threshold = n / (k + 1)
    val mustHave = exact.filter(_._2 > threshold).keySet
    assert(mustHave.nonEmpty, "fixture must contain heavy hitters")
    assert(mustHave.subsetOf(items.keySet),
      s"missing guaranteed heavy hitters: ${mustHave.diff(items.keySet)}")
  }

  test("invariant and completeness hold at two partitionings") {
    checkInvariant(k = 16, parts = 2)
    checkInvariant(k = 16, parts = 7)
    checkInvariant(k = 64, parts = 7)
  }

  test("under k distinct items the sketch is exact") {
    import spark.implicits._
    val data = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    val row = data.toDF("x").repartition(3)
      .agg(HeavyHitters.heavyHitters(col("x"), 8).as("hh"))
      .select("hh.*").head()
    val items = row.getSeq[org.apache.spark.sql.Row](3)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(items === Map("a" -> 40L, "b" -> 25L, "c" -> 3L))
    assert(row.getLong(2) === 0L, "no count was ever retired: Δ must be 0")
  }

  test("per-group sketches: the invariant holds independently per lang") {
    val k = 16
    val exactByLang = tokens.groupBy("lang", "tok").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val rows = tokens.groupBy("lang")
      .agg(HeavyHitters.heavyHitters(col("tok"), k).as("hh"))
      .select(col("lang"), col("hh.*")).collect()
    assert(rows.length >= 3)
    for (r <- rows) {
      val lang = r.getString(0)
      val delta = r.getLong(3)
      val items = r.getSeq[org.apache.spark.sql.Row](4)
        .map(x => x.getString(0) -> x.getLong(1)).toMap
      for ((item, est) <- items) {
        val t = exactByLang((lang, item))
        assert(est <= t && t - est <= delta,
          s"[$lang] $item: est $est true $t Δ $delta")
      }
    }
  }

  test("streaming: the sketch aggregates in update mode and the invariant " +
      "holds on the final state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val k = 8
    val stream = MemoryStream[String](94, spark, None)
    val q = stream.toDF().toDF("tok")
      .agg(HeavyHitters.heavyHitters(col("tok"), k).as("hh"))
      .writeStream.format("memory").queryName("hh_sink")
      .outputMode("complete").start()
    val data = Seq.fill(60)("hot") ++ (1 to 40).map(i => s"cold$i") ++
      Seq.fill(25)("warm")
    val (a, b) = data.splitAt(data.size / 2)
    stream.addData(a); q.processAllAvailable()
    stream.addData(b); q.processAllAvailable()
    q.stop()
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val row = spark.table("hh_sink").select("hh.*").collect().last
    assert(row.getLong(0) === data.size.toLong)
    val delta = row.getLong(2)
    val items = row.getSeq[org.apache.spark.sql.Row](3)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((item, est) <- items) {
      val t = exact(item)
      assert(est <= t && t - est <= delta, s"$item: est $est true $t Δ $delta")
    }
    // both dominant tokens clear n/(k+1) = 125/9 ≈ 13.9 and MUST be present
    assert(items.contains("hot") && items.contains("warm"))
  }

  test("plan shape: two-phase aggregate, k-bounded buffers through the " +
      "exchange") {
    val df = tokens.groupBy("lang")
      .agg(HeavyHitters.heavyHitters(col("tok"), 16).as("hh"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate|SortAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final aggregate phases:\n${plan.take(800)}")
  }
}
