package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** MERGE/upsert apply ([[Relational.mergeUpsert]]) — the anti+union
  * decomposition's invariants, the broadcast/shuffle form equality, and
  * the plan shape (target never shuffles in the broadcast-delta form). */
class MergeSpec extends SparkSpec {

  private def fixture() = {
    import spark.implicits._
    val target = (1L to 1000L)
      .map(i => (i, s"name_$i", i * 10.0))
      .toDF("id", "name", "amount")
    // delta: update ids 1..100 (amount doubled), delete 101..150,
    // insert 2001..2050
    val updates = (1L to 100L)
      .map(i => (i, s"name_$i", i * 20.0, "U"))
    val deletes = (101L to 150L)
      .map(i => (i, s"name_$i", i * 10.0, "D"))
    val inserts = (2001L to 2050L)
      .map(i => (i, s"new_$i", 7.0, "I"))
    val changes = (updates ++ deletes ++ inserts)
      .toDF("id", "name", "amount", "op")
    (target, changes)
  }

  test("merge invariants: counts, updates replace, deletes vanish, " +
      "inserts appear, untouched rows byte-identical") {
    val (target, changes) = fixture()
    val merged = Relational.mergeUpsert(target, changes, "id")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    assert(merged.size === 1000 - 50 + 50)
    (1L to 100L).foreach { i =>
      assert(merged(i) === ((s"name_$i", i * 20.0)), s"update lost at $i") }
    (101L to 150L).foreach { i =>
      assert(!merged.contains(i), s"delete survived at $i") }
    (2001L to 2050L).foreach { i =>
      assert(merged(i) === ((s"new_$i", 7.0)), s"insert lost at $i") }
    (151L to 1000L).foreach { i =>
      assert(merged(i) === ((s"name_$i", i * 10.0)), s"untouched drifted at $i") }
  }

  test("shuffled-delta form ≡ broadcast form; key-distinct delta keeps " +
      "key uniqueness") {
    val (target, changes) = fixture()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
    val b = Relational.mergeUpsert(target, changes, "id")
    val s = Relational.mergeUpsert(target, changes, "id",
      broadcastDelta = false)
    assert(rows(b) === rows(s))
    val dup = b.groupBy("id").count().filter(col("count") > 1).count()
    assert(dup === 0L, "merge must preserve key uniqueness")
  }

  test("broadcast size guard: a delta over the key cap degrades to the " +
      "shuffled anti-join (same rows, no broadcast left-anti); " +
      "validateDelta rejects a duplicate-key delta") {
    import spark.implicits._
    val (target, changes) = fixture()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
    // over-cap: keys=200 > cap=10 — must fall back, result unchanged
    val guarded = Relational.mergeUpsert(target, changes, "id",
      broadcastKeyCap = 10L)
    assert(rows(guarded) === rows(Relational.mergeUpsert(target, changes,
      "id")))
    // the guard drops the unconditional broadcast HINT — AQE may still
    // choose a broadcast from its own measured size (desired: the
    // runtime decision is size-aware where the hint was not), so the
    // assertion targets the hint, not the physical join pick
    val hinted = Relational.mergeUpsert(target, changes, "id")
      .queryExecution.analyzed.toString
    val unhinted = guarded.queryExecution.analyzed.toString
    assert(hinted.contains("ResolvedHint"),
      "under-cap delta must carry the broadcast hint")
    assert(!unhinted.contains("ResolvedHint"),
      s"over-cap delta must not carry the broadcast hint:\n$unhinted")
    // validateDelta: a duplicate-key delta violates the exactly-once
    // contract and must fail loudly instead of emitting duplicate rows
    val dupDelta = changes.unionByName(
      Seq((1L, "name_1", 999.0, "U")).toDF("id", "name", "amount", "op"))
    val e = intercept[IllegalArgumentException] {
      Relational.mergeUpsert(target, dupDelta, "id", validateDelta = true)
    }
    assert(e.getMessage.contains("key-distinct"))
    // and the clean fixture passes validation untouched
    assert(rows(Relational.mergeUpsert(target, changes, "id",
      validateDelta = true)) === rows(Relational.mergeUpsert(target,
      changes, "id")))
  }

  test("merge-on-read view: latest version wins, update-then-delete " +
      "deletes, delete-then-reinsert reinserts, replayed appends collapse") {
    import spark.implicits._
    val target = (1L to 10L).map(i => (i, i * 10.0)).toDF("id", "amount")
    val log = Seq(
      (1L, 100.0, "U", 1L), (1L, 200.0, "U", 2L), // superseded update
      (2L, 999.0, "U", 1L), (2L, 20.0, "D", 2L),  // update then delete
      (3L, 0.0, "D", 1L), (3L, 333.0, "I", 2L),   // delete then reinsert
      (11L, 42.0, "I", 1L))                        // plain insert
      .toDF("id", "amount", "op", "seq")
    def view(lg: org.apache.spark.sql.DataFrame) =
      Relational.mergeView(target, lg, "id", "seq")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val v = view(log)
    assert(v(1L) === 200.0, "latest version must win")
    assert(!v.contains(2L), "update-then-delete must delete")
    assert(v(3L) === 333.0, "delete-then-reinsert must reinsert")
    assert(v(11L) === 42.0)
    (4L to 10L).foreach(i => assert(v(i) === i * 10.0))
    assert(v.size === 10 - 1 + 1)
    // an at-least-once replay appends byte-identical rows — same view
    assert(view(log.unionByName(log)) === v)
  }

  test("streaming CDC log + merge view ≡ the batch view over the " +
      "accumulated log") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val target = (1L to 10L).map(i => (i, i * 10.0)).toDF("id", "amount")
    val logPath = java.nio.file.Files
      .createTempDirectory("graft_mergelog").toString + "/log"
    val rows = Seq(
      (1L, 100.0, "U", 1L), (2L, 0.0, "D", 1L),
      (1L, 200.0, "U", 2L), (11L, 42.0, "I", 1L))
    val stream = MemoryStream[(Long, Double, String, Long)](181, spark, None)
    val q = graft.stream.Streaming.streamMergeLog(
      stream.toDF().toDF("id", "amount", "op", "seq"), logPath).start()
    Seq(rows.take(2), rows.drop(2)).foreach { b =>
      stream.addData(b); q.processAllAvailable() }
    q.stop()
    def rowset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val streamed = rowset(Relational.mergeView(target,
      spark.read.parquet(logPath), "id", "seq"))
    val batch = rowset(Relational.mergeView(target,
      rows.toDF("id", "amount", "op", "seq"), "id", "seq"))
    assert(streamed === batch)
    assert(streamed.exists(_ == (1L, 200.0)) &&
      !streamed.exists(_._1 == 2L))
  }

  test("scd2: intervals chain with no gaps or overlaps, exactly one " +
      "current row per key, snapshots read the covering version") {
    import spark.implicits._
    val log = Seq(
      (1L, 10.0, 100L), (1L, 11.0, 200L), (1L, 12.0, 300L),
      (2L, 20.0, 150L))
      .toDF("id", "amount", "seq")
    val hist = Relational.scd2Build(log, "id", "seq")
    val rows = hist.collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
      r.getBoolean(4)))
    // chaining: valid_to of version n is valid_from of version n+1
    val k1 = rows.filter(_._1 == 1L).sortBy(_._3)
    assert(k1.map(x => (x._3, x._4)) ===
      Seq((100L, Some(200L)), (200L, Some(300L)), (300L, None)))
    assert(rows.count(_._5) === 2, "one current row per key")
    assert(rows.filter(_._5).forall(_._4.isEmpty))
    // snapshots: at 250 key 1 reads the [200,300) version, key 2 its
    // only version; at 50 nothing exists yet
    def snap(at: Long) = Relational.scd2Snapshot(hist, lit(at))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(snap(250L) === Map(1L -> 11.0, 2L -> 20.0))
    assert(snap(300L) === Map(1L -> 12.0, 2L -> 20.0))
    assert(snap(50L) === Map.empty)
    // every (key, t ≥ birth) resolves to exactly one version
    (100L to 400L by 50L).foreach { t =>
      val n = Relational.scd2Snapshot(hist, lit(t))
        .filter(col("id") === 1L).count()
      assert(n === 1L, s"snapshot at $t matched $n versions")
    }
  }

  test("broadcast-delta plan: the target side survives via a broadcast " +
      "LEFT ANTI — no target shuffle, no full-outer join") {
    val (target, changes) = fixture()
    val df = Relational.mergeUpsert(target, changes, "id")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast left-anti, got:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("FullOuter"),
      "the decomposition must not fall back to SMJ/full-outer")
  }
}
