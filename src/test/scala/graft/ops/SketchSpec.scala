package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Sketch surface: Bloom-filter semi-join reduction (JoinPrefilter) and
  * count-min-sketch heavy hitters — the approximate structures a 100 TB
  * pipeline uses to avoid exact shuffles. */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("bloom semi-join reduction loses no matches and prunes hard") {
    val fact = Tables.events(spark, sf)
    // a "complex-predicate" dim the planner can't fold into the scan:
    // 3 of the 150 users
    val dim = fact.select(col("user_id")).distinct()
      .filter(col("user_id") % 50 === 0)
    val trueMatches = fact.join(dim, Seq("user_id"), "left_semi").count()
    val factCount = fact.count()

    val reduced = JoinPrefilter.bloomReduce(
      fact, col("user_id"), dim, col("user_id"),
      estItems = 1000L, numBits = 1L << 20)
    val reducedCount = reduced.count()

    // no false negatives: every true match survives the probe
    assert(reduced.join(dim, Seq("user_id"), "left_semi").count()
      === trueMatches)
    // effective: superset of matches, far below the unfiltered fact
    assert(reducedCount >= trueMatches)
    assert(reducedCount <= trueMatches + (factCount / 100),
      s"reduction too weak: $reducedCount vs $trueMatches matches")
  }

  test("incremental distinct: appended day sketches union to exact-within-error") {
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, sf).withColumn("day", to_date(col("ts")))
    val days = events.select("day").distinct()
      .orderBy("day").collect().map(_.getDate(0).toString)
    assert(days.length >= 3, s"fixture needs several days, got ${days.length}")
    val cut = days(days.length / 2)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hll_idx").toString

    // two INCREMENTAL appends: history first, then "newly arrived" days —
    // the second write must not touch the first write's partitions
    IncrementalDistinct.appendDailySketches(
      events.filter(col("day") <= cut).drop("day"), dir)
    val histEstimate = IncrementalDistinct.distinctUsers(spark, dir)
    IncrementalDistinct.appendDailySketches(
      events.filter(col("day") > cut).drop("day"), dir)

    // history window re-queried AFTER the append: bit-identical estimate —
    // proof the old partitions were not rewritten or double-counted
    assert(IncrementalDistinct.distinctUsers(spark, dir, toDay = Some(cut))
      === histEstimate)

    // full-window and per-type estimates within HLL error of exact
    // (lgK=12 ⇒ ~0.8% standard error; 5% is a generous determinism-safe gate)
    val exactAll = events.select("user_id").distinct().count()
    val estAll = IncrementalDistinct.distinctUsers(spark, dir)
    assert(math.abs(estAll - exactAll).toDouble / exactAll < 0.05,
      s"est $estAll vs exact $exactAll")
    val exactByType = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    IncrementalDistinct.distinctUsersByType(spark, dir).collect().foreach { r =>
      val (t, est) = (r.getString(0), r.getLong(1))
      val exact = exactByType(t)
      assert(math.abs(est - exact).toDouble / exact < 0.05,
        s"$t: est $est vs exact $exact")
    }

    // a day-bounded estimate must PRUNE the sketch scan to matching
    // day partitions — the plan carries a partition filter on day
    val bounded = IncrementalDistinct.sketches(spark, dir,
      fromDay = Some(days.head), toDay = Some(cut))
    bounded.collect()
    val plan = bounded.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day")
      || plan.contains("PartitionFilters: [(day"),
      s"day bounds must land on PartitionFilters:\n$plan")
  }

  test("re-appending an existing day is an idempotent no-op (once-per-day contract)") {
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, sf)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_kll_idem").toString
    def table(): Set[(String, String, Long, Seq[Byte])] =
      spark.read.parquet(dir)
        .select(col("day").cast("string"), col("event_type"),
          col("n_values"), col("sketch"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getAs[Array[Byte]](3).toSeq)).toSet

    val first = QuantileSketch.appendDailySketches(events, dir)
    assert(first.nonEmpty)
    val before = table()

    // same batch again: every day exists → nothing written, nothing changed.
    // Byte-identity of the sketch table IS "estimates unchanged" — a
    // re-appended day would double its rows (and so its KLL weight) here.
    val again = QuantileSketch.appendDailySketches(events, dir)
    assert(again.isEmpty, s"re-append must skip all existing days, wrote $again")
    assert(table() === before)

    // mixed batch: existing days + genuinely new (shifted) days → only the
    // new days are written; existing-day rows stay byte-identical
    val shifted = events.withColumn("ts",
      col("ts") + expr("INTERVAL 365 DAYS"))
    val mixed = events.unionByName(shifted)
    val third = QuantileSketch.appendDailySketches(mixed, dir)
    assert(third.nonEmpty && third.intersect(first).isEmpty,
      s"mixed append must write only the new days, wrote $third")
    assert(first.subsetOf(table().map(_._1)) &&
      table().filter(r => first.contains(r._1)) === before)
  }

  test("interrupted append recovers: unmarked partial day is rebuilt, not skipped forever") {
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, sf)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_kll_crash").toString
    val first = QuantileSketch.appendDailySketches(events, dir)
    val victim = first.min
    val good = spark.read.parquet(dir)
      .filter(col("day") === victim)
      .select("event_type", "n_values").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

    // simulate a crash AFTER the parquet job commit but BEFORE the day's
    // commit marker landed (the one window the marker protocol leaves):
    // strip the marker, leaving real data files behind — the pre-r9 bare
    // directory-existence guard would treat this day as done forever
    val marker = new java.io.File(s"$dir/day=$victim/_graft_day_committed")
    assert(marker.exists, "fixture: committed day must carry its marker")
    assert(marker.delete())

    val retry = QuantileSketch.appendDailySketches(events, dir)
    assert(retry === Set(victim),
      s"retry must rebuild exactly the unmarked day, wrote $retry")
    assert(marker.exists, "rebuilt day must be re-marked committed")
    // rebuilt whole, never double-weighted: the partial debris was deleted
    // before the rewrite, so the day's rows match a clean single append
    val rebuilt = spark.read.parquet(dir)
      .filter(col("day") === victim)
      .select("event_type", "n_values").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rebuilt === good,
      "recovered day must equal a clean append (no doubled KLL weight)")
  }

  test("incremental quantiles: appended KLL sketches answer windows within rank error") {
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, sf).withColumn("day", to_date(col("ts")))
    val days = events.select("day").distinct()
      .orderBy("day").collect().map(_.getDate(0).toString)
    val cut = days(days.length / 2)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_kll_idx").toString

    // two incremental appends (history, then new days)
    QuantileSketch.appendDailySketches(
      events.filter(col("day") <= cut).drop("day"), dir)
    import scala.jdk.CollectionConverters._
    def partFiles(): Map[String, Long] = {
      val base = java.nio.file.Paths.get(dir)
      val s = java.nio.file.Files.walk(base)
      try s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => base.relativize(p).toString ->
          java.nio.file.Files.size(p)).toMap
      finally s.close()
    }
    val before = partFiles()
    QuantileSketch.appendDailySketches(
      events.filter(col("day") > cut).drop("day"), dir)

    // append-only immutability, proven at the FILE level (KLL merge is a
    // randomized algorithm, so re-merged ESTIMATES legitimately wobble
    // within the rank bound — bytes on disk are the invariant): every
    // history file survives the append byte-for-byte in size and name,
    // and only new-day files were added
    val after = partFiles()
    assert(before.forall { case (f, sz) => after.get(f).contains(sz) },
      "append must not rewrite or resize existing history files")
    assert(after.size > before.size, "append must add new-day files")

    // rank accuracy vs exact order statistics over the FULL window:
    // the estimated quantile's true rank must sit within ±4.5% of p.
    // k=200 ⇒ ~1.65% single-sided 99%-confidence bound, paid on two merge
    // legs; KLL compaction is randomized and UNSEEDED in DataSketches, so
    // a 3% gate left only modest headroom and could flap across JVM runs —
    // 4.5% keeps the gate meaningful (a broken merge is way outside it)
    // while making it deterministic-safe.
    val est = QuantileSketch.quantilesByType(spark, dir,
      Seq(0.25, 0.5, 0.9)).collect()
    assert(est.nonEmpty)
    val byType = events.select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (t, rows) =>
        t -> rows.map(_.getDouble(1)).sorted
      }
    est.foreach { r =>
      val (t, p, v) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      val xs = byType(t)
      val rank = xs.count(_ <= v).toDouble / xs.length
      assert(math.abs(rank - p) < 0.045,
        f"$t p=$p: estimate $v%.3f has true rank $rank%.4f")
    }
  }

  test("count-min sketch overestimates boundedly (heavy hitters)") {
    val events = Tables.events(spark, sf)
    val eps = 0.005
    val total = events.count()
    val cms = events.stat.countMinSketch("event_type", eps, 0.99, 42)
    val exact = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      val est = cms.estimateCount(t)
      // CMS never underestimates; overestimate bounded by eps * stream size
      assert(est >= n, s"$t: est $est < exact $n")
      assert(est <= n + (eps * total).toLong, s"$t: est $est too high vs $n")
    }
  }
}
