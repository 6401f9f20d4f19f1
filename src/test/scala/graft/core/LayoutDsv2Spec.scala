package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftsrc.StatsFileIndex
import graft.SparkSpec

/** File-level statistics skipping ([[Layout.readClustered]] over the
  * graftsrc.ClusteredParquet DSv2 provider): results identical to
  * vanilla parquet reads under every query shape, files provably prune
  * BEFORE task creation on clustered layouts, and pruning is
  * conservative — no manifest, uncovered columns, and non-prunable
  * predicate shapes all read everything. */
class LayoutDsv2Spec extends SparkSpec {

  private val side = 256L
  private val files = 16
  private lazy val bits = java.lang.Long.numberOfTrailingZeros(side)

  private def grid = spark.range(side * side).select(col("id"),
    (col("id") % side).as("a"), (col("id") / side).cast("long").as("b"))

  /** One z-clustered layout + manifest, shared by the tests. */
  private lazy val zDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dsv2_z").toString
    Layout.writeZOrdered(grid, d, col("a"), col("b"), files, bits)
    Layout.writeStatsManifest(spark, d, Seq("a", "b"))
    d
  }

  /** Same layout, NO manifest — the degraded-gracefully control. */
  private lazy val bareDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dsv2_bare").toString
    Layout.writeZOrdered(grid, d, col("a"), col("b"), files, bits)
    d
  }

  private def rows(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  org.apache.spark.sql.graftsrc.StatsFileIndex.recordPrunes = true

  private def pruneCounts(dir: String): (Int, Int) = {
    val k = StatsFileIndex.lastPrune.keySet().toArray
      .map(_.toString).find(_.contains(new java.io.File(dir).getName))
    assert(k.isDefined, s"no prune record for $dir in " +
      StatsFileIndex.lastPrune.keySet())
    StatsFileIndex.lastPrune.get(k.get)
  }

  private val w = side / 64
  private val lo = side / 2

  test("v2 results ≡ vanilla parquet under every query shape — stripe, " +
      "box, equality, no filter, uncovered column, disjunction, empty") {
    val vanilla = spark.read.parquet(zDir)
    val v2 = Layout.readClustered(spark, zDir)
    val shapes: Seq[DataFrame => DataFrame] = Seq(
      df => df.filter(col("b") >= lo && col("b") < lo + w),
      df => df.filter(col("a") >= 64 && col("a") < 80
        && col("b") >= 64 && col("b") < 80),
      df => df.filter(col("a") === 17L),
      df => df,
      df => df.filter(col("id") % 97 === 0), // uncovered shape + column
      df => df.filter(col("a") < 4 || col("b") > side - 4),
      df => df.filter(col("a") >= side * 2)) // provably empty
    shapes.zipWithIndex.foreach { case (q, i) =>
      assert(rows(q(v2)) === rows(q(vanilla)), s"shape $i diverged")
    }
  }

  test("a b-stripe on the z-layout prunes FILES before task creation; " +
      "an unfiltered read keeps all of them") {
    val v2 = Layout.readClustered(spark, zDir)
    v2.filter(col("b") >= lo && col("b") < lo + w).collect()
    val (total, kept) = pruneCounts(zDir)
    assert(total === files, s"manifest must cover all $files files")
    assert(kept < total / 2,
      s"b-stripe must skip most files on a z-layout ($kept of $total)")
    assert(kept > 0, "the stripe is non-empty — some file must survive")

    Layout.readClustered(spark, zDir).collect()
    val (t2, k2) = pruneCounts(zDir)
    assert(t2 === files && k2 === files,
      "no filter, no pruning — every file read")
  }

  test("an equality probe prunes to the one curve neighborhood; a " +
      "provably-empty range keeps zero files") {
    val v2 = Layout.readClustered(spark, zDir)
    v2.filter(col("a") === 17L && col("b") === 200L).collect()
    val (_, kept) = pruneCounts(zDir)
    assert(kept <= 2, s"a point probe must touch at most a couple of " +
      s"files, touched $kept")

    Layout.readClustered(spark, zDir)
      .filter(col("a") >= side * 2).collect()
    val (_, kEmpty) = pruneCounts(zDir)
    assert(kEmpty === 0, "out-of-domain range must prune everything")
  }

  test("IN-list pruning: a small integer IN list prunes to its curve " +
      "neighborhoods; results ≡ vanilla") {
    val v2 = Layout.readClustered(spark, zDir)
    val q = (df: DataFrame) => df.filter(col("a").isin(3L, 250L))
    assert(rows(q(v2)) === rows(q(spark.read.parquet(zDir))))
    q(v2).collect()
    val (total, kept) = pruneCounts(zDir)
    // two a-values hit two block columns of the z-layout — ~half the
    // files plus range-boundary straddles; the point is files DID prune
    assert(kept < total,
      s"a 2-value IN must skip some files ($kept of $total)")
    assert(kept > 0)

    // a point IN (both coords constrained) prunes to a neighborhood
    Layout.readClustered(spark, zDir)
      .filter(col("a").isin(17L) && col("b").isin(200L, 201L)).collect()
    val (_, keptPt) = pruneCounts(zDir)
    assert(keptPt <= 2, s"point IN probe touched $keptPt files")
  }

  test("conservative degradation: no manifest → no pruning; filters on " +
      "uncovered columns never prune") {
    val bare = Layout.readClustered(spark, bareDir)
    assert(rows(bare.filter(col("b") >= lo && col("b") < lo + w)) ===
      rows(spark.read.parquet(bareDir)
        .filter(col("b") >= lo && col("b") < lo + w)))

    // covered layout, uncovered column: id is not in the manifest
    Layout.readClustered(spark, zDir)
      .filter(col("id") >= 0L && col("id") < 10L).collect()
    val (t, k) = pruneCounts(zDir)
    assert(t === k, "uncovered column must not prune")
  }

  test("partitioned layouts: the relative-key manifest prunes files " +
      "INSIDE partition directories (bare names would collide), and " +
      "composes with partition pruning") {
    val d = java.nio.file.Files
      .createTempDirectory("graft_dsv2_part").toString
    grid.withColumn("pt", (col("a") / 64).cast("long"))
      .repartitionByRange(16, col("pt"), col("b"))
      .sortWithinPartitions("pt", "b")
      .write.mode("overwrite").partitionBy("pt").parquet(d)
    Layout.writeStatsManifest(spark, d, Seq("b"))

    def rows3(df: DataFrame) = df.select("id", "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val v2 = Layout.readClustered(spark, d)
    val q = (df: DataFrame) =>
      df.filter(col("b") >= lo && col("b") < lo + w)
    assert(rows3(q(v2)) === rows3(q(spark.read.parquet(d))))
    q(v2).collect()
    val (total, kept) = pruneCounts(d)
    assert(total > 4, s"partitioned layout should have many files, " +
      s"got $total")
    assert(kept < total && kept > 0,
      s"b-filter must prune inside partition dirs ($kept of $total)")

    // a partition-column filter stacks on top: fewer files listed
    // before the stats even look
    q(v2).filter(col("pt") === 1L).collect()
    val (t2, k2) = pruneCounts(d)
    assert(t2 < total, "partition pruning must shrink the listing first")
    assert(k2 <= kept)
  }

  test("incremental manifest append: appended files prune without a " +
      "rebuild, existing entries byte-untouched") {
    import org.apache.hadoop.fs.Path
    val d = java.nio.file.Files
      .createTempDirectory("graft_dsv2_append").toString
    val lowHalf = grid.filter(col("b") < side / 2)
    val highHalf = grid.filter(col("b") >= side / 2)
    Layout.writeZOrdered(lowHalf, d, col("a"), col("b"), 8, bits)
    Layout.writeStatsManifest(spark, d, Seq("a", "b"))

    val mPath = new Path(d, StatsFileIndex.ManifestPath)
    val conf = spark.sessionState.newHadoopConf()
    val fs = mPath.getFileSystem(conf)
    def readLines(): Seq[String] = {
      val in = fs.open(mPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    }
    // plant a sentinel edit in one existing row (widened min — still
    // conservative): a full rebuild would erase it, a true append must
    // carry it through verbatim
    val before = readLines()
    val Array(f0, c0, _, mx0) = before.head.split('\t')
    val sentinel = s"$f0\t$c0\t-7777\t$mx0"
    val edited = sentinel +: before.tail
    val os = fs.create(mPath, true)
    try os.write((edited.mkString("\n") + "\n").getBytes("UTF-8"))
    finally os.close()

    // append a new clustered shard (its own z-sort, new part files)
    highHalf.withColumn("__z",
        Layout.zValueN(Seq(col("a"), col("b")), bits))
      .repartitionByRange(8, col("__z")).sortWithinPartitions("__z")
      .drop("__z").write.mode("append").parquet(d)
    Layout.appendStatsManifest(spark, d, Seq("a", "b"))

    val after = readLines()
    assert(after.take(edited.size) === edited,
      "append must leave existing rows (incl. the sentinel) verbatim")
    assert(after.size > edited.size, "appended files must gain rows")
    // every data file is now covered
    val it = fs.listFiles(fs.makeQualified(new Path(d)), true)
    val nFiles = Iterator.continually(it).takeWhile(_.hasNext)
      .map(_.next()).count(s => s.isFile &&
        s.getPath.getName.endsWith(".parquet") &&
        !s.getPath.getName.startsWith("_"))
    assert(after.map(_.split('\t')(0)).distinct.size === nFiles)

    // correctness ≡ vanilla, and a query into the APPENDED range prunes
    val v2 = Layout.readClustered(spark, d)
    val q = (df: DataFrame) => df.filter(col("b") >= side - 4)
    assert(rows(q(v2)) === rows(q(spark.read.parquet(d))))
    q(v2).collect()
    val (total, kept) = pruneCounts(d)
    assert(total === nFiles)
    assert(kept < total && kept > 0,
      s"appended-range query must prune ($kept of $total)")
    // restartability: a second append is a no-op
    Layout.appendStatsManifest(spark, d, Seq("a", "b"))
    assert(readLines() === after)
  }

  test("the v2 plan still pushes filters to the parquet reader — file " +
      "skipping composes with row-group pruning, not replaces it") {
    val q = Layout.readClustered(spark, zDir)
      .filter(col("b") >= lo && col("b") < lo + w)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), "the v2 read path must be in play")
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(b,"),
      s"pushed filters must reach the scan:\n$plan")
  }
}
