package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.core.Layout

/** Volume proof for the clustered-layout family ([[graft.core.Layout]],
  * SURVEY B1.7/B1.8) — the row-group-pruning claim MEASURED at parquet
  * volume on all three layouts over the identical table:
  *
  *   - `a_sort`: single-column range sort — the baseline every warehouse
  *     ships; perfect pruning on its own column, none on the other.
  *   - `z`: Morton interleave ([[Layout.writeZOrdered]]).
  *   - `h`: Hilbert curve ([[Layout.writeHilbert]]).
  *
  * Three queries per layout — an `a` stripe (the sort's home game), a `b`
  * stripe (where a single-column sort reads everything), and a 2-D box —
  * each measured as the parquet scan's output-rows metric (rows surviving
  * row-group statistics pruning; file listing can't prune without
  * partition columns, so this is THE number that decides scan cost).
  * Row counts are cross-checked equal across layouts first (same table,
  * same answer), so the pruning comparison can't silently compare
  * different queries.
  *
  * The claims asserted (exit-fail): the b-stripe reads ≥ 90% under the
  * a-sort and ≤ 35% under BOTH curves; the a-stripe reads ≤ 35% under
  * both curves (the √-trade). The h-vs-z margin is REPORTED, not
  * asserted — on stripe queries the continuous curve usually reads
  * slightly less (no jump-straddling row group), but the margin is
  * data-placement-dependent, not a theorem (the DedupVolume posture:
  * honest numbers over flattering gates).
  *
  * Usage: runMain graft.LayoutVolume [side] [files]   (defaults 4096, 128
  * — a 16.7M-row grid)
  */
object LayoutVolume {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_layoutvol_$tag").toString

  private def scanRows(df: DataFrame): Long = {
    df.sparkSession.conf.set("spark.sql.parquet.filterPushdown", "true")
    df.collect()
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  def run(spark: SparkSession, side: Long, files: Int): String = {
    require((side & (side - 1)) == 0, s"side must be a power of two: $side")
    val bits = java.lang.Long.numberOfTrailingZeros(side)
    val n = side * side
    val grid = spark.range(n).select(col("id"),
      (col("id") % side).as("a"), (col("id") / side).cast("long").as("b"))

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val aDir = tmp("asort"); val zDir = tmp("z"); val hDir = tmp("h")
    val (_, aSec) = timed {
      grid.withColumn("__s", col("a"))
        .repartitionByRange(files, col("__s")).sortWithinPartitions("__s")
        .drop("__s").write.mode("overwrite").parquet(aDir)
    }
    val (_, zSec) = timed {
      Layout.writeZOrdered(grid, zDir, col("a"), col("b"), files, bits)
    }
    val (_, hSec) = timed {
      Layout.writeHilbert(grid, hDir, col("a"), col("b"), files, bits)
    }
    // the file-skipping manifests (round 15) — footer-lifted min/max,
    // measured below as files-read fractions through the DSv2 path
    Seq(aDir, zDir, hDir).foreach(d =>
      Layout.writeStatsManifest(spark, d, Seq("a", "b")))

    // stripe width side/64 (≈1.6% of rows), box side/16 on each dim
    val w = side / 64; val lo = side / 2; val boxLo = side / 4
    val boxW = side / 16
    val queries: Seq[(String, DataFrame => DataFrame)] = Seq(
      "a_stripe" -> ((df: DataFrame) =>
        df.filter(col("a") >= lo && col("a") < lo + w)),
      "b_stripe" -> ((df: DataFrame) =>
        df.filter(col("b") >= lo && col("b") < lo + w)),
      "box" -> ((df: DataFrame) =>
        df.filter(col("a") >= boxLo && col("a") < boxLo + boxW
          && col("b") >= boxLo && col("b") < boxLo + boxW)))
    val layouts = Seq("a_sort" -> aDir, "z" -> zDir, "h" -> hDir)

    val measured = queries.map { case (qName, q) =>
      // same answer under every layout, or the comparison is meaningless
      val counts = layouts.map { case (_, dir) =>
        q(spark.read.parquet(dir)).count() }
      require(counts.distinct.size == 1,
        s"$qName row counts diverge across layouts: $counts")
      qName -> layouts.map { case (lName, dir) =>
        lName -> scanRows(q(spark.read.parquet(dir)))
      }
    }

    // files-read through the file-skipping DSv2 path (round 15): the
    // same queries over Layout.readClustered — v2 counts must equal the
    // vanilla counts (correctness first), files-kept from the index's
    // prune record
    import org.apache.spark.sql.graftsrc.StatsFileIndex
    StatsFileIndex.recordPrunes = true
    def pruneOf(dir: String): (Int, Int) = {
      val key = StatsFileIndex.lastPrune.keySet().toArray.map(_.toString)
        .find(_.endsWith(new java.io.File(dir).getName))
        .getOrElse(sys.error(s"no prune record for $dir"))
      StatsFileIndex.lastPrune.get(key)
    }
    val filesMeasured = queries.map { case (qName, q) =>
      qName -> layouts.map { case (lName, dir) =>
        val v2 = q(Layout.readClustered(spark, dir))
        val v2Count = v2.count()
        val v1Count = q(spark.read.parquet(dir)).count()
        require(v2Count == v1Count,
          s"$qName/$lName: v2 $v2Count != vanilla $v1Count rows")
        val (total, kept) = pruneOf(dir)
        require(total == files, s"$qName/$lName: manifest covers $total" +
          s" of $files files")
        lName -> kept
      }
    }

    def rowsOf(q: String, l: String): Long =
      measured.find(_._1 == q).get._2.find(_._1 == l).get._2
    val parts = measured.flatMap { case (qName, ls) =>
      ls.map { case (lName, rows) =>
        f""""${qName}_${lName}_frac":${rows.toDouble / n}%.4f""" }
    } ++ filesMeasured.flatMap { case (qName, ls) =>
      ls.map { case (lName, kept) =>
        f""""${qName}_${lName}_file_frac":${kept.toDouble / files}%.4f""" }
    }

    f"""{"metric":"layout_volume_rows","value":$n,"unit":"rows",""" +
      f""""side":$side,"files":$files,"bits":$bits,""" +
      f""""write_sec_a":$aSec%.1f,"write_sec_z":$zSec%.1f,""" +
      f""""write_sec_h":$hSec%.1f,""" +
      parts.mkString(",") + "," +
      f""""b_stripe_h_vs_z":${
        rowsOf("b_stripe", "h").toDouble /
          math.max(rowsOf("b_stripe", "z"), 1L)}%.3f}"""
  }

  /** 3-D section (round 16 — [[Layout.hValueN]]/[[Layout.writeHilbertN]],
    * the Skilling curve): Morton-3D vs Hilbert-3D over the identical
    * side³ grid, one stripe query per dimension plus the 3-D box, row
    * fractions from the scan metric. No single-column baseline here —
    * the 2-D section already establishes that an unclustered dimension
    * reads ~100%; this section measures what the N-dim generalization
    * buys on every axis at once. */
  def run3d(spark: SparkSession, side: Long, files: Int): String = {
    require((side & (side - 1)) == 0, s"side must be a power of two: $side")
    val bits = java.lang.Long.numberOfTrailingZeros(side)
    val n = side * side * side
    val grid = spark.range(n).select(col("id"),
      (col("id") % side).as("a"),
      ((col("id") / side) % side).cast("long").as("b"),
      (col("id") / (side * side)).cast("long").as("c"))
    val dims = Seq(col("a"), col("b"), col("c"))

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val zDir = tmp("z3"); val hDir = tmp("h3")
    val (_, zSec) = timed {
      Layout.writeZOrderedN(grid, zDir, dims, files, bits.toInt) }
    val (_, hSec) = timed {
      Layout.writeHilbertN(grid, hDir, dims, files, bits.toInt) }

    val w = math.max(side / 64, 1L); val lo = side / 2
    val boxLo = side / 4; val boxW = math.max(side / 16, 1L)
    val queries: Seq[(String, DataFrame => DataFrame)] =
      Seq("a", "b", "c").map { dim =>
        s"${dim}_stripe" -> ((df: DataFrame) =>
          df.filter(col(dim) >= lo && col(dim) < lo + w))
      } :+ ("box" -> ((df: DataFrame) =>
        df.filter(col("a") >= boxLo && col("a") < boxLo + boxW
          && col("b") >= boxLo && col("b") < boxLo + boxW
          && col("c") >= boxLo && col("c") < boxLo + boxW)))
    val layouts = Seq("z" -> zDir, "h" -> hDir)

    val parts = queries.flatMap { case (qName, q) =>
      val counts = layouts.map { case (_, dir) =>
        q(spark.read.parquet(dir)).count() }
      require(counts.distinct.size == 1,
        s"$qName row counts diverge across 3-D layouts: $counts")
      layouts.map { case (lName, dir) =>
        f""""${qName}_${lName}_frac":${
          scanRows(q(spark.read.parquet(dir))).toDouble / n}%.4f"""
      }
    }
    f"""{"metric":"layout_volume_3d_rows","value":$n,"unit":"rows",""" +
      f""""side":$side,"files":$files,"bits":$bits,""" +
      f""""write_sec_z":$zSec%.1f,"write_sec_h":$hSec%.1f,""" +
      parts.mkString(",") + "}"
  }

  def main(args: Array[String]): Unit = {
    val side = args.headOption.map(_.toLong).getOrElse(4096L)
    val files = args.drop(1).headOption.map(_.toInt).getOrElse(128)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val line = run(spark, side, files)
    println(line)
    Artifacts.write("layout_volume.json", line)

    // 3-D: side 256 → the same 16.7M rows with three clustered dims
    val line3 = run3d(spark, 256L, files)
    println(line3)
    Artifacts.write("layout_volume_3d.json", line3)
    spark.stop()

    def frac(k: String): Double =
      ("\"" + k + "\":([0-9.]+)").r.findFirstMatchIn(line).get
        .group(1).toDouble
    val ok = frac("b_stripe_a_sort_frac") >= 0.90 &&
      frac("b_stripe_z_frac") <= 0.35 && frac("b_stripe_h_frac") <= 0.35 &&
      frac("a_stripe_z_frac") <= 0.35 && frac("a_stripe_h_frac") <= 0.35
    if (!ok) {
      System.err.println("[layoutvol] PRUNING CLAIM VIOLATED")
      sys.exit(1)
    }
    // file-level skipping (round 15): a b-stripe cannot skip any FILE
    // of a single-column a-sort (every file spans all of b) but skips
    // most files under both curves; the a-stripe skips under all three
    // (the a-sort's home game included — its per-file a ranges are
    // tight)
    val fOk = frac("b_stripe_a_sort_file_frac") >= 0.99 &&
      frac("b_stripe_z_file_frac") <= 0.35 &&
      frac("b_stripe_h_file_frac") <= 0.35 &&
      frac("a_stripe_a_sort_file_frac") <= 0.10 &&
      frac("a_stripe_z_file_frac") <= 0.35 &&
      frac("a_stripe_h_file_frac") <= 0.35 &&
      frac("box_z_file_frac") <= 0.35 && frac("box_h_file_frac") <= 0.35
    if (!fOk) {
      System.err.println("[layoutvol] FILE-SKIPPING CLAIM VIOLATED")
      sys.exit(1)
    }

    def frac3(k: String): Double =
      ("\"" + k + "\":([0-9.]+)").r.findFirstMatchIn(line3).get
        .group(1).toDouble
    val ok3 = Seq("a", "b", "c").forall { d =>
      frac3(s"${d}_stripe_z_frac") <= 0.35 &&
        frac3(s"${d}_stripe_h_frac") <= 0.35
    } && frac3("box_z_frac") <= 0.10 && frac3("box_h_frac") <= 0.10
    if (!ok3) {
      System.err.println("[layoutvol] 3-D PRUNING CLAIM VIOLATED")
      sys.exit(1)
    }
  }
}
