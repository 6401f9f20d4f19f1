package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data LAYOUT management — multi-dimensional clustering for scan
  * pruning (SURVEY §2 B1 posture work; the category every lakehouse
  * engine ships as Z-ORDER/CLUSTER BY): a table queried by conjunctive
  * range predicates on TWO dimensions cannot be sorted to serve both —
  * a sort on `a` gives perfect min/max pruning on `a` and none on `b`.
  * Interleaving the dimensions' bits (the Z-order / Morton curve —
  * Morton 1966, the published technique under Delta/Iceberg OPTIMIZE
  * ZORDER) makes rows close in (a, b) close in z, so sorting by z gives
  * every row group a TIGHT min/max box on BOTH columns and parquet's
  * row-group statistics skip most of the table for a 2-D box query.
  *
  * Spark specifics (vanilla, no DSv2 stats): file-level skipping keys
  * only on partition columns, so the pruning this buys happens at the
  * PARQUET ROW-GROUP level — the reader opens each footer and drops row
  * groups whose [min, max] on a filtered column misses the predicate;
  * the win is measured as the scan's output-rows metric, not files
  * listed (LayoutSpec measures exactly that, z-ordered vs single-column
  * sorted, same query). At 100 TB the same layout also feeds
  * range-partition pruning if z ranges are promoted to directory
  * partitions — noted, not done: the row-group form is the general one.
  *
  * Determinism: the z-value is pure bit arithmetic on BIGINTs —
  * integer-exact, partitioning-independent, and mirrored op-for-op in
  * the `fn_zorder` oracle. */
object Layout {

  /** Morton/Z-value of N non-negative dimensions, `bits` bits each,
    * round-robin interleaved into one BIGINT: bit (i·N + d) = dimension
    * d's bit i. A fixed tree of shift/and/or builtins — whole-stage-
    * codegen'd, no UDF, no lambda. Caller owns the range contract
    * (values ≥ 2^bits fold into the top z-stripe — clamp or bucket
    * first; the declared query buckets with pmod) and the width budget
    * (N·bits ≤ 62 keeps the BIGINT non-negative). */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    val n = dims.length
    require(n >= 2, s"need at least 2 dimensions, got $n")
    require(bits >= 1 && n * bits <= 62,
      s"need 1 <= bits and n*bits <= 62, got $n x $bits")
    val longs = dims.map(_.cast("long"))
    (for { i <- 0 until bits; d <- 0 until n } yield
      shiftright(longs(d), i).bitwiseAND(lit(1L))
        * lit(1L << (i * n + d))
    ).reduce(_ bitwiseOR _)
  }

  /** The 2-D form (bit 2i = a's bit i, bit 2i+1 = b's bit i) — the
    * declared `fn_zorder` key's shape. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    zValueN(Seq(a, b), bits)

  /** The oracle's identical arithmetic (DuckDB spells shift/and/or as
    * operators): spliced, not copied, wherever a z oracle is declared. */
  def zValueSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i)} " +
        s"| (($b >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " | ", ")")

  /** Write `df` Z-clustered on `dims`: range-partition by the z-value
    * into `nFiles` files and sort inside each — every output row group
    * covers a compact Morton-curve segment, i.e. a tight N-dim box.
    * Restartable by delete-and-rerun (same content either way). */
  def writeZOrderedN(df: DataFrame, dir: String, dims: Seq[Column],
      nFiles: Int, bits: Int): Unit =
    df.withColumn("__z", zValueN(dims, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)

  def writeZOrdered(df: DataFrame, dir: String, a: Column, b: Column,
      nFiles: Int, bits: Int = 16): Unit =
    writeZOrderedN(df, dir, Seq(a, b), nFiles, bits)

  // ------------------------------------------------------- Hilbert curve

  /** Hilbert index of a 2-D cell — the CONTINUOUS space-filling curve
    * (every step Manhattan-adjacent, spec-proven over the full grid),
    * where Morton jumps at power-of-two boundaries; sorted runs therefore
    * never straddle a jump and stripe-query pruning is measurably tighter
    * (LayoutSpec). One fused codegen kernel
    * ([[org.apache.spark.sql.graftexpr.HilbertExpr]]) — the per-level
    * frame rotation threads state, which a built-in composition can only
    * express as `bits` chained projections. Same range contract as
    * [[zValueN]]: caller buckets into [0, 2^bits). */
  def hValue(x: Column, y: Column, bits: Int = 16): Column =
    org.apache.spark.sql.graftexpr.HilbertExpr.column(x, y, lit(bits))

  /** The oracle's identical per-level arithmetic as a generated chain of
    * nested subqueries (state can't thread through one SELECT) — spliced,
    * not copied, wherever a Hilbert oracle is declared. `carry` columns
    * pass through untouched; `src` provides (`x`, `y`) plus the carries;
    * the result column is named `out`. DuckDB spells integer xor as
    * `xor()` (its `^` is exponentiation). */
  def hilbertSql(x: String, y: String, bits: Int, carry: Seq[String],
      src: String, out: String): String = {
    val cs = carry.mkString(", ")
    val inner = s"SELECT $cs, CAST($x AS BIGINT) AS hx, " +
      s"CAST($y AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM $src"
    val chained = (bits - 1 to 0 by -1).foldLeft(inner) { (acc, lvl) =>
      val s = 1L << lvl
      val rx = s"(CASE WHEN (hx & $s) <> 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (hy & $s) <> 0 THEN 1 ELSE 0 END)"
      s"""SELECT $cs,
         |  hd + ${s * s} * xor(3 * $rx, $ry) AS hd,
         |  CASE WHEN (hy & $s) = 0 THEN
         |    (CASE WHEN (hx & $s) <> 0 THEN $s - 1 - hy ELSE hy END)
         |    ELSE hx END AS hx,
         |  CASE WHEN (hy & $s) = 0 THEN
         |    (CASE WHEN (hx & $s) <> 0 THEN $s - 1 - hx ELSE hx END)
         |    ELSE hy END AS hy
         |FROM ($acc)""".stripMargin
    }
    s"SELECT $cs, hd AS $out FROM ($chained)"
  }

  /** Hilbert index of an N-dim cell — Skilling's transpose transform
    * ([[org.apache.spark.sql.graftexpr.HilbertNExpr]], round 16): the
    * N-dim generalization matching [[zValueN]]'s arity, closing the gap
    * where a 3-column clustered layout previously had only the Morton
    * curve. At n = 2 the Skilling curve is BIT-IDENTICAL to [[hValue]]'s
    * classic xy2d loop (LayoutSpec pins it exhaustively), so the two
    * entry points agree wherever they overlap. Same range/width contract
    * as [[zValueN]]: caller buckets into [0, 2^bits), n·bits ≤ 62. */
  def hValueN(dims: Seq[Column], bits: Int): Column = {
    val n = dims.length
    require(n >= 2, s"need at least 2 dimensions, got $n")
    require(bits >= 1 && n * bits <= 62,
      s"need 1 <= bits and n*bits <= 62, got $n x $bits")
    org.apache.spark.sql.graftexpr.HilbertNExpr.column(lit(bits),
      dims.map(_.cast("long")))
  }

  /** The N-dim oracle's identical Skilling arithmetic as a generated
    * chain of nested subqueries ([[hilbertSql]]'s posture — state can't
    * thread through one SELECT, and the inverse-undo inner loop mutates
    * x0 PER DIMENSION, so each (level, dim) step is its own subquery).
    * The gray encode collapses to one SELECT (sequential x_i ^= x_{i-1}
    * over updated values ≡ cumulative xor of the originals), the
    * t-computation inlines (it reads only the pre-update x_{n-1}), and
    * the final interleave is one masked-shift OR tree. DuckDB spells
    * integer xor as `xor()`. `carry` columns pass through untouched;
    * `src` provides the dim expressions; result column is `out`. */
  def hilbertNSql(xs: Seq[String], bits: Int, carry: Seq[String],
      src: String, out: String): String = {
    val n = xs.length
    require(n >= 2, s"need at least 2 dimensions, got $n")
    val cs = carry.mkString(", ")
    var acc = s"SELECT $cs, " + xs.zipWithIndex
      .map { case (x, i) => s"CAST($x AS BIGINT) AS hx$i" }
      .mkString(", ") + s" FROM $src"
    // inverse undo: per (level, dim) step, x0 and x_i swap their
    // P-masked difference unless dim i's Q bit is set (then x0 flips P)
    for (lvl <- bits - 1 to 1 by -1) {
      val q = 1L << lvl; val p = q - 1
      for (i <- 0 until n) {
        val sel =
          if (i == 0)
            (s"CASE WHEN (hx0 & $q) <> 0 THEN xor(hx0, $p) " +
              s"ELSE hx0 END AS hx0") +
              (1 until n).map(j => s", hx$j").mkString
          else {
            val t = s"(xor(hx0, hx$i) & $p)"
            (s"CASE WHEN (hx$i & $q) <> 0 THEN xor(hx0, $p) " +
              s"ELSE xor(hx0, $t) END AS hx0, ") +
              (1 until n).map { j =>
                if (j == i)
                  s"CASE WHEN (hx$i & $q) <> 0 THEN hx$i " +
                    s"ELSE xor(hx$i, $t) END AS hx$i"
                else s"hx$j"
              }.mkString(", ")
          }
        acc = s"SELECT $cs, $sel FROM ($acc)"
      }
    }
    // gray encode: cumulative xor of the originals
    val gray = (0 until n).map { i =>
      (1 to i).foldLeft("hx0")((e, j) => s"xor($e, hx$j)") + s" AS hx$i"
    }.mkString(", ")
    acc = s"SELECT $cs, $gray FROM ($acc)"
    // t from the (pre-update) last axis, applied to every axis in place
    val tExpr = (bits - 1 to 1 by -1).map { lvl =>
      val q = 1L << lvl
      s"CASE WHEN (hx${n - 1} & $q) <> 0 THEN ${q - 1} ELSE 0 END"
    }.reduceLeft((a, b) => s"xor($a, $b)")
    acc = s"SELECT $cs, " + (0 until n)
      .map(i => s"xor(hx$i, $tExpr) AS hx$i").mkString(", ") +
      s" FROM ($acc)"
    // interleave: bit (lvl, dim d) lands at lvl·n + (n-1-d)
    val hExpr = (for { lvl <- bits - 1 to 0 by -1; d <- 0 until n }
      yield s"(((hx$d >> $lvl) & 1) * ${1L << (lvl * n + (n - 1 - d))})")
      .mkString(" | ")
    s"SELECT $cs, ($hExpr) AS $out FROM ($acc)"
  }

  /** Write `df` Hilbert-clustered on (x, y): [[writeZOrderedN]] with the
    * continuous curve as the range-partition + sort key. */
  def writeHilbert(df: DataFrame, dir: String, x: Column, y: Column,
      nFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__h", hValue(x, y, bits))
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(dir)

  /** Write `df` Hilbert-clustered on N dims — [[writeHilbert]]'s shape
    * with the Skilling curve as the range-partition + sort key. */
  def writeHilbertN(df: DataFrame, dir: String, dims: Seq[Column],
      nFiles: Int, bits: Int): Unit =
    df.withColumn("__h", hValueN(dims, bits))
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(dir)

  // --------------------------------------- file-level statistics skipping

  /** Write the per-file min/max manifest that turns a clustered layout
    * into a FILE-SKIPPING table ([[readClustered]] — SURVEY B1.9): for
    * each data file, each of `cols`' min/max aggregated over the
    * parquet FOOTER's row-group statistics — metadata-only, no data
    * re-read (the row-group stats the writer already computed, lifted
    * one level). One manifest line per (file, col) at
    * `dir/_graft_stats/stats.tsv` (underscore-prefixed: invisible to
    * every normal read). Driver-side footer loop — at real scale the
    * same loop rides the cluster once per layout build (a
    * files-count-sized job, amortized over every query thereafter);
    * restartable by delete-and-rerun like the layout write itself.
    * Only integer-typed (INT32/INT64) columns are manifested — exactly
    * the layout-dimension contract ([[zValueN]] takes bucketed
    * non-negative ints) — and files whose footer lacks usable stats
    * are omitted, which the reader treats as never-prunable. */
  def writeStatsManifest(spark: org.apache.spark.sql.SparkSession,
      dir: String, cols: Seq[String]): Unit =
    buildStatsManifest(spark, dir, cols, incremental = false)

  /** INCREMENTAL manifest maintenance (round 16 — the verdict's gap #5):
    * footer-scan ONLY the data files not yet present in the manifest and
    * append their rows, leaving existing entries byte-untouched — the
    * LineIndex mergeable-row discipline applied to layout metadata, so
    * clustered layouts compose with the ingest-loop families (an
    * appended shard costs one footer read per NEW file, not a re-footer
    * of the whole layout). No existing manifest → identical to
    * [[writeStatsManifest]]. Same conservativeness: a new file whose
    * footer lacks usable stats is simply absent, and the reader keeps
    * it. Restartable: re-running after a partial append re-scans only
    * the still-missing files. */
  def appendStatsManifest(spark: org.apache.spark.sql.SparkSession,
      dir: String, cols: Seq[String]): Unit =
    buildStatsManifest(spark, dir, cols, incremental = true)

  private def buildStatsManifest(spark: org.apache.spark.sql.SparkSession,
      dir: String, cols: Seq[String], incremental: Boolean): Unit = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.column.statistics.{IntStatistics, LongStatistics}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val qRoot = fs.makeQualified(root)
    val out = new Path(root,
      org.apache.spark.sql.graftsrc.StatsFileIndex.ManifestPath)
    // existing manifest rows, kept verbatim on an incremental append;
    // their file keys decide which footers we may skip
    val existing: Seq[String] =
      if (incremental && fs.exists(out)) {
        val in = fs.open(out)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        text.linesIterator.filter(_.nonEmpty).toSeq
      } else Seq.empty
    val known: Set[String] = existing.map(_.split('\t')(0)).toSet
    // recursive: partitioned layouts keep their per-partition files;
    // manifest keys are ROOT-RELATIVE paths (bare names would collide
    // across partition directories — every one has a part-00000)
    val it = fs.listFiles(qRoot, true)
    def relKey(p: Path): String =
      p.toString.stripPrefix(qRoot.toString + "/")
    val files = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next()).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
        !s.getPath.toString.substring(qRoot.toString.length)
          .split('/').exists(seg => seg.startsWith("_") ||
            seg.startsWith(".")))
      .filterNot(s => known.contains(relKey(s.getPath)))
    val lines = files.flatMap { st =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
      val blocks =
        try reader.getFooter.getBlocks
        finally reader.close()
      import scala.jdk.CollectionConverters._
      cols.flatMap { c =>
        val perBlock = blocks.asScala.toSeq.flatMap { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == c)
            .flatMap(cc => cc.getStatistics match {
              case s: LongStatistics if s.hasNonNullValue =>
                Some((s.getMin, s.getMax))
              case s: IntStatistics if s.hasNonNullValue =>
                Some((s.getMin.toLong, s.getMax.toLong))
              case _ => None
            })
        }
        // every row group must carry stats, or the file-level bound is
        // not a bound — omit (reader keeps the file)
        if (perBlock.size == blocks.size && perBlock.nonEmpty)
          Some(s"${relKey(st.getPath)}\t$c\t${perBlock.map(_._1).min}" +
            s"\t${perBlock.map(_._2).max}")
        else None
      }
    }
    fs.mkdirs(out.getParent)
    val os = fs.create(out, true)
    try os.write(((existing ++ lines).mkString("\n") + "\n")
      .getBytes("UTF-8"))
    finally os.close()
  }

  /** Read a clustered layout through the FILE-SKIPPING DSv2 provider
    * ([[org.apache.spark.sql.graftsrc.ClusteredParquet]]): statistically
    * excluded files prune BEFORE task creation; the data path is the
    * stock v2 vectorized parquet reader. Identical results to
    * `spark.read.parquet(dir)` on any query (LayoutDsv2Spec pins it) —
    * the manifest only ever removes provably-empty work. */
  def readClustered(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    spark.read
      .format(classOf[org.apache.spark.sql.graftsrc.ClusteredParquet].getName)
      .load(dir)
}
