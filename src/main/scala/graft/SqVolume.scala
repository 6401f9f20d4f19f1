package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Volume proof for scalar quantization ([[graft.sim.Sq]], SURVEY B9.40)
  * — the [[PqVolume]] discipline applied to the MIDDLE tier of the
  * quantization spectrum, so the spectrum's trade-off is MEASURED at a
  * million rows rather than asserted:
  *
  *   floats 1× (exact) — SQ8 ~4× (near-exact) — PQ ~32×/42× (coarse)
  *
  *  - corpus: [[PqVolume.corpus]] unchanged (1M 64-dim unit vectors,
  *    ids ≡ 3 (mod 10) held-out direction-copies of vec id−3), so the
  *    two artifacts grade the same planted geometry.
  *  - encode: ids ≢ 3 (900k vectors) against params trained on the same
  *    900k — train is one d-key min/max fan-out, encode is map-only.
  *  - measured: encode+write throughput, on-disk compression (codes+norm
  *    parquet vs the float corpus parquet), the batched `sq_dot` kernel's
  *    row·probes/s with planted recall@1 over a probe sample, and
  *    recall@10 vs the exact cosine scan — the number PQ's artifact puts
  *    at 0.11 ADC-alone on this geometry; SQ8's per-dimension error is
  *    step-bounded, so near-exact retrieval here is the claim under test.
  *
  * SqVolumeSpec re-gates the same contract CI-sized; the committed
  * artifact (dev/sq_volume.json) records the million-row run.
  * Usage: runMain graft.SqVolume [nVecs] [workDir]
  */
object SqVolume {

  val Dim = PqVolume.Dim

  /** Batched SQ scan: score every (code row × probe) pair — probe p's
    * weights ride as a stride-sliced literal, its ⟨q, min⟩ offset via a
    * small map literal — arg-max per probe. The `sq_dot` kernel's
    * throughput shape. Returns (probe_id, top1). */
  def batchedTop1(codes: DataFrame, weights: Seq[Seq[Double]],
      offs: Seq[Double]): DataFrame = {
    val stride = weights.head.length
    val flat = typedLit(weights.flatten)
    val offMap = map(offs.zipWithIndex.flatMap { case (o, pid) =>
      Seq(lit(pid), lit(o)) }: _*)
    codes
      .select(col("vec_id"), col("codes"),
        explode(sequence(lit(0), lit(weights.size - 1))).as("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        (element_at(offMap, col("probe_id"))
          + org.apache.spark.sql.graftexpr.SqDotExpr
            .column(col("codes"),
              slice(flat, (col("probe_id") * stride + 1).cast("int"),
                lit(stride)))).as("score"))
      .groupBy("probe_id")
      .agg(max_by(col("vec_id"), struct(col("score"), -col("vec_id")))
        .as("top1"))
  }

  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val workDir = args.lift(1).getOrElse("/tmp/graft_sqvol")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sim.{Ann, Sq}

    PqVolume.corpus(spark, nVecs).write.mode("overwrite")
      .parquet(s"$workDir/floats")
    val corpus = spark.read.parquet(s"$workDir/floats")
    val base = corpus.filter(col("vec_id") % 10 =!= 3)
    val nIndexed = base.count()

    val t0 = System.nanoTime()
    val p = Sq.train(base)
    val trainSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    Sq.encode(base, p).write.mode("overwrite").parquet(s"$workDir/codes")
    val encodeSec = (System.nanoTime() - t1) / 1e9
    val codes = spark.read.parquet(s"$workDir/codes").localCheckpoint()

    def dirBytes(d: String): Long = {
      val f = new java.io.File(d)
      f.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.length()).sum
    }
    val floatBytes = dirBytes(s"$workDir/floats")
    val codeBytes = dirBytes(s"$workDir/codes")

    // planted recall@1, batched kernel throughput: 64 held-out copies
    // scored against every indexed row in ONE scan
    val probeIds = (0 until 64).map(i => 3L + 10L * (i * 97 + 11))
    val probes = corpus.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      .sortBy(_._1)
    val parts = probes.map(pr => Sq.queryParts(p, pr._2))
    val t2 = System.nanoTime()
    val top1 = batchedTop1(codes, parts.map(_._2), parts.map(_._1))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val kernelSec = (System.nanoTime() - t2) / 1e9
    val hits = probes.zipWithIndex.count { case ((pid, _), i) =>
      top1(i) == pid - 3 }
    val recall1 = hits.toDouble / probes.size

    // recall@10 vs the exact cosine scan — the quality headline of the
    // spectrum's middle tier (PQ's artifact: 0.11 ADC-alone here)
    val r10 = probes.take(8).map { case (_, v) =>
      val exact = Ann.bruteTopK(base, v, 10)
        .collect().map(_.getLong(0)).toSet
      val sq = Sq.topK(codes, p, v, 10)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(sq).size / 10.0
    }
    val recall10 = r10.sum / r10.size

    val ok = recall1 >= 0.99 && recall10 >= 0.9
    val line =
      f"""{"metric":"sq_dot_row_probes_per_sec",""" +
      f""""value":${nIndexed * probes.size / kernelSec}%.0f,""" +
      f""""unit":"rows*probes/s","n_indexed":$nIndexed,"dim":$Dim,""" +
      f""""train_sec":$trainSec%.1f,"encode_sec":$encodeSec%.1f,""" +
      f""""float_bytes":$floatBytes,"code_bytes":$codeBytes,""" +
      f""""compression":${floatBytes.toDouble / codeBytes}%.1f,""" +
      f""""probes":${probes.size},"recall_at1":$recall1%.4f,""" +
      f""""recall_at10":$recall10%.4f,"recall10_probes":${r10.size},""" +
      s""""all_ok":$ok}"""
    println(line)
    Artifacts.write("sq_volume.json", line)
    spark.stop()
    if (!ok) { System.err.println("[sqvol] CONTRACT MISS"); sys.exit(1) }
  }
}
