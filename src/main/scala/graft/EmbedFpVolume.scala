package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.{EmbedFp, FpIndex}

/** Volume proof for the hyperplane-LSH embedding fingerprints
  * ([[graft.sim.EmbedFp]], SURVEY B9.63) — three claims at a million
  * vectors:
  *
  *  1. ENCODE THROUGHPUT: the 63-dot-product kernel is map-only; measure
  *     vectors/s through the real fingerprint expression at 64 dims.
  *  2. STRUCTURAL RECALL (a theorem, the FpVolume discipline): a
  *     positively-SCALED copy has identical signs, so its fingerprint is
  *     bit-identical and the radius-3 probe must find it at hamming 0 —
  *     recall 1.0 guaranteed, a miss is an implementation bug.
  *  3. ANGLE CALIBRATION (the honest LSH contract): pairs planted at a
  *     KNOWN angle α (v' = cos α·v̂ + sin α·ŵ, ŵ ⊥ v̂ by Gram–Schmidt)
  *     must measure mean hamming ≈ 63·α/π (Charikar's estimator), and
  *     the radius-3 probe finds the fraction the binomial tail predicts
  *     — found fractions are REPORTED, not asserted, because for
  *     stochastic hamming recall is a distribution, not a theorem (the
  *     DedupVolume near-recall posture).
  *
  * Corpus vectors are pure hash functions of (id, dim) — mirrored
  * driver-side via catalyst's XXH64 exactly like [[FpVolume]] — so the
  * planted shard needs no corpus collect beyond its own targets.
  *
  * Usage: runMain graft.EmbedFpVolume [nVecs] [nShard]
  */
object EmbedFpVolume {

  val Dim = 64

  /** Hash-uniform double in [-1, 1) for (id, dim) — column form; the
    * driver mirror below computes the identical IEEE value. */
  private def dimCol(id: Column, d: Column): Column =
    (xxhash64(id * 64 + d).bitwiseAND(lit(0xFFFFFL)).cast("double")
      / lit(1048576.0)) * 2.0 - 1.0

  def corpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0L), lit(Dim - 1L)),
        d => dimCol(col("id"), d)).as("embedding"))

  /** Driver mirror of [[corpus]]'s vector for one id. */
  def vecOf(i: Long): Array[Double] = (0 until Dim).map { d =>
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashLong(i * 64 + d, 42L)
    (h & 0xFFFFFL).toDouble / 1048576.0 * 2.0 - 1.0
  }.toArray

  /** v' at angle alpha from v, rotated toward a hash-chosen orthogonal
    * direction (Gram–Schmidt against a second hash vector). */
  def atAngle(v: Array[Double], alpha: Double, seed: Long): Array[Double] = {
    def norm(a: Array[Double]) = math.sqrt(a.map(x => x * x).sum)
    val vn = norm(v)
    val vh = v.map(_ / vn)
    val u = vecOf(seed) // independent direction
    val proj = vh.zip(u).map { case (a, b) => a * b }.sum
    val w = u.zip(vh).map { case (b, a) => b - proj * a }
    val wn = norm(w)
    val wh = w.map(_ / wn)
    vh.zip(wh).map { case (a, b) => math.cos(alpha) * a + math.sin(alpha) * b }
  }

  /** Planted shard: per group of 4 — a scaled copy (hamming 0 theorem),
    * an α=0.05 pair, an α=0.15 pair, and a fresh vector. Returns
    * (rows, copies (sid, cid), angled (sid, cid, alpha)). */
  def shard(nCorpus: Long, nShard: Int): (Seq[(Long, Seq[Double])],
      Seq[(Long, Long)], Seq[(Long, Long, Double)]) = {
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Seq[Double])]()
    val copies = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val angled = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    var j = 0
    while (j < nShard) {
      val sid = nCorpus + j
      val cid = (j.toLong * 131L) % nCorpus
      j % 4 match {
        case 0 =>
          val scale = 1.0 + (j % 7) // positive scale: signs invariant
          rows += ((sid, vecOf(cid).map(_ * scale).toSeq))
          copies += ((sid, cid))
        case 1 =>
          rows += ((sid, atAngle(vecOf(cid), 0.05, 7000000000L + j).toSeq))
          angled += ((sid, cid, 0.05))
        case 2 =>
          rows += ((sid, atAngle(vecOf(cid), 0.15, 8000000000L + j).toSeq))
          angled += ((sid, cid, 0.15))
        case _ =>
          rows += ((sid, vecOf(3000000000L + j).toSeq))
      }
      j += 1
    }
    (rows.toSeq, copies.toSeq, angled.toSeq)
  }

  /** The whole run at a parameterized size — shared with the CI-sized
    * spec gate. Returns the artifact JSON line. */
  def run(spark: SparkSession, nVecs: Long, nShard: Int): String = {
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft_embedfpvol")
      .toString

    // 1. encode throughput through the REAL kernel
    val t0 = System.nanoTime()
    val fps = EmbedFp.fingerprints(corpus(spark, nVecs), Dim)
      .localCheckpoint()
    val nEnc = fps.count()
    val encSec = (System.nanoTime() - t0) / 1e9
    require(nEnc == nVecs)

    val t1 = System.nanoTime()
    FpIndex.writeIndex(fps, dir, maxHamming = 3)
    val buildSec = (System.nanoTime() - t1) / 1e9

    val (rows, copies, angled) = shard(nVecs, nShard)
    val shardFps = EmbedFp.fingerprints(
      rows.toDF("vec_id", "embedding"), Dim).localCheckpoint()

    val t2 = System.nanoTime()
    val got = FpIndex.probe(spark, shardFps, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val probeSec = (System.nanoTime() - t2) / 1e9

    // 2. structural recall — every scaled copy at hamming EXACTLY 0
    val copyMisses = copies.filterNot(p => got.get(p).contains(0))
    val copyRecall = 1.0 - copyMisses.size.toDouble / copies.size

    // 3. angle calibration — mean hamming vs 63·α/π, per class, measured
    // over the full planted hamming (driver recompute from the collected
    // shard+corpus fingerprints so pairs the radius-3 probe missed still
    // calibrate)
    val shardFpMap = shardFps.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val corpusTargets = angled.map(_._2).distinct
    val corpusFpMap = EmbedFp.fingerprints(
        corpusTargets.map(c => (c, vecOf(c).toSeq))
          .toDF("vec_id", "embedding"), Dim)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def stats(alpha: Double): (Double, Double, Double) = {
      val ps = angled.filter(_._3 == alpha)
      val hs = ps.map { case (s, c, _) =>
        java.lang.Long.bitCount(shardFpMap(s) ^ corpusFpMap(c)) }
      val mean = hs.sum.toDouble / hs.size
      val found = ps.count(p => got.contains((p._1, p._2)))
      (mean, 63.0 * alpha / math.Pi, found.toDouble / ps.size)
    }
    val (m05, p05, f05) = stats(0.05)
    val (m15, p15, f15) = stats(0.15)

    f"""{"metric":"embedfp_encode_vecs_per_sec","value":${nVecs / encSec}%.0f,""" +
    f""""unit":"vecs/s","n_vecs":$nVecs,"n_shard":$nShard,"dim":$Dim,""" +
    f""""encode_sec":$encSec%.2f,"build_sec":$buildSec%.2f,""" +
    f""""probe_sec":$probeSec%.2f,""" +
    f""""copy_recall":$copyRecall%.4f,"n_copies":${copies.size},""" +
    f""""a05_mean_hamming":$m05%.2f,"a05_predicted":$p05%.2f,""" +
    f""""a05_found_frac":$f05%.4f,""" +
    f""""a15_mean_hamming":$m15%.2f,"a15_predicted":$p15%.2f,""" +
    f""""a15_found_frac":$f15%.4f}"""
  }

  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nShard = args.drop(1).headOption.map(_.toInt).getOrElse(20000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val line = run(spark, nVecs, nShard)
    println(line)
    Artifacts.write("embedfp_volume.json", line)
    spark.stop()
    val copyRecall = "\"copy_recall\":([0-9.]+)".r
      .findFirstMatchIn(line).get.group(1).toDouble
    if (copyRecall < 1.0) {
      System.err.println("[embedfpvol] STRUCTURAL RECALL VIOLATED")
      sys.exit(1)
    }
  }
}
