package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.FpIndex

/** Volume proof for the persisted fingerprint near-dup index
  * ([[graft.sim.FpIndex]], SURVEY B9.48) — the [[DedupVolume]] discipline
  * for the fingerprint modality: a million-row index probed by a 100k
  * shard with PLANTED ground truth, where recall is not a measurement but
  * a THEOREM (the pigeonhole blocking guarantees every ≤ maxHamming pair
  * surfaces), so the volume run proves the implementation delivers the
  * guarantee at scale and measures what it costs.
  *
  *  - corpus: `nCorpus` 63-bit fingerprints, pure hash functions of the
  *    row id (`xxhash64 & Long.MaxValue`) — i.i.d. uniform bits, the
  *    geometry where random pairs sit at hamming ≈ 31.5 and the banded
  *    join's candidate set is honestly adversarial (nothing clusters).
  *  - radius: maxHamming = 3 — the PUBLISHED web-scale simhash-dedup
  *    configuration (Manku et al., WWW 2007: 64-bit fingerprints, k = 3,
  *    4 tables): 4 blocks of ≥ 15 bits keep expected candidates at ~30
  *    per probe row per million indexed rows, where the radius-8 default
  *    (9 blocks of 7 bits) would collapse to thousands (see the
  *    [[FpIndex]] sizing note).
  *  - shard: `nShard` rows above the corpus id range; EVERY OTHER row is
  *    a planted near-dup of a known corpus row with EXACTLY (j mod 4)
  *    bits flipped (distinct positions by construction), the rest are
  *    fresh uniform fingerprints.
  *  - contract: every planted pair is found at exactly its planted
  *    hamming (recall 1.0 — guaranteed, so a miss is an implementation
  *    bug, never sketch luck). Extra pairs are counted, not forbidden:
  *    with ~10¹¹ random cross pairs at P(h ≤ 8) ≈ 6·10⁻¹¹ a handful of
  *    REAL random near-dups is expected — the verify step is exact, so
  *    they are true positives, reported honestly in the artifact.
  *
  * Usage: runMain graft.FpVolume [nCorpus] [nShard]
  */
object FpVolume {

  /** 63-bit uniform fingerprint of an id (column form). */
  def fpCol(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    xxhash64(id).bitwiseAND(lit(Long.MaxValue))

  def corpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id"), fpCol(col("id")).as("fp"))

  /** Driver-side shard with planted near-dups: row j (id nCorpus+j) is,
    * for even j, corpus row ((j/2)·17 mod nCorpus)'s fingerprint with
    * (j mod 9) distinct bits flipped; odd j rows are fresh. Returns
    * (rows, planted (shardId, corpusId, hamming) triples). */
  def shard(nCorpus: Long, nShard: Int)
      : (Seq[(Long, Long)], Seq[(Long, Long, Int)]) = {
    def fpOf(i: Long): Long = {
      // xxhash64 literal twin is not available driver-side; use the same
      // value the column computes by evaluating through Spark once would
      // be circular — instead the corpus generator is reused via a local
      // session-free mirror: Spark's xxhash64 seed-42 implementation is
      // in XXH64; call it directly (public catalyst util).
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(i, 42L)
      h & Long.MaxValue
    }
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val planted = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    var j = 0
    while (j < nShard) {
      val sid = nCorpus + j
      if (j % 2 == 0) {
        val cid = (j.toLong / 2 * 17L) % nCorpus
        val k = j % 4
        val fp = (0 until k).foldLeft(fpOf(cid))((f, t) =>
          f ^ (1L << ((j * 11 + 5 * t) % 63)))
        // flipped positions are distinct, but a flip may collide with the
        // base bit pattern only by CHANGING it — hamming is exactly k
        rows += ((sid, fp)); planted += ((sid, cid, k))
      } else rows += ((sid, fpOf(1000000000L + j)))
      j += 1
    }
    (rows.toSeq, planted.toSeq)
  }

  def main(args: Array[String]): Unit = {
    val nCorpus = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nShard = args.drop(1).headOption.map(_.toInt).getOrElse(100000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft_fpvol")
      .toString

    val t0 = System.nanoTime()
    FpIndex.writeIndex(corpus(spark, nCorpus), dir, maxHamming = 3)
    val buildSec = (System.nanoTime() - t0) / 1e9

    val (rows, planted) = shard(nCorpus, nShard)
    val shardDf = rows.toDF("id", "fp").localCheckpoint()

    val t1 = System.nanoTime()
    val got = FpIndex.probe(spark, shardDf, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val probeSec = (System.nanoTime() - t1) / 1e9

    val plantedSet = planted.toSet
    val missed = plantedSet.diff(got)
    val extras = got.size - plantedSet.intersect(got).size
    val recall = 1.0 - missed.size.toDouble / plantedSet.size

    val bytes = {
      def sizeOf(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(sizeOf).sum).getOrElse(0L)
      sizeOf(new java.io.File(
        graft.core.Versioned.resolveRoot(spark, dir)))
    }

    val line =
      f"""{"metric":"fp_probe_rows_per_sec","value":${nShard / probeSec}%.0f,""" +
      f""""unit":"rows/s","n_corpus":$nCorpus,"n_shard":$nShard,""" +
      f""""build_sec":$buildSec%.2f,"probe_sec":$probeSec%.2f,""" +
      f""""n_planted":${plantedSet.size},"planted_recall":$recall%.4f,""" +
      f""""n_found":${got.size},"extra_real_pairs":$extras,""" +
      f""""index_bytes":$bytes,"bytes_per_fp":${bytes.toDouble / nCorpus}%.1f}"""
    println(line)
    Artifacts.write("fp_volume.json", line)
    spark.stop()
    if (missed.nonEmpty) {
      System.err.println(s"[fpvol] GUARANTEED RECALL VIOLATED: " +
        s"${missed.size} planted pairs missed, e.g. ${missed.take(3)}")
      sys.exit(1)
    }
  }
}
