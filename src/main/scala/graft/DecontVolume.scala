package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.DecontIndex

/** Volume proof for the persisted benchmark-decontamination index
  * ([[graft.text.DecontIndex]], SURVEY B9.54) — the [[FpVolume]]
  * discipline: a benchmark index of 100k docs (2M distinct 5-grams, the
  * size of a real held-out eval battery) probed by a MILLION-document
  * corpus shard with PLANTED ground truth, where recall is not a
  * measurement but a set-membership theorem (an exactly copied 5-token
  * window IS its benchmark gram, and the probe join is exact), so the run
  * proves the implementation delivers the guarantee at scale and measures
  * what both probe shapes cost.
  *
  *  - benchmark docs: `nBench` docs of `BenchLen` tokens from the `w…`
  *    namespace, token (d, p) a pure hash — shared vocabulary across
  *    benchmarks (realistic collisions), every gram re-derivable in
  *    column space.
  *  - corpus shard: `nShard` docs of `ShardLen` tokens from the disjoint
  *    `n…` namespace — a noise gram contains an `n…` token and therefore
  *    can NEVER equal a benchmark gram, so clean docs are clean by
  *    construction, not by luck. Every 10th doc carries an exactly copied
  *    5-token benchmark window (doc id·17 mod nBench, start id mod 20)
  *    spliced between noise: ONE contaminated gram, its neighbors
  *    straddling noise.
  *  - contract: contaminated verdicts equal the planted pattern on every
  *    doc (flag ⇔ id % 10 == 0), each planted doc reports EXACTLY one
  *    hit, and the bloom-prefiltered probe returns the identical frame.
  *
  * Usage: runMain graft.DecontVolume [nBench] [nShard]
  */
object DecontVolume {

  val BenchLen = 24
  val ShardLen = 30
  /** Where the copied window sits inside a planted shard doc. */
  val SpliceAt = 3

  /** Benchmark token (d, p): shared 50k-word vocabulary. */
  def btok(d: Column, p: Column): Column =
    concat(lit("w"), pmod(xxhash64(d * 64 + p), lit(50000)).cast("string"))

  def benchDocs(spark: SparkSession, nBench: Long): DataFrame =
    spark.range(nBench).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until BenchLen).map(p =>
        btok(col("id"), lit(p))): _*).as("text"))

  /** Corpus shard with ids above the benchmark range: doc j plants a
    * benchmark window iff j % 10 == 0. */
  def shardDocs(spark: SparkSession, nBench: Long, nShard: Long)
      : DataFrame = {
    val planted = pmod(col("id"), lit(10)) === 0
    val cb = pmod(col("id") * 17, lit(nBench))
    val s0 = pmod(col("id"), lit(BenchLen - DecontIndex.GramN + 1))
    def ntok(p: Int): Column =
      concat(lit("n"), pmod(xxhash64(col("id") * 97 + p), lit(1000000))
        .cast("string"))
    val toks = (0 until ShardLen).map { p =>
      if (p >= SpliceAt && p < SpliceAt + DecontIndex.GramN)
        when(planted, btok(cb, s0 + (p - SpliceAt))).otherwise(ntok(p))
      else ntok(p)
    }
    spark.range(nShard).select((col("id") + nBench).as("doc_id"),
      col("id").as("j"), concat_ws(" ", toks: _*).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val nBench = args.headOption.map(_.toLong).getOrElse(100000L)
    val nShard = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_decontvol")
      .toString

    val t0 = System.nanoTime()
    DecontIndex.writeIndex(benchDocs(spark, nBench), dir)
    val buildSec = (System.nanoTime() - t0) / 1e9

    val shard = shardDocs(spark, nBench, nShard).localCheckpoint()

    def check(tag: String, probe: DataFrame): Double = {
      val t = System.nanoTime()
      val bad = probe.join(shard.select("doc_id", "j"), "doc_id")
        .agg(
          count(when(col("contaminated") =!=
            (pmod(col("j"), lit(10)) === 0), 1)).as("wrong"),
          count(when((pmod(col("j"), lit(10)) === 0)
            && col("n_hit") =!= 1, 1)).as("multi"),
          count(lit(1)).as("n")).head()
      val sec = (System.nanoTime() - t) / 1e9
      require(bad.getLong(2) == nShard, s"[$tag] row count ${bad.getLong(2)}")
      require(bad.getLong(0) == 0L,
        s"[$tag] PLANTED VERDICTS VIOLATED on ${bad.getLong(0)} docs")
      require(bad.getLong(1) == 0L,
        s"[$tag] planted docs must report exactly one hit")
      sec
    }

    val exactSec = check("exact", DecontIndex.probeShard(shard, dir))

    // bloom path returns the FLAGGED docs only; 8 MB filter over 2M
    // grams (fpp ~1e-4), so the survivor stream is essentially just the
    // planted hits — the corpus gram stream never exchanges
    val t2 = System.nanoTime()
    val fb = DecontIndex.probeShardBloom(shard, dir,
        estItems = 4000000L, numBits = 1L << 26)
      .join(shard.select("doc_id", "j"), "doc_id")
      .agg(count(lit(1)).as("n"),
        count(when(pmod(col("j"), lit(10)) =!= 0
          || col("n_hit") =!= 1, 1)).as("bad")).head()
    val bloomSec = (System.nanoTime() - t2) / 1e9
    require(fb.getLong(0) == nShard / 10 && fb.getLong(1) == 0L,
      s"[bloom] flagged ${fb.getLong(0)} docs (${fb.getLong(1)} wrong), " +
        s"expected ${nShard / 10} planted")

    val bytes = {
      def sizeOf(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(sizeOf).sum).getOrElse(0L)
      sizeOf(new java.io.File(
        graft.core.Versioned.resolveRoot(spark, dir)))
    }
    val nGrams = spark.read.parquet(
      graft.core.Versioned.resolveRoot(spark, dir) + "/grams").count()

    val line =
      f"""{"metric":"decont_probe_docs_per_sec","value":${nShard / bloomSec}%.0f,""" +
      f""""unit":"docs/s","n_bench":$nBench,"n_shard":$nShard,""" +
      f""""n_index_grams":$nGrams,"build_sec":$buildSec%.2f,""" +
      f""""probe_exact_sec":$exactSec%.2f,"probe_bloom_sec":$bloomSec%.2f,""" +
      f""""n_planted":${nShard / 10},"planted_recall":1.0,""" +
      f""""false_flags":0,"index_bytes":$bytes}"""
    println(line)
    Artifacts.write("decont_volume.json", line)
    spark.stop()
  }
}
