package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.Curation

/** Volume proof for the QUALITY-GATED RELEASE LOOP (SURVEY B9.36 + B9.42)
  * — the capstone: not one stage at volume (each already has its own
  * artifact) but the whole ingest loop, with EVERY planted drop accounted
  * for by name in the stage it must die in.
  *
  * Corpus: deterministic RANDOM WALKS over a fixed successor graph —
  * [[VocabSize]] words, [[Branch]] successors each, path bits from the
  * doc id. The construction separates the stages' sensitivities by
  * design: bigrams are massively repeated (every edge ≈ n·len/(V·B)
  * occurrences — the release LM knows the language), while 8-token
  * shingles live in a ~V·B⁷ ≈ 2×10⁹ path space, so incidental
  * cross-doc shingle duplication is negligible and the substring stage
  * only sees REAL copies. Per ingest shard the plants are:
  *
  *   - junk: globally-unique tokens → all-OOV against the release LM →
  *     dies at stage 0 (quality), score exactly 0.0
  *   - exact copies of release docs → stage 1 (digest)
  *   - 16-token PREFIXES of release docs → every one of their shingles
  *     is corpus-attested, dup_frac = 1.0 → stage 2 (substring) at
  *     maxDupFrac 0.99 (set high so ONLY near-total copies die here —
  *     the near-dups below sit at ≈ 0.96 and must reach stage 3)
  *   - release docs + ONE appended unique token → shingle Jaccard ≈ 0.95
  *     → stage 3 (MinHash). This stage's accounting is a measured
  *     RECALL GATE (≥ 99%), not an exact count: banded LSH recall is
  *     probabilistic in the signature hashing (deterministic per pair,
  *     but a walk with internally-repeated grams can sit just under a
  *     band's collision threshold — the 1M-doc DedupVolume measures the
  *     same modality at 0.9951), while quality/exact/substring are
  *     deterministic verdicts and stay EXACT
  *   - fresh walks → survive everything, fold into the release
  *
  * The artifact records build/ingest/compaction wall times and the
  * per-shard ledgers; the contract is the EXACT per-stage drop counts
  * across [[NShards]] shards, plus a post-compaction shard proving the
  * loop keeps running against the rewritten indexes.
  *
  * Usage: runMain graft.CurationVolume [releaseDocs] [shardDocs] [plants]
  */
object CurationVolume {

  val VocabSize = 1024
  val Branch = 8
  val DocLen = 24
  val PrefixLen = 16
  val NShards = 3
  val MaxDupFrac = 0.99
  val LmThr = 0.001

  /** One walk step: the successor graph succ(w, b) = hash(w, b) mod V is
    * FIXED (independent of the doc), only the branch choice b is
    * doc-specific. */
  private def step(w: Column, b: Column): Column =
    pmod(xxhash64(w, b), lit(VocabSize.toLong))

  /** The deterministic walk text of a doc id — reproducible anywhere, so
    * plants can reference release docs by id alone. */
  def walkText(id: Column): Column = {
    var w: Column = pmod(xxhash64(id, lit("start")), lit(VocabSize.toLong))
    var parts = List(concat(lit("w"), w))
    for (j <- 1 until DocLen) {
      val b = pmod(xxhash64(id, lit(j)), lit(Branch.toLong))
      w = step(w, b)
      parts = concat(lit("w"), w) :: parts
    }
    concat_ws(" ", parts.reverse: _*)
  }

  def releaseCorpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"), lit("rel").as("source"),
      walkText(col("id")).as("text"))

  /** One ingest shard: ids start at `base` (monotonic across shards);
    * `plants` docs per category reference release ids in DISJOINT ranges
    * (a copy and a near-dup of the same release doc would also pair with
    * each other and blur the accounting). */
  def shard(spark: SparkSession, base: Long, shardDocs: Long,
      plants: Int, shardIdx: Int): DataFrame = {
    val p = plants.toLong
    val rid = (col("id") - base) % 10000L + lit(shardIdx * 3L * p)
    val cat = col("id") - base // 0..shardDocs-1
    spark.range(base, base + shardDocs).select(
      col("id").as("doc_id"), lit("shard").as("source"),
      when(cat < p, // junk: unique tokens
          concat_ws(" ", (0 until 12).map(k =>
            concat(lit("j"), col("id") * 12 + k)): _*))
        .when(cat < 2 * p, walkText(rid)) // exact copy
        .when(cat < 3 * p, // prefix: first 16 tokens
          array_join(slice(split(walkText(rid + p), " "), 1, PrefixLen),
            " "))
        .when(cat < 4 * p, // near-dup: one appended unique token
          concat(walkText(rid + 2 * p), lit(" uq"), col("id")))
        .otherwise(walkText(col("id") + 5000000L)) // fresh walk
        .as("text"))
  }

  /** Ledger as (stage -> (n_in, n_dropped, n_out)). */
  def ledgerMap(ledger: DataFrame): Map[String, (Long, Long, Long)] =
    ledger.collect().map(r => r.getString(1) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  /** Run the loop; returns (buildSec, perShard ledgers+secs, compactSec,
    * postCompactLedger, allOk). */
  def run(spark: SparkSession, dir: String, releaseDocs: Long,
      shardDocs: Long, plants: Int):
      (Double, Seq[(Map[String, (Long, Long, Long)], Double)], Double,
        Map[String, (Long, Long, Long)], Boolean) = {
    val release = releaseCorpus(spark, releaseDocs).localCheckpoint()
    val t0 = System.nanoTime()
    Curation.writeIndexes(release, None, dir, lmQuality = true)
    val buildSec = (System.nanoTime() - t0) / 1e9

    def ingest(i: Int): (Map[String, (Long, Long, Long)], Double) = {
      val s = shard(spark, 1000000L * (i + 1), shardDocs, plants, i)
        .localCheckpoint()
      val t = System.nanoTime()
      val r = Curation.ingestShard(s, None, dir,
        maxDupFrac = MaxDupFrac, lmMinScore = Some(LmThr))
      val lm = ledgerMap(r.ledger)
      (lm, (System.nanoTime() - t) / 1e9)
    }
    val shards = (0 until NShards).map(ingest)
    val t1 = System.nanoTime()
    Curation.compactRelease(spark, dir)
    val compactSec = (System.nanoTime() - t1) / 1e9
    val post = ingest(NShards)._1

    val p = plants.toLong
    // quality/exact/substring are deterministic verdicts — EXACT counts;
    // near_dup is banded LSH — a measured ≥99% recall gate, with every
    // miss visible as a surviving fresh-count surplus (no false drops:
    // n_out must be exactly the fresh docs plus the misses)
    def okShard(lm: Map[String, (Long, Long, Long)]): Boolean = {
      val near = lm("near_dup")._2
      lm("quality")._2 == p && lm("exact")._2 == p &&
        lm("substring")._2 == p &&
        near >= (p * 99 + 99) / 100 && near <= p &&
        lm("near_dup")._3 == shardDocs - 3 * p - near
    }
    val ok = shards.forall(s => okShard(s._1)) && okShard(post)
    (buildSec, shards, compactSec, post, ok)
  }

  def main(args: Array[String]): Unit = {
    val releaseDocs = args.headOption.map(_.toLong).getOrElse(100000L)
    val shardDocs = args.lift(1).map(_.toLong).getOrElse(25000L)
    val plants = args.lift(2).map(_.toInt).getOrElse(600)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_curvol").toString
    val (buildSec, shards, compactSec, post, ok) =
      run(spark, dir, releaseDocs, shardDocs, plants)
    val meanIngest = shards.map(_._2).sum / shards.size
    val nearFound = (shards.map(_._1) :+ post)
      .map(_("near_dup")._2).sum
    val nearPlanted = plants.toLong * (shards.size + 1)
    val line =
      f"""{"metric":"curation_ingest_docs_per_sec","value":${
        shardDocs / meanIngest}%.0f,"unit":"docs/s",""" +
      f""""release_docs":$releaseDocs,"shard_docs":$shardDocs,""" +
      f""""plants_per_stage":$plants,"n_shards":${shards.size},""" +
      f""""build_sec":$buildSec%.1f,""" +
      f""""ingest_sec":[${shards.map(s => f"${s._2}%.1f").mkString(",")}],""" +
      f""""compact_sec":$compactSec%.1f,""" +
      f""""near_recall":${nearFound.toDouble / nearPlanted}%.4f,""" +
      f""""post_compact_kept":${post("near_dup")._3},""" +
      s""""all_drops_accounted":$ok}"""
    println(line)
    Artifacts.write("curation_volume.json", line)
    spark.stop()
    if (!ok) {
      shards.zipWithIndex.foreach { case ((lm, _), i) =>
        System.err.println(s"[curvol] shard $i ledger: $lm") }
      System.err.println(s"[curvol] post-compact ledger: $post")
      System.err.println("[curvol] CONTRACT MISS"); sys.exit(1)
    }
  }
}
