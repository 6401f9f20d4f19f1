package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Volume proof for the MinHash and SEMANTIC dedup modalities — the
  * [[SubstringVolume]] discipline applied to the other two pipelines, so
  * every dedup modality's 100 TB posture is a measured artifact, not a
  * plan shape:
  *
  *  - corpus: 1M documents / 1M embeddings, pure functions of the row id
  *    (3M-word hash vocabulary; 8-dim hash-derived vectors).
  *  - planted ground truth: doc ids ≡ 1 (mod 10) are EXACT copies of the
  *    preceding base doc (MinHash Jaccard 1 — banding catches them with
  *    certainty: identical band keys); ids ≡ 2 (mod 10) are NEAR copies
  *    with the last token replaced (17/19 shared 3-gram shingles ⇒
  *    Jaccard 0.894 ≥ the 0.8 threshold; per-pair banding recall
  *    1−(1−0.894⁴)⁸ ≈ 0.9997 — deterministic given the fixed hash
  *    family, so the measured recall is reproducible); vec ids ≡ 3
  *    (mod 10) are SCALED copies of the preceding base vector (cosine
  *    exactly 1, cluster-straddle impossible).
  *  - measured: MB/s (docs) / vecs/s (embeddings), exact-copy recall
  *    (must be 1), near-copy recall (reported, spec floor 0.99),
  *    semantic shard-probe recall (must be 1).
  *
  * DedupVolumeSpec asserts the recalls at a CI-sized corpus; the
  * committed artifact (dev/dedup_volume.json) records the million-row
  * run. Usage: runMain graft.DedupVolume [nDocs] [workDir]
  */
object DedupVolume {

  val BaseTokens = 20

  /** (doc_id, text): ids ≡ 1 (mod 10) duplicate doc id−1 exactly; ids ≡ 2
    * (mod 10) copy doc id−2 except the LAST token (their own). All other
    * docs are unique filler. */
  def docCorpus(spark: SparkSession, nDocs: Long): DataFrame = {
    val id = col("id")
    // content id: whose filler tokens this doc carries
    val cid = when(id % 10 === 1, id - 1)
      .when(id % 10 === 2, id - 2).otherwise(id)
    def tok(owner: org.apache.spark.sql.Column, i: Int) =
      concat(lit("w"), pmod(xxhash64(owner, lit(i)), lit(3000000L)))
    val base = concat_ws(" ",
      (1 until BaseTokens).map(i => tok(cid, i)) :+
        // near-copies keep their OWN last token; everyone else inherits
        when(id % 10 === 2, tok(id, BaseTokens))
          .otherwise(tok(cid, BaseTokens)): _*)
    spark.range(nDocs).select(id.as("doc_id"), base.as("text"))
  }

  /** (vec_id, embedding): ids ≡ 3 (mod 10) are 0.5-scaled copies of
    * vec id−3 (cosine exactly 1); others unique hash-derived vectors. */
  def embCorpus(spark: SparkSession, nVecs: Long): DataFrame = {
    val id = col("id")
    val eid = when(id % 10 === 3, id - 3).otherwise(id)
    val scale = when(id % 10 === 3, lit(0.5)).otherwise(lit(1.0))
    val v = array((1 to 8).map(i =>
      (pmod(xxhash64(eid, lit(i)), lit(1000L)).cast("double") / 500.0 - 1.0)
        * scale): _*)
    spark.range(nVecs).select(id.as("vec_id"), v.as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val workDir = args.lift(1).getOrElse("/tmp/graft_dedupvol")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- MinHash whole-corpus dedup over 1M materialized documents
    docCorpus(spark, nDocs).write.mode("overwrite")
      .parquet(s"$workDir/docs")
    val docs = spark.read.parquet(s"$workDir/docs")
    val mb = docs.select(sum(length(col("text")) + lit(1)))
      .head.getLong(0) / 1e6
    val t0 = System.nanoTime()
    val kept = graft.sim.Dedup.dedupCorpus(docs, "doc_id", "text")
      .select("doc_id").localCheckpoint()
    val nKept = kept.count()
    val mhSec = (System.nanoTime() - t0) / 1e9
    val exactPlanted = docs.filter(col("doc_id") % 10 === 1).count()
    val nearPlanted = docs.filter(col("doc_id") % 10 === 2).count()
    val exactKept = kept.filter(col("doc_id") % 10 === 1).count()
    val nearKept = kept.filter(col("doc_id") % 10 === 2).count()
    val otherDropped =
      (nDocs - exactPlanted - nearPlanted) - kept.filter(col("doc_id") % 10 =!= 1
        && col("doc_id") % 10 =!= 2).count()
    val nearRecall = 1.0 - nearKept.toDouble / nearPlanted

    // ---- semantic: index 90%, probe the 10% tail (planted copies of
    // indexed bases flag and drop; base vectors of the tail stay)
    val nVecs = nDocs
    val split = nVecs * 9 / 10
    embCorpus(spark, nVecs).write.mode("overwrite")
      .parquet(s"$workDir/emb")
    // unit-normalize the semantic leg: every cosine — and therefore every
    // exact-path verdict below — is scale-invariant, so this changes
    // nothing about the dedup semantics; it BOUNDS the PQ estimate's
    // relative error (the ADC error divides by |x|, so an unnormalized
    // small-norm vector can blow past any fixed margin — the round-12
    // A/B measured exactly that) and is the standard cosine-ANN
    // deployment shape (cf. PqSpec).
    val embV = col("embedding")
    val embN = sqrt(graft.sim.VectorMath.dot(embV, embV))
    val emb = spark.read.parquet(s"$workDir/emb")
      .select(col("vec_id"), transform(embV, x => x / embN).as("embedding"))
    val t1 = System.nanoTime()
    // pqM > 0 co-publishes residual PQ codes beside the float index, so
    // the probe can be measured BOTH ways below (exact-only vs the
    // round-12 ADC-prefilter + exact-verify path)
    graft.sim.SemDedup.writeIndex(
      emb.filter(col("vec_id") < split), s"$workDir/semidx",
      nCentroids = 64, iters = 2, pqM = 4)
    val semIndexSec = (System.nanoTime() - t1) / 1e9
    // shard: scaled copies of INDEXED base vectors, re-id'd above corpus
    val shard = emb.filter(col("vec_id") < split && col("vec_id") % 10 === 0)
      .select((col("vec_id") + 2 * nVecs).as("vec_id"),
        transform(col("embedding"), x => x * 0.25).as("embedding"))
    val shardN = shard.count()
    val t2 = System.nanoTime()
    val semKept = graft.sim.SemDedup
      .semDedupShard(spark, shard, s"$workDir/semidx", 0.999999)
      .count()
    val semSec = (System.nanoTime() - t2) / 1e9

    // the SAME probe through the PQ-accelerated path (round 12): the
    // candidate scan reads the M-byte codes partitions and only ADC
    // survivors touch the floats for the exact verify. Margin 0.0 —
    // every candidate row faces its OWN stored certificate (the `qerr`
    // column: its exact relative quantization error, a Cauchy–Schwarz
    // bound on the ADC cosine error for ANY probe), so agreement with
    // the exact-only path is provable, not hoped-for. The history is the
    // measurement trail: a guessed 0.05 margin MISSED planted cosine-1
    // copies; the global-max certificate (still recorded below) fixed
    // recall but measured 0.35 — filtering nothing and costing 13× the
    // exact path; the per-row form keeps the proof and the cut.
    val pqSafe = graft.sim.SemDedup.pqSafeMargin(spark, s"$workDir/semidx")
    val t3 = System.nanoTime()
    val semKeptPq = graft.sim.SemDedup
      .semDedupShard(spark, shard, s"$workDir/semidx", 0.999999,
        pqMargin = Some(0.0))
      .count()
    val semPqSec = (System.nanoTime() - t3) / 1e9

    val ok = exactKept == 0 && nearRecall >= 0.99 && otherDropped == 0 &&
      semKept == 0 && semKeptPq == semKept
    val line =
      f"""{"metric":"minhash_dedup_mb_per_sec","value":${mb / mhSec}%.1f,""" +
      f""""unit":"MB/s","mb":$mb%.1f,"sec":$mhSec%.1f,"docs":$nDocs,""" +
      f""""kept":$nKept,"exact_planted":$exactPlanted,""" +
      f""""exact_recall":${1.0 - exactKept.toDouble / exactPlanted}%.4f,""" +
      f""""near_planted":$nearPlanted,"near_recall":$nearRecall%.4f,""" +
      f""""false_drops":$otherDropped,""" +
      f""""sem_index_sec":$semIndexSec%.1f,"sem_shard":$shardN,""" +
      f""""sem_probe_sec":$semSec%.1f,""" +
      f""""sem_probe_vecs_per_sec":${shardN / semSec}%.0f,""" +
      f""""sem_pq_probe_sec":$semPqSec%.1f,""" +
      f""""sem_pq_probe_vecs_per_sec":${shardN / semPqSec}%.0f,""" +
      f""""sem_pq_margin":$pqSafe%.4f,""" +
      s""""sem_pq_agree":${semKeptPq == semKept},""" +
      s""""sem_recall_exact":${semKept == 0L},"all_ok":$ok}"""
    println(line)
    Artifacts.write("dedup_volume.json", line)
    spark.stop()
    if (!ok) { System.err.println(s"[dedupvol] RECALL MISS"); sys.exit(1) }
  }
}
