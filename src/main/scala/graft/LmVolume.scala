package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.LmScore

/** Volume proof for the LM quality filter ([[graft.text.LmScore]],
  * SURVEY B9.42) — the [[DedupVolume]] discipline: measured throughput at
  * 1M documents with PLANTED ground truth the construction makes provable.
  *
  *  - corpus: `nDocs` rows. 9 of 10 are COHERENT: [[DocLen]] tokens
  *    walking a fixed [[VocabSize]]-word ring from a seed = id mod ring —
  *    every occurrence of word w is followed by the SAME next word, so
  *    every coherent transition is massively repeated (known, cb ≈ cu)
  *    and a coherent doc's known-mass ratio sits near 1. Every 10th doc
  *    is NOISE: GLOBALLY UNIQUE tokens (position-indexed, no hashing —
  *    no collision can ever mint a "known" noise bigram), so under the
  *    vocabulary cut (uniMinCount = 2, the CCNet-style production knob)
  *    every noise token is OOV and a noise doc scores EXACTLY 0.0.
  *  - contract: max(noise score) = 0 < min(coherent score) — total
  *    separation by construction, checked over all nDocs — plus the
  *    incremental claim at volume: an LM built on half the corpus and
  *    APPENDED with the other half scores a probe sample identically to
  *    the LM built on everything (counts are mergeable). The planted
  *    noise is also WHY the cut exists: without it the unigram table
  *    grows with the corpus (~19 unique tokens per noise doc), not the
  *    language.
  *  - the committed artifact (dev/lm_volume.json) records docs/s for LM
  *    build and scoring; LmVolumeSpec asserts the same contract CI-sized.
  *
  * Usage: runMain graft.LmVolume [nDocs]
  */
object LmVolume {

  val VocabSize = 40
  val DocLen = 20

  /** Deterministic corpus: (doc_id, text, planted_noise). Noise tokens
    * are position-indexed (`n<doc·len+j>`) — globally unique by
    * construction, the collision-free worst case for the vocabulary. */
  def corpus(spark: SparkSession, nDocs: Long): DataFrame = {
    val noise = col("id") % 10 === 9
    val toks: Seq[org.apache.spark.sql.Column] = (0 until DocLen).map { j =>
      when(noise, concat(lit("n"), col("id") * DocLen + j))
        .otherwise(concat(lit("w"),
          (col("id") + j).cast("long") % VocabSize))
    }
    spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", toks: _*).as("text"), noise.as("planted_noise"))
  }

  /** Score the corpus against its own LM; return (buildSec, scoreSec,
    * maxNoise, minCoherent, nNoise, nCoherent, separated). */
  def measure(docs: DataFrame): (Double, Double, Double, Double,
      Long, Long, Boolean) = {
    val t0 = System.nanoTime()
    // materialize the LM tables once — the "train" cost (vocab-bounded
    // output of one corpus pass, WITH the vocabulary cut)
    val lm0 = LmScore.lmFrom(docs, uniMinCount = 2L)
    val lm = LmScore.Lm(lm0.big.localCheckpoint(),
      lm0.uni.localCheckpoint(), lm0.n.localCheckpoint())
    val buildSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val stats = LmScore.score(docs, lm)
      .join(docs.select("doc_id", "planted_noise"), "doc_id")
      .groupBy("planted_noise")
      .agg(min("lm_score").as("mn"), max("lm_score").as("mx"),
        count(lit(1)).as("cnt"))
      .collect().map(r => r.getBoolean(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    val scoreSec = (System.nanoTime() - t1) / 1e9
    val (noiseMin, noiseMax, nNoise) = stats(true)
    val (cohMin, cohMax, nCoh) = stats(false)
    val _ = (noiseMin, cohMax)
    (buildSec, scoreSec, noiseMax, cohMin, nNoise, nCoh, noiseMax < cohMin)
  }

  /** The incremental claim at volume: LM(firstHalf) + append(secondHalf)
    * scores a probe sample identically to LM(all). */
  def appendEqualsRebuild(docs: DataFrame, dir: String): Boolean = {
    val spark = docs.sparkSession
    val half = docs.filter(col("doc_id") % 2 === 0)
    val rest = docs.filter(col("doc_id") % 2 =!= 0)
    LmScore.writeLm(half.select("doc_id", "text"), dir)
    LmScore.appendLm(rest.select("doc_id", "text"), dir)
    val probe = docs.filter(col("doc_id") % 997 === 0)
      .select("doc_id", "text").localCheckpoint()
    val viaIndex = LmScore.score(probe,
      LmScore.readLm(spark, dir, uniMinCount = 2L))
    val rebuilt = LmScore.score(probe,
      LmScore.lmFrom(docs.select("doc_id", "text"), uniMinCount = 2L))
    viaIndex.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(viaIndex).isEmpty
  }

  /** The trigram scorer at volume: same separation contract (noise is
    * all-OOV → exactly 0 at every backoff level under the cut, coherent
    * ring transitions are trigram-attested), measured docs/s. */
  def measure3(docs: DataFrame): (Double, Double, Double, Boolean) = {
    val lm0 = LmScore.lm3From(docs, uniMinCount = 2L)
    val lm = LmScore.Lm3(lm0.tri.localCheckpoint(),
      LmScore.Lm(lm0.bi.big.localCheckpoint(),
        lm0.bi.uni.localCheckpoint(), lm0.bi.n.localCheckpoint()))
    val t1 = System.nanoTime()
    val stats = LmScore.score3(docs, lm)
      .join(docs.select("doc_id", "planted_noise"), "doc_id")
      .groupBy("planted_noise")
      .agg(min("lm3_score").as("mn"), max("lm3_score").as("mx"))
      .collect().map(r => r.getBoolean(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    val sec = (System.nanoTime() - t1) / 1e9
    val (_, noiseMax) = stats(true)
    val (cohMin, _) = stats(false)
    (sec, noiseMax, cohMin, noiseMax < cohMin)
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = corpus(spark, nDocs).localCheckpoint() // exclude gen cost
    val (buildSec, scoreSec, noiseMax, cohMin, nNoise, nCoh, sep) =
      measure(docs)
    val (s3Sec, n3Max, c3Min, sep3) = measure3(docs)
    val dir = java.nio.file.Files.createTempDirectory("graft_lmvol").toString
    val incrOk = appendEqualsRebuild(docs, dir)
    val line =
      f"""{"metric":"lm_score_docs_per_sec","value":${nDocs / scoreSec}%.0f,""" +
      f""""unit":"docs/s","n_docs":$nDocs,"build_sec":$buildSec%.2f,""" +
      f""""score_sec":$scoreSec%.2f,"noise_max":$noiseMax%.6f,""" +
      f""""coherent_min":$cohMin%.6f,"n_noise":$nNoise,""" +
      f""""n_coherent":$nCoh,"separated":$sep,""" +
      f""""tri_score_sec":$s3Sec%.2f,""" +
      f""""tri_docs_per_sec":${nDocs / s3Sec}%.0f,""" +
      f""""tri_noise_max":$n3Max%.6f,"tri_coherent_min":$c3Min%.6f,""" +
      s""""tri_separated":$sep3,""" +
      s""""append_equals_rebuild":$incrOk}"""
    println(line)
    Artifacts.write("lm_volume.json", line)
    spark.stop()
    if (!sep || !sep3 || !incrOk) {
      System.err.println("[lmvol] CONTRACT MISS"); sys.exit(1)
    }
  }
}
