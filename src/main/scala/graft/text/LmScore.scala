package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Versioned

/** Stupid-backoff bigram LM scoring (Brants et al. 2007) as a shared
  * body + a PERSISTED, APPEND-ABLE LM index — the quality-filter stage of
  * a training-data pipeline in the repo's incremental-index house shape
  * ([[graft.sim.IncrementalDedup]] / [[graft.ops.IncrementalDistinct]]):
  * train once over the release corpus, then score every future shard and
  * stream against the frozen counts, folding new shards in by appending
  * count rows.
  *
  * The load-bearing algebra: n-gram counts are MERGEABLE (plain sums), so
  * a shard append is just more rows in the count tables and read-time
  * aggregation reproduces the union-corpus LM EXACTLY — including the
  * "known transition" threshold, which is applied at READ time so a
  * bigram seen once in shard A and once in shard B correctly becomes
  * known after the append (thresholding at write time would lose it;
  * LmIndexSpec gates exactly this case). The tables are
  * vocabulary-bounded — kB-to-GB against a 100 TB corpus — so read-time
  * re-aggregation is a rounding error next to any scan that uses them,
  * and compaction (re-aggregate → complete new version → atomic pointer
  * flip, [[Versioned]]) bounds the O(shards) file growth.
  *
  * One scoring expression serves the declared `text_lm_score` query
  * (self-trained LM), the index probe, and the streaming twin
  * ([[graft.stream.Streaming.streamLmScore]]) — the cannot-drift
  * discipline: all integer per-doc sums, one fixed IEEE tree at the end
  * (see the TextOps comment for the oracle-exactness argument).
  */
object LmScore {

  /** A bigram must occur this often (across ALL folded shards) to count
    * as a known transition; rarer ones take the 0.4 unigram backoff. */
  val MinCount = 2L

  /** Backoff weight — the Brants et al. constant. */
  val Alpha = 0.4

  private def tokens = split(col("text"), " ")

  /** Frozen LM view: `big` (prev, cur, cb) already thresholded, `uni`
    * (w, cu), `n` a 1-row (n_tokens). */
  final case class Lm(big: DataFrame, uni: DataFrame, n: DataFrame)

  /** (doc_id, prev, cur) — the lambda-free text_ngrams slice+zip fan-out. */
  def transitions(docs: DataFrame): DataFrame = {
    val toks = col("toks")
    docs.select(col("doc_id"), tokens.as("toks"))
      .select(col("doc_id"),
        slice(toks, lit(1), size(toks) - 1).as("a"),
        slice(toks, lit(2), size(toks) - 1).as("b"))
      .select(col("doc_id"), explode(arrays_zip(col("a"), col("b"))).as("p"))
      .select(col("doc_id"), col("p.a").as("prev"), col("p.b").as("cur"))
  }

  /** Raw (unthresholded) count tables of one shard: bigrams (prev, cur,
    * n) and unigrams (w, n) — the mergeable rows the index stores. */
  def shardCounts(docs: DataFrame): (DataFrame, DataFrame) = {
    val big = transitions(docs)
      .groupBy("prev", "cur").agg(count(lit(1)).as("n"))
    val uni = docs.select(explode(tokens).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    (big, uni)
  }

  /** In-memory LM over a corpus — what the declared query uses (the LM
    * is the corpus itself).
    *
    * `uniMinCount` is the standard VOCABULARY cut (CCNet-style): words
    * rarer than it drop from the unigram table and score as OOV (zero
    * backoff mass). Default 1 — no cut, the oracled query's form. On
    * noisy corpora the cut is what keeps the "vocabulary-bounded LM
    * tables" claim true: hash-junk tokens are near-unique, so without it
    * the unigram table grows with the CORPUS, not the language
    * ([[graft.LmVolume]] plants exactly that and runs with the cut; N
    * then measures the modeled vocabulary's mass). */
  def lmFrom(docs: DataFrame, minCount: Long = MinCount,
      uniMinCount: Long = 1L): Lm = {
    val (big, uni) = shardCounts(docs)
    fromCounts(big, uni, minCount, uniMinCount)
  }

  private def fromCounts(bigRaw: DataFrame, uniRaw: DataFrame,
      minCount: Long, uniMinCount: Long): Lm = {
    val big = bigRaw.groupBy("prev", "cur")
      .agg(sum("n").cast("long").as("cb"))
      .filter(col("cb") >= minCount)
    val uni = uniRaw.groupBy("w").agg(sum("n").cast("long").as("cu"))
      .filter(col("cu") >= uniMinCount)
    val n = uni.agg(sum("cu").cast("long").as("n_tokens"))
    Lm(big, uni, n)
  }

  /** Score documents against a frozen LM. Output: (doc_id, n_trans,
    * n_seen, hit_num, ctx_den, n_unseen, bo_num, lm_score), one row per
    * document with ≥ 1 transition. The ONE scoring expression — oracled
    * through `text_lm_score`, replayed by the index probe and the
    * streaming twin. Scale shape: LM tables broadcast onto the
    * corpus-sized transition stream; one doc_id rollup; N rides a 1-row
    * broadcast. */
  def score(docs: DataFrame, lm: Lm): DataFrame =
    transitions(docs)
      .join(broadcast(lm.big), Seq("prev", "cur"), "left")
      // LEFT on the unigrams too: an index probe may carry words the
      // frozen LM never saw — those transitions stay in n_trans/n_unseen
      // with zero backoff mass (cu_cur null → skipped by SUM) instead of
      // silently vanishing. On the self-trained declared query no OOV
      // exists, so this is join-type-invariant there (oracle uses inner).
      .join(broadcast(lm.uni.select(col("w").as("prev"),
        col("cu").as("cu_prev"))), Seq("prev"), "left")
      .join(broadcast(lm.uni.select(col("w").as("cur"),
        col("cu").as("cu_cur"))), Seq("cur"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_trans"),
        count(col("cb")).as("n_seen"),
        coalesce(sum("cb"), lit(0L)).cast("long").as("hit_num"),
        coalesce(sum(when(col("cb").isNotNull, col("cu_prev"))), lit(0L))
          .cast("long").as("ctx_den"),
        (count(lit(1)) - count(col("cb"))).as("n_unseen"),
        coalesce(sum(when(col("cb").isNull, col("cu_cur"))), lit(0L))
          .cast("long").as("bo_num"))
      .crossJoin(broadcast(lm.n))
      .select(col("doc_id"), col("n_trans"), col("n_seen"),
        col("hit_num"), col("ctx_den"), col("n_unseen"), col("bo_num"),
        (when(col("n_seen") === 0, lit(0.0)).otherwise(
           col("hit_num").cast("double") / col("ctx_den").cast("double"))
         + lit(Alpha) * when(col("n_unseen") === 0, lit(0.0)).otherwise(
             col("bo_num").cast("double")
               / (col("n_unseen").cast("double")
                  * col("n_tokens").cast("double"))))
          .as("lm_score"))

  // ---- persisted index ------------------------------------------------

  /** Build and publish a fresh LM index at `dir` (v1 unless versions
    * already exist): `v<N>/bigrams` + `v<N>/unigrams` raw count rows,
    * then the atomic pointer flip. A scoring word (unigram) table and the
    * transition table are written UNthresholded — the known-transition
    * cut belongs to [[readLm]] so future appends can promote rare
    * bigrams. */
  def writeLm(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val v = Versioned.nextVersion(spark, dir)
    val root = s"$dir/$v"
    val (big, uni) = shardCounts(docs)
    big.write.mode("errorifexists").parquet(s"$root/bigrams")
    uni.write.mode("errorifexists").parquet(s"$root/unigrams")
    Versioned.publish(spark, dir, v)
  }

  /** Fold a shard into the published version: append its count rows.
    * Mutates the CURRENT version under the single-writer contract; a
    * concurrent [[readLm]] aggregation may see a partially appended
    * shard only within one read's file listing — restartable ingest
    * should re-run the shard on failure (counts are NOT idempotent under
    * double-append; the release loop's monotonic-shard guard owns that,
    * as with every count-bearing index in the repo).
    *
    * `negate = true` appends the counts NEGATED — the exact-subtraction
    * retraction path (the substring index's negative-gram-rows trick):
    * readers sum, so a retracted doc's n-gram mass vanishes from every
    * future score, and [[compactLm]] later drops the zeroed rows
    * physically. */
  def appendLm(docs: DataFrame, dir: String, negate: Boolean = false): Unit = {
    val spark = docs.sparkSession
    val root = Versioned.resolveRoot(spark, dir)
    val (big0, uni0) = shardCounts(docs)
    val (big, uni) =
      if (!negate) (big0, uni0)
      else (big0.withColumn("n", -col("n")), uni0.withColumn("n", -col("n")))
    big.write.mode("append").parquet(s"$root/bigrams")
    uni.write.mode("append").parquet(s"$root/unigrams")
  }

  /** The frozen LM at `dir`: read-time aggregation of all folded shards
    * (vocabulary-bounded) + the known-transition threshold. */
  def readLm(spark: SparkSession, dir: String,
      minCount: Long = MinCount, uniMinCount: Long = 1L): Lm = {
    val root = Versioned.resolveRoot(spark, dir)
    fromCounts(spark.read.parquet(s"$root/bigrams"),
      spark.read.parquet(s"$root/unigrams"), minCount, uniMinCount)
  }

  /** Compact O(shards) count rows back to one row per n-gram: aggregate,
    * write a COMPLETE new version, flip the pointer ([[Versioned]] — a
    * crash leaves the old version fully readable). Scores are identical
    * before and after because readers aggregate anyway. */
  def compactLm(spark: SparkSession, dir: String): Unit = {
    val old = Versioned.resolveRoot(spark, dir)
    val v = Versioned.nextVersion(spark, dir)
    val root = s"$dir/$v"
    // fully retracted n-grams sum to 0 and drop — identical to readers,
    // which threshold at ≥ 1 anyway (the substring nd ≠ 0 discipline)
    spark.read.parquet(s"$old/bigrams")
      .groupBy("prev", "cur").agg(sum("n").cast("long").as("n"))
      .filter(col("n") =!= 0L)
      .coalesce(1)
      .write.mode("errorifexists").parquet(s"$root/bigrams")
    spark.read.parquet(s"$old/unigrams")
      .groupBy("w").agg(sum("n").cast("long").as("n"))
      .filter(col("n") =!= 0L)
      .coalesce(1)
      .write.mode("errorifexists").parquet(s"$root/unigrams")
    Versioned.publish(spark, dir, v)
  }
}
