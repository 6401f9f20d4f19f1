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

  /** The bigram-count half of [[lmFrom]] from an already-materialized
    * transition table — lets a caller that needs SEVERAL LMs or scoring
    * passes over the same corpus (`sample_dsir`: raw + target) pay the
    * corpus-sized fan-out ONCE behind a localCheckpoint. */
  def lmFromTransitions(trans: DataFrame, docs: DataFrame,
      minCount: Long = MinCount, uniMinCount: Long = 1L): Lm = {
    val big = trans.groupBy("prev", "cur").agg(count(lit(1)).as("n"))
    val uni = docs.select(explode(tokens).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    fromCounts(big, uni, minCount, uniMinCount)
  }

  /** Score documents against a frozen LM. Output: (doc_id, n_trans,
    * n_seen, hit_num, ctx_den, n_unseen, bo_num, lm_score), one row per
    * document with ≥ 1 transition. The ONE scoring expression — oracled
    * through `text_lm_score`, replayed by the index probe and the
    * streaming twin. Scale shape: LM tables broadcast onto the
    * corpus-sized transition stream; one doc_id rollup; N rides a 1-row
    * broadcast. */
  def score(docs: DataFrame, lm: Lm): DataFrame =
    scoreTransitions(transitions(docs), lm)

  /** [[score]] over a caller-supplied transition table (the shared
    * fan-out form — identical expression tree, so the oracle cannot
    * tell the two apart). */
  def scoreTransitions(trans: DataFrame, lm: Lm): DataFrame =
    trans
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

  // ---- trigram form ---------------------------------------------------

  /** Trigram LM view: `tri` (w1, w2, cur, c3) thresholded, plus the
    * bigram [[Lm]] it backs off into. */
  final case class Lm3(tri: DataFrame, bi: Lm)

  /** (doc_id, w1, w2, cur) — trigram contexts, the slice+zip fan-out one
    * step wider. Docs with < 3 tokens contribute nothing here (their
    * transitions all live at the bigram level). */
  def trigrams(docs: DataFrame): DataFrame = {
    val toks = col("toks")
    docs.select(col("doc_id"), tokens.as("toks"))
      .select(col("doc_id"),
        slice(toks, lit(1), size(toks) - 2).as("a"),
        slice(toks, lit(2), size(toks) - 2).as("b"),
        slice(toks, lit(3), size(toks) - 2).as("c"))
      .select(col("doc_id"),
        explode(arrays_zip(col("a"), col("b"), col("c"))).as("t"))
      .select(col("doc_id"), col("t.a").as("w1"), col("t.b").as("w2"),
        col("t.c").as("cur"))
  }

  /** In-memory trigram LM (thresholded like the bigrams: a trigram must
    * recur to count as known). */
  def lm3From(docs: DataFrame, minCount: Long = MinCount,
      uniMinCount: Long = 1L): Lm3 = {
    val tri = trigrams(docs).groupBy("w1", "w2", "cur")
      .agg(count(lit(1)).cast("long").as("c3"))
      .filter(col("c3") >= minCount)
    Lm3(tri, lmFrom(docs, minCount, uniMinCount))
  }

  /** Proper stupid backoff (Brants et al. 2007, the full chain): each
    * position scores at the deepest known level —
    *   trigram known:            c3 / c2(w1,w2)
    *   else bigram known:  0.4 · cb / cu(prev)
    *   else:               0.16 · cu(cur) / N   (0.4², aggregated)
    * — with each doc's FIRST transition (no trigram context exists)
    * handled at the bigram level, the standard short-context rule. The
    * same aggregation discipline as [[score]]: per-doc INTEGER sums per
    * backoff level, the doubles in one fixed tree at the end, so
    * everything stays summation-order-free. What the trigram level buys
    * (Lm3Spec's planted construction): a document whose word PAIRS are
    * all corpus-attested but whose three-word phrases are novel scores
    * strictly below an in-distribution twin that the bigram model
    * PROVABLY cannot distinguish (equal counts by symmetry).
    *
    * Output: (doc_id, n_trans, n_tri, hit3, ctx3, n_bi, hit2, ctx2,
    * n_uni, bo_num, lm3_score), one row per doc with ≥ 1 transition.
    * TEST-gated (Lm3Spec) — the declared `text_lm_score` stays the
    * bigram form; a trigram oracle would double the SQL for the same
    * verified expression discipline. */
  def score3(docs: DataFrame, lm: Lm3): DataFrame = {
    // every transition (prev -> cur), with its trigram context w1 where
    // one exists (null for each doc's first transition): join transitions
    // to trigram contexts on (doc_id, w2=prev, cur) position-free —
    // ambiguous for repeated (prev, cur) pairs within a doc, so instead
    // derive both views from ONE wider fan-out keyed by position
    val toks = col("toks")
    val trans = docs.select(col("doc_id"), tokens.as("toks"))
      .select(col("doc_id"),
        // pad a null w1 ahead of the first transition: w1_i = toks[i-1]
        slice(concat(array(lit(null).cast("string")), toks),
          lit(1), size(toks) - 1).as("a"),
        slice(toks, lit(1), size(toks) - 1).as("b"),
        slice(toks, lit(2), size(toks) - 1).as("c"))
      .select(col("doc_id"),
        explode(arrays_zip(col("a"), col("b"), col("c"))).as("t"))
      .select(col("doc_id"), col("t.a").as("w1"), col("t.b").as("prev"),
        col("t.c").as("cur"))
    trans
      .join(broadcast(lm.tri.select(col("w1"), col("w2").as("prev"),
        col("cur"), col("c3"))), Seq("w1", "prev", "cur"), "left")
      .join(broadcast(lm.bi.big.select(col("prev").as("w1"),
        col("cur").as("prev"), col("cb").as("c2ctx"))),
        Seq("w1", "prev"), "left")
      .join(broadcast(lm.bi.big), Seq("prev", "cur"), "left")
      .join(broadcast(lm.bi.uni.select(col("w").as("prev"),
        col("cu").as("cu_prev"))), Seq("prev"), "left")
      .join(broadcast(lm.bi.uni.select(col("w").as("cur"),
        col("cu").as("cu_cur"))), Seq("cur"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_trans"),
        count(col("c3")).as("n_tri"),
        coalesce(sum("c3"), lit(0L)).cast("long").as("hit3"),
        coalesce(sum(when(col("c3").isNotNull, col("c2ctx"))), lit(0L))
          .cast("long").as("ctx3"),
        count(when(col("c3").isNull && col("cb").isNotNull, lit(1)))
          .as("n_bi"),
        coalesce(sum(when(col("c3").isNull, col("cb"))), lit(0L))
          .cast("long").as("hit2"),
        coalesce(sum(when(col("c3").isNull && col("cb").isNotNull,
          col("cu_prev"))), lit(0L)).cast("long").as("ctx2"),
        count(when(col("c3").isNull && col("cb").isNull, lit(1)))
          .as("n_uni"),
        coalesce(sum(when(col("c3").isNull && col("cb").isNull,
          col("cu_cur"))), lit(0L)).cast("long").as("bo_num"))
      .crossJoin(broadcast(lm.bi.n))
      .select(col("doc_id"), col("n_trans"), col("n_tri"), col("hit3"),
        col("ctx3"), col("n_bi"), col("hit2"), col("ctx2"), col("n_uni"),
        col("bo_num"),
        (when(col("n_tri") === 0, lit(0.0)).otherwise(
           col("hit3").cast("double") / col("ctx3").cast("double"))
         + lit(Alpha) * when(col("n_bi") === 0, lit(0.0)).otherwise(
             col("hit2").cast("double") / col("ctx2").cast("double"))
         + lit(Alpha * Alpha) * when(col("n_uni") === 0, lit(0.0))
             .otherwise(col("bo_num").cast("double")
               / (col("n_uni").cast("double")
                  * col("n_tokens").cast("double"))))
          .as("lm3_score"))
  }

  // ---- persisted index ------------------------------------------------

  /** Build and publish a fresh LM index at `dir` (v1 unless versions
    * already exist): `v<N>/bigrams` + `v<N>/unigrams` raw count rows,
    * then the atomic pointer flip. A scoring word (unigram) table and the
    * transition table are written UNthresholded — the known-transition
    * cut belongs to [[readLm]] so future appends can promote rare
    * bigrams. */
  def writeLm(docs: DataFrame, dir: String,
      withTrigrams: Boolean = false): Unit = {
    val spark = docs.sparkSession
    val v = Versioned.nextVersion(spark, dir)
    val root = s"$dir/$v"
    val (big, uni) = shardCounts(docs)
    big.write.mode("errorifexists").parquet(s"$root/bigrams")
    uni.write.mode("errorifexists").parquet(s"$root/unigrams")
    // the trigram table is just one more mergeable count family — same
    // append/threshold/compaction algebra, opt-in because it is the
    // big one (cube of the vocabulary in the worst case)
    if (withTrigrams)
      trigrams(docs).groupBy("w1", "w2", "cur")
        .agg(count(lit(1)).as("n"))
        .write.mode("errorifexists").parquet(s"$root/trigrams")
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
    // a trigram-carrying index stays uniformly trigram-carrying
    if (pathExists(spark, s"$root/trigrams")) {
      val tri0 = trigrams(docs).groupBy("w1", "w2", "cur")
        .agg(count(lit(1)).as("n"))
      val tri = if (!negate) tri0 else tri0.withColumn("n", -col("n"))
      tri.write.mode("append").parquet(s"$root/trigrams")
    }
  }

  private def pathExists(spark: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sessionState.newHadoopConf()).exists(path)
  }

  /** The frozen TRIGRAM LM at `dir` — requires an index written with
    * `withTrigrams = true` (loud otherwise). */
  def readLm3(spark: SparkSession, dir: String,
      minCount: Long = MinCount, uniMinCount: Long = 1L): Lm3 = {
    val root = Versioned.resolveRoot(spark, dir)
    require(pathExists(spark, s"$root/trigrams"),
      s"LM index at $dir has no trigram table — writeLm(withTrigrams=true)")
    val tri = spark.read.parquet(s"$root/trigrams")
      .groupBy("w1", "w2", "cur").agg(sum("n").cast("long").as("c3"))
      .filter(col("c3") >= minCount)
    Lm3(tri, readLm(spark, dir, minCount, uniMinCount))
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
    if (pathExists(spark, s"$old/trigrams"))
      spark.read.parquet(s"$old/trigrams")
        .groupBy("w1", "w2", "cur").agg(sum("n").cast("long").as("n"))
        .filter(col("n") =!= 0L)
        .coalesce(1)
        .write.mode("errorifexists").parquet(s"$root/trigrams")
    Versioned.publish(spark, dir, v)
  }
}
