package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, MapState, OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming surface — SURVEY.md §2 B10.
  *
  * Every transform takes a DataFrame and works identically on a batch or
  * streaming input ("unified" API): tests feed `MemoryStream` and assert
  * batch-equivalence (SURVEY §5.2 layer 3); production reads
  * `spark.readStream` over the same schema. No DStreams anywhere.
  *
  * Scale notes: windowed aggregations keep state bounded by the watermark
  * (late rows beyond it are dropped and their state evicted); dedup state is
  * likewise watermark-bounded; the stream-static rule join broadcasts the
  * ruleset so the stream never shuffles for the match.
  */
object Streaming {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** File-based streaming source over an events-shaped parquet directory. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  // ------------------------------------------------------------ B10.1–B10.3

  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("total_value"))

  def slidingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket_start"), col("n"))

  def sessionCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  // ------------------------------------------------------------ B10.5

  /** Streaming dedup on event_id with watermark-bounded state. */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** CHAINED stateful operators — dedup then windowed aggregation in ONE
    * query (Spark 4 multi-stateful support): exactly-once event semantics
    * feeding hourly counts. Both operators share the event-time watermark;
    * the aggregation only emits a window once the watermark passes its
    * end, so the output is append-mode final — a window is never revised
    * by a late duplicate. */
  def dedupedTumblingCounts(events: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"))

  // ------------------------------------------------------------ B10.7

  /** Streaming twin of the batch first-match pipeline. The ruleset is
    * folded into a scalar first-match expression (Fw.firstMatchCol) instead
    * of a join+groupBy(event): per-event aggregation state after a
    * watermark would trip Spark's multi-stateful-operator correctness
    * check, and the expression form needs no state at all — the only
    * stateful op is the tiny per-rule count. */
  def streamRuleCounts(events: DataFrame,
      rules: Seq[graft.domain.Fw.Rule] = graft.domain.Fw.ruleset,
      watermark: String = "10 minutes"): DataFrame = {
    // same derivation as the batch pipeline — shared so they cannot drift
    val fw = graft.domain.Fw.deriveFw(events)
    fw.withWatermark("ts", watermark)
      .withColumn("rule_seq", graft.domain.Fw.firstMatchCol(rules))
      .filter(col("rule_seq").isNotNull)
      .groupBy("acl", "rule_seq")
      .agg(count(lit(1)).as("hits"))
  }

  // ------------------------------------------------------------ B10.12

  /** Online corpus-dup flagging — the streaming twin of
    * [[graft.sim.IncrementalDedup]]'s corpus probe (round 7): each arriving
    * document is checked against the PERSISTED MinHash band index and
    * emitted as a `(doc_id, dup_of, jaccard)` flag row when it near-dups a
    * corpus member. This is the online contamination filter in front of a
    * training-data ingest queue.
    *
    * Deliberately STATELESS: the band fan-out is a pure per-row transform
    * (shared function with the batch probe, so they cannot drift), the
    * index join is stream-static against a FIXED index snapshot — the
    * parquet file listing is resolved ONCE at stream definition
    * (InMemoryFileIndex), so an index republished in place is NOT picked
    * up mid-stream (and deleting its files can fail the query); to roll
    * the index, restart the stream (checkpoint-cheap: no state store) or
    * use [[streamCorpusDupFlagsLive]] — and the verify is a row filter —
    * no watermark, no state store, nothing to size or evict. The price is
    * multiplicity: a doc matching a corpus member in several bands emits
    * that flag once per colliding band, so consumers must be idempotent on
    * (doc_id, dup_of) — the natural contract for quarantine routing, and
    * the alternative (a per-doc streaming aggregation) would hold
    * unbounded state for an exactly-once verdict nobody needs. The
    * StreamingSpec gate asserts the flagged doc-id SET equals the batch
    * probe's on identical input. */
  def streamCorpusDupFlags(docs: DataFrame, indexPath: String,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
      shingleK: Int = 3): DataFrame = {
    val s = docs.sparkSession
    probeAgainstIndex(docs,
      s.read.parquet(s"$indexPath/bands"),
      s.read.parquet(s"$indexPath/toks"),
      threshold, numHashes, bands, shingleK)
  }

  /** The probe join itself, static-DataFrame-typed on the index side so
    * [[streamCorpusDupFlags]] (fixed snapshot) and
    * [[streamCorpusDupFlagsLive]] (fresh read per batch) share one body —
    * the same cannot-drift discipline as `probeBands`. Two stream-static
    * joins (round 14, the slim-index layout): collide on the 8-byte band
    * hashes, then fetch the verify token sets only for colliding corpus
    * ids — both stateless equi-joins, so the no-state contract above is
    * unchanged, and so is the per-colliding-band multiplicity (no
    * `distinct`, which would be a stateful op on a stream). */
  private def probeAgainstIndex(docs: DataFrame, bandsIdx: DataFrame,
      toksIdx: DataFrame, threshold: Double, numHashes: Int, bands: Int,
      shingleK: Int): DataFrame = {
    val probe = graft.sim.IncrementalDedup.probeBands(docs, "doc_id", "text",
      numHashes, bands, shingleK)
    probe.alias("p").join(bandsIdx.alias("i"),
        col("p.pb") === col("i.pb")
          && col("p.band_id") === col("i.band_id")
          && col("p.bkh") === col("i.bkh"))
      .select(col("p.id").as("doc_id"), col("i.id").as("dup_of"),
        col("p.toks"))
      .join(toksIdx.select(col("id").as("dup_of"),
        col("toks").as("itoks")), Seq("dup_of"))
      .select(col("doc_id"), col("dup_of"),
        graft.sim.MinHash.exactJaccard(col("toks"), col("itoks"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** [[streamCorpusDupFlags]] against a LIVE index: the snapshot variant
    * resolves the index file listing ONCE at stream definition, so an
    * index republished in place is invisible until restart. Here each
    * micro-batch re-reads the index path inside `foreachBatch` — a
    * republish (an atomic `mode("overwrite")` like
    * [[graft.sim.IncrementalDedup.writeIndex]]) takes effect at the next
    * batch boundary, at the cost of re-listing (not re-reading) the index
    * per batch. The flags for each batch go to `sink` with the batch id —
    * foreachBatch's usual at-least-once contract, which matches the
    * (doc_id, dup_of)-idempotent consumer this op already requires. */
  def streamCorpusDupFlagsLive(docs: DataFrame, indexPath: String,
      sink: (DataFrame, Long) => Unit, threshold: Double = 0.8,
      numHashes: Int = 32, bands: Int = 8, shingleK: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val s = batch.sparkSession
      sink(probeAgainstIndex(batch,
        s.read.parquet(s"$indexPath/bands"),
        s.read.parquet(s"$indexPath/toks"),
        threshold, numHashes, bands, shingleK), id)
    }

  /** Online passage-contamination spans — the streaming twin of
    * [[graft.text.SubstringDedup.shardDupSpans]] (B10.13): each arriving
    * document is checked for ≥k-token passages copied verbatim from the
    * indexed corpus, the span-level contamination filter in front of an
    * ingest queue (the corpus-dup flags above catch whole-document
    * near-dups; this catches embedded copies).
    *
    * foreachBatch, not a streaming plan: the span merge is a per-doc
    * window, illegal in an append stream but exact inside a micro-batch
    * BECAUSE documents arrive whole (one row per doc — spans never span
    * batches). Sharing `shardDupSpans` verbatim keeps batch and stream
    * from drifting, and the per-batch index re-read means corpus shards
    * appended via `appendShingleIndex` are picked up at the next batch
    * boundary — append-only, so unlike an overwritten index there is no
    * listing-staleness hazard to work around. */
  def streamPassageSpans(docs: DataFrame, k: Int, indexPath: String,
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(graft.text.SubstringDedup.shardDupSpans(batch, k, indexPath), id)
    }

  /** Online SEMANTIC near-dup flags (round 9) — the embedding modality's
    * streaming twin, completing the set (MinHash flags:
    * [[streamCorpusDupFlags]]; passage spans: [[streamPassageSpans]]):
    * arriving embedded documents `(vec_id, embedding)` are probed against
    * the persisted [[graft.sim.SemDedup]] IVF index and emitted as
    * `(vec_id, dup_of, cosine)` flag rows per micro-batch. foreachBatch
    * rather than a stream-static join because the probe both aggregates
    * per vector (the arg-max cluster assignment) and statically prunes
    * the index scan from the batch's cluster set — neither is legal on an
    * unbounded stream, and both are exact per micro-batch since vectors
    * arrive whole. Shares [[graft.sim.SemDedup.corpusDupFlags]] verbatim
    * with the batch path, so the two cannot drift; the StreamingSpec gate
    * asserts flag-set equality with the batch probe. Same at-least-once /
    * (vec_id, dup_of)-idempotent consumer contract as the MinHash twin. */
  def streamSemDupFlags(docs: DataFrame, indexPath: String,
      sink: (DataFrame, Long) => Unit, threshold: Double = 0.99)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(graft.sim.SemDedup.corpusDupFlags(batch.sparkSession, batch,
        indexPath, threshold), id)
    }

  /** Online fingerprint dup flags (B10.20) — the streaming twin of the
    * persisted [[graft.sim.FpIndex]] probe, and the MULTIMODAL member of
    * the online-dedup family: any stream that reduces rows to a 63-bit
    * fingerprint — text SimHash, image dHash, audio envelope hash (all
    * pure per-row transforms, legal upstream of `writeStream`) — probes
    * the same index shape. foreachBatch because the probe statically
    * prunes the index scan from the batch's bucket set (illegal on an
    * unbounded stream, exact per micro-batch); the versioned pointer
    * re-resolves per batch, so appends/compactions land at the next batch
    * boundary. Input frame: (id, fp). */
  def streamFpDupFlags(fps: DataFrame, indexPath: String,
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    fps.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty)
        sink(graft.sim.FpIndex.corpusDupFlags(batch.sparkSession, batch,
          indexPath), id)
    }

  /** Online fingerprint INGEST (B10.21) — the full probe → drop →
    * fold-in loop ([[graft.sim.FpIndex.ingestShard]] VERBATIM) as a
    * stream: each micro-batch of fingerprints (a day of images through
    * dHash, documents through SimHash) is deduped against the persisted
    * index — corpus hits, contaminated within-batch clusters, and
    * clean-cluster non-mins all drop — and then folded in, so later
    * batches dedupe against earlier ones. The sink receives each batch's
    * (kept, batchId). Monotonic-id contract spans batches (id-ordered
    * arrival); under foreachBatch's at-least-once replays a replayed
    * batch trips the append guard and fails loudly rather than
    * double-appending — the streamCurationIngest posture. */
  def streamFpIngest(fps: DataFrame, indexPath: String,
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    fps.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty)
        sink(graft.sim.FpIndex.ingestShard(batch.sparkSession, batch,
          indexPath), id)
    }

  /** Online boilerplate-line INGEST loop — the CCNet crawl shape as a
    * stream: each micro-batch of (doc_id, text) documents is (1) CLEANED
    * against the boilerplate set the index has accumulated so far
    * ([[graft.text.LineIndex.probeShard]] — which replays the batch
    * cleaning body VERBATIM) and the cleaned docs handed to `sink`, then
    * (2) FOLDED IN via [[graft.text.LineIndex.appendIndex]], so a line
    * pushed over the threshold by earlier batches drops from every later
    * batch — cross-batch boilerplate emerges without any corpus rescan.
    * Monotonic-id contract spans batches; a foreachBatch replay trips
    * the append guard and fails loudly rather than double-counting (the
    * streamFpIngest posture). Probe-before-fold means a batch never
    * drops lines only IT made frequent — matching the sequential batch
    * loop, which LineIndexSpec pins exactly. */
  def streamLineIngest(docs: DataFrame, indexPath: String,
      sink: (DataFrame, Long) => Unit, minDf: Long = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val b = batch.localCheckpoint() // probe + fold read it twice
        // eager checkpoint: the cleaning MUST materialize against the
        // pre-fold set — a lazy frame collected after appendIndex would
        // silently clean against the batch's own counts
        sink(graft.text.LineIndex.probeShard(b, indexPath, minDf)
          .localCheckpoint(), id)
        graft.text.LineIndex.appendIndex(b, indexPath)
      }
    }

  /** Online LEXICAL index ingest (B10.22) — fold each micro-batch of
    * (doc_id, text) documents into the persisted BM25 inverted index via
    * [[graft.text.LexIndex.appendIndex]] VERBATIM, so queries served
    * between batches see every document the stream has delivered so far
    * (df and avgdl advance with the corpus — the meta counters make the
    * per-batch stats update O(batch), never a corpus rescan). The sink
    * receives each batchId after its fold-in commits. Monotonic-id
    * contract spans batches; a foreachBatch replay trips the append guard
    * and fails loudly rather than double-counting postings — the
    * streamFpIngest posture. */
  def streamLexIngest(docs: DataFrame, indexPath: String,
      sink: Long => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        graft.text.LexIndex.appendIndex(batch, indexPath)
        sink(id)
      }
    }

  /** Online benchmark decontamination (B10.23) — flag each micro-batch
    * of arriving (doc_id, text) documents against the persisted benchmark
    * gram index via [[graft.text.DecontIndex.probeShard]] VERBATIM (the
    * streamFpDupFlags posture), so batch and stream verdicts cannot
    * drift. foreachBatch, not a streaming plan: the per-doc gram rollup
    * aggregates within the batch, which is exact because documents arrive
    * whole. Each batch re-resolves `_CURRENT`, so a benchmark rotation
    * (append/retract/compact + republish) takes effect at the next batch
    * boundary. The sink receives each batch's (flags, batchId) under
    * foreachBatch's usual at-least-once contract — per-doc verdicts are
    * idempotent, so replays are harmless to an upserting consumer. */
  def streamDecontFlags(docs: DataFrame, indexPath: String,
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty)
        sink(graft.text.DecontIndex.probeShard(batch, indexPath), id)
    }

  // ------------------------------------------------------------ B10.15

  /** Online release curation — the full probe → drop → fold-in ingest loop
    * (SURVEY B9.36) as a stream: each micro-batch of arriving documents is
    * curated against the persisted release index at `dir` and its
    * survivors appended back, via [[graft.sim.Curation.ingestShard]]
    * VERBATIM so batch and stream cannot drift. The sink receives each
    * batch's (kept, ledger, batchId).
    *
    * foreachBatch, not a streaming plan: every stage aggregates within the
    * batch (within-shard exact groupBy, span windows, pair components) and
    * then MUTATES the index — neither legal on an unbounded stream, both
    * exact per micro-batch since documents arrive whole. The monotonic-id
    * ingest contract now spans batches: each batch's min doc_id must
    * exceed the high-water mark the previous batch advanced — id-ordered
    * arrival, the natural shape of an append-only upstream log. Under
    * foreachBatch's at-least-once contract a REPLAYED batch trips that
    * same guard rather than double-appending: the loop fails loudly
    * instead of corrupting the release (the recovery is re-publishing the
    * index from its last good version — the semantic index is versioned
    * for exactly this).
    *
    * `emb`: the batch-keyed embeddings side (vec_id == doc_id) as a STATIC
    * table — ingestShard semi-joins it down to the batch's survivors, so
    * only batch vectors are probed or appended; `None` runs stages 1–3. */
  def streamCurationIngest(docs: DataFrame, emb: Option[DataFrame],
      dir: String, sink: (DataFrame, DataFrame, Long) => Unit,
      shingleK: Int = graft.text.SubstringDedup.declaredK,
      maxDupFrac: Double = 0.5, minhashThreshold: Double = 0.8,
      cosineThreshold: Double = 0.99, nprobe: Int = 1,
      lmMinScore: Option[Double] = None,
      decont: Option[graft.sim.Curation.Decont] = None,
      lineClean: Option[graft.sim.Curation.LineClean] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val r = graft.sim.Curation.ingestShard(batch, emb, dir, shingleK,
          maxDupFrac, minhashThreshold, cosineThreshold, nprobe,
          lmMinScore = lmMinScore, decont = decont, lineClean = lineClean)
        sink(r.kept, r.ledger, id)
      }
    }

  /** Takedown requests as a STREAM — the online twin of
    * [[graft.sim.Curation.retract]], completing the release loop's
    * streaming symmetry (every other loop operation — curate, ingest,
    * probe — already has one). Each micro-batch of (doc_id, source, text)
    * retraction requests applies `retract` verbatim: ids tombstone, the
    * substring grams subtract, and every subsequent ingest batch (this
    * stream composes with [[streamCurationIngest]] against the same
    * index) stops seeing the retracted content. Where the ingest stream
    * leans on the monotonic-id guard to fail loudly on foreachBatch's
    * at-least-once replays, retraction leans on `retract`'s doc-level
    * IDEMPOTENCE: a replayed takedown batch filters down to
    * already-tombstoned ids and becomes a no-op — replay-safe by
    * construction, no guard needed. */
  def streamRetract(requests: DataFrame, dir: String,
      shingleK: Int = graft.text.SubstringDedup.declaredK)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    requests.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) graft.sim.Curation.retract(batch, None, dir,
        shingleK)
    }

  /** Online LM quality scoring — the streaming twin of `text_lm_score`
    * against the PERSISTED LM index ([[graft.text.LmScore]]): each
    * micro-batch of (doc_id, text) documents is scored with the SAME
    * expression the oracled batch query uses, against the frozen counts
    * published at `lmDir`. This is the quality gate in front of a
    * training-data ingest queue: score arriving docs, route low-scoring
    * ones to review.
    *
    * STATELESS by the same argument as [[streamCorpusDupFlags]] — the
    * per-doc rollup happens WITHIN a micro-batch (a document arrives
    * whole, the upstream framing contract), so no watermark and no state
    * store; the LM is re-resolved from the versioned pointer each batch
    * inside foreachBatch, so an [[graft.text.LmScore.appendLm]] or
    * [[graft.text.LmScore.compactLm]] between batches takes effect at
    * the next batch boundary (the `streamCorpusDupFlagsLive` posture;
    * [[graft.core.Versioned]]'s atomic flip means a mid-stream compaction
    * can never expose a half-written LM). The spec gate: streamed scores
    * ≡ the batch scorer on each batch's documents. */
  def streamLmScore(docs: DataFrame, lmDir: String,
      sink: (DataFrame, Long) => Unit,
      minCount: Long = graft.text.LmScore.MinCount,
      trigram: Boolean = false)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val s = batch.sparkSession
        // trigram = true scores with the full backoff chain against an
        // index written with trigrams (readLm3 refuses loudly otherwise)
        val scored =
          if (trigram) graft.text.LmScore.score3(batch,
            graft.text.LmScore.readLm3(s, lmDir, minCount))
          else graft.text.LmScore.score(batch,
            graft.text.LmScore.readLm(s, lmDir, minCount))
        sink(scored, id)
      }
    }

  /** Online CCNet perplexity bucketing (B10.31) — each micro-batch of
    * (doc_id, lang, text) documents scored against the FROZEN published
    * LM at `lmDir` (re-resolved per batch behind the Versioned pointer —
    * the streamLmScore discipline) and bucketed head/middle/tail against
    * FROZEN per-language tercile cuts
    * ([[graft.text.TextOps.qualityBucketByCuts]] VERBATIM — the shard
    * form the declared `sample_quality_bucket` freezes into; map-side:
    * one broadcast join, no window). The release's terciles are the
    * terciles — a shard never re-derives quantiles from itself.
    * Stateless and a pure function of (doc, LM, cuts), so at-least-once
    * replays are idempotent per doc_id. */
  def streamQualityBucket(docs: DataFrame, lmDir: String,
      cuts: DataFrame, sink: (DataFrame, Long) => Unit,
      minCount: Long = graft.text.LmScore.MinCount)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val s = batch.sparkSession
        val scored = graft.text.LmScore.score(batch,
            graft.text.LmScore.readLm(s, lmDir, minCount))
          .select(col("doc_id"), col("lm_score"))
        val scoredLang = batch.select("doc_id", "lang").join(scored, "doc_id")
        sink(graft.text.TextOps.qualityBucketByCuts(scoredLang, cuts), id)
      }
    }

  /** Online BPE tokenization — [[graft.text.Bpe.encode]] applied per
    * micro-batch against a FROZEN model (the merge list is driver-side
    * data, fixed at stream definition like every frozen model here):
    * the tokenize-on-arrival step in front of a training-data queue.
    * Stateless; the per-batch distinct-word vocabulary is an in-batch
    * aggregation (foreachBatch — the same reason the curation stream
    * uses it), so each batch pays the regex chain once per ITS distinct
    * words and the broadcast fan-back. The encode-replays-training
    * contract makes online and offline tokenizations identical by
    * construction — the property that matters when the same corpus is
    * tokenized once at ingest and again at training time. */
  def streamBpeEncode(docs: DataFrame, model: graft.text.Bpe.Model,
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) sink(graft.text.Bpe.encode(batch, model), id)
    }

  /** Online boilerplate-line removal — the streaming twin of
    * `text_line_dedup`'s cleaning half: each arriving micro-batch is
    * cleaned against a boilerplate line set mined OFFLINE over the
    * accumulated corpus (the CCNet split: membership mining needs the
    * whole corpus, application is per-document). Replays
    * [[graft.text.TextOps.cleanAgainstBoilerplate]] VERBATIM, so online
    * and offline cleanings cannot drift; the set is re-read from
    * `bpPath` each batch, so republishing a freshly-mined set takes
    * effect at the next batch boundary. Stateless and map-side (the set
    * broadcasts) — the right shape in front of an ingest queue. */
  def streamLineClean(docs: DataFrame, bpPath: String,
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val bp = batch.sparkSession.read.parquet(bpPath)
        sink(graft.text.TextOps.cleanAgainstBoilerplate(batch, bp), id)
      }
    }

  /** Online DSIR selection (B10.19) — the streaming twin of `sample_dsir`
    * (B9.44): each micro-batch of arriving documents is scored against the
    * persisted TARGET and RAW LM indexes and accepted by the shared
    * [[graft.text.TextOps.dsirSelect]] body VERBATIM — the
    * importance-resampling data-selection gate in front of a training-data
    * ingest queue. Stateless (the streamLmScore argument: docs arrive
    * whole, both rollups are within-batch); both LMs re-resolve from their
    * [[graft.core.Versioned]] pointers each batch, so `appendLm` /
    * `compactLm` on either take effect at the next batch boundary, and the
    * md5-bucket acceptance makes a replayed batch select the IDENTICAL
    * subset (deterministic in doc_id — replay-safe by construction, the
    * streamRetract posture). */
  /** Online seed-set classification (B10.27) — classify each arriving
    * micro-batch against a FROZEN [[graft.text.Classify.Model]] via
    * [[graft.text.Classify.classifyWith]] VERBATIM (ClassifySpec pins
    * the frozen-model path ≡ the self-trained corpus slice, which
    * transfers the declared `text_classify` oracle match here). The
    * model tables are class/vocabulary bounded and broadcast per batch —
    * pure map + one batch-sized rollup, no cross-batch state. */
  def streamClassify(docs: DataFrame, model: graft.text.Classify.Model,
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty)
        sink(graft.text.Classify.classifyWith(batch, model), id)
    }

  /** [[streamClassify]] for the hashed-bigram model (round 14 — the
    * `text_classify_bigram` form): identical posture, and the model is
    * buckets × classes bounded, so the per-batch broadcast is a CONSTANT
    * at any vocabulary — the variant that stays broadcast-safe on a
    * web-scale stream. */
  def streamClassifyHashed(docs: DataFrame,
      model: graft.text.Classify.Model,
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty)
        sink(graft.text.Classify.classifyHashedWith(batch, model), id)
    }

  /** Online token-budget fill (B10.26) — select each arriving
    * micro-batch's documents into the training mix while their
    * language's quota lasts, via [[graft.text.TextOps.budgetFillShard]]
    * VERBATIM: the batch fill's growth-stability property (prefix
    * selection in monotonic doc_id order only ever extends) is what
    * makes the stream EXACT — the union of per-batch selections equals
    * `sample_budget` over everything delivered so far, row for row. The
    * carried per-lang token tally lives in a mergeable count table at
    * `statePath` (one appended row set per batch, readers sum); a
    * foreachBatch replay trips the tally's monotonic-id guard instead of
    * double-counting. The sink receives each batch's selected rows. */
  def streamBudgetFill(docs: DataFrame, statePath: String,
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty)
        sink(graft.text.TextOps.budgetFillShard(batch, statePath), id)
    }

  /** Online temperature fill (B10.33) — [[streamBudgetFill]]'s carried-
    * tally mechanics against a FROZEN (lang, quota) table: the release
    * corpus prices languages once ([[graft.text.TextOps
    * .temperatureQuotas]]), each micro-batch fills against that price
    * while its quotas last. Quotas are re-read per batch from `quotaPath`
    * so a republished pricing takes effect at the next batch boundary —
    * the streamEncodeBpe pointer discipline. Replay safety = the shard
    * form's monotonic-id guard. */
  def streamTemperatureFill(docs: DataFrame, statePath: String,
      quotaPath: String, sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val quotas = batch.sparkSession.read.parquet(quotaPath)
        sink(graft.text.TextOps.temperatureFillShard(batch, statePath,
          quotas), id)
      }
    }

  /** Online TOKENIZER-METERED temperature fill (B10.37) —
    * [[streamTemperatureFill]] with the bill in the trainer's unit: the
    * release prices languages once in its frozen tokenizer's subwords
    * ([[graft.text.TextOps.temperatureQuotasBpe]] & siblings), and each
    * micro-batch is billed by the SAME frozen model — re-resolved per
    * batch from the [[graft.text.TokenizerStore]] at `modelDir` (the
    * streamEncodeBpe pointer discipline: a republished model takes
    * effect at the next batch boundary, in lockstep with a republished
    * quota table). `byteLevel` picks the [[graft.text.ByteBpe]] encode
    * for a byte-trained model. Replay safety = the shard form's
    * monotonic-id guard. */
  def streamTemperatureFillBpe(docs: DataFrame, statePath: String,
      quotaPath: String, modelDir: String, sink: (DataFrame, Long) => Unit,
      byteLevel: Boolean = false)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val quotas = batch.sparkSession.read.parquet(quotaPath)
        val m =
          if (byteLevel) graft.text.TokenizerStore
            .readByteBpe(batch.sparkSession, modelDir)
          else graft.text.TokenizerStore.readBpe(batch.sparkSession,
            modelDir)
        sink(graft.text.TextOps.temperatureFillShardMetered(batch,
          statePath, quotas,
          graft.text.TextOps.shardBillBpe(m, byteLevel)), id)
      }
    }

  /** Online multi-epoch fill (B10.34) — [[streamTemperatureFill]]'s
    * posture for the upsampling form: the frozen pricing table (lang, c,
    * quota, full_epochs, rem from [[graft.text.TextOps.epochQuotas]]) is
    * re-read per batch from `quotaPath`; full passes are STATELESS
    * map-side fan-out, the partial pass rides the carried tally. Replay
    * safety = the shard form's monotonic-id guard. */
  def streamEpochFill(docs: DataFrame, statePath: String,
      quotaPath: String, sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val quotas = batch.sparkSession.read.parquet(quotaPath)
        sink(graft.text.TextOps.epochFillShard(batch, statePath, quotas),
          id)
      }
    }

  /** Online TOKENIZER-METERED multi-epoch fill (B10.39, round 16) —
    * [[streamEpochFill]] with the bill in the trainer's unit: the
    * release prices the upsampler once in its frozen tokenizer's
    * subwords ([[graft.text.TextOps.epochQuotasBpe]] & siblings), and
    * each micro-batch's full passes AND partial-pass tally are billed by
    * the SAME frozen model — re-resolved per batch from the
    * [[graft.text.TokenizerStore]] at `modelDir` in lockstep with the
    * quota table (the streamTemperatureFillBpe discipline). `byteLevel`
    * picks the [[graft.text.ByteBpe]] encode for a byte-trained model.
    * Replay safety = the shard form's monotonic-id guard. */
  def streamEpochFillBpe(docs: DataFrame, statePath: String,
      quotaPath: String, modelDir: String, sink: (DataFrame, Long) => Unit,
      byteLevel: Boolean = false)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val quotas = batch.sparkSession.read.parquet(quotaPath)
        val m =
          if (byteLevel) graft.text.TokenizerStore
            .readByteBpe(batch.sparkSession, modelDir)
          else graft.text.TokenizerStore.readBpe(batch.sparkSession,
            modelDir)
        sink(graft.text.TextOps.epochFillShardMetered(batch, statePath,
          quotas, graft.text.TextOps.shardBillBpe(m, byteLevel)), id)
      }
    }

  /** Online weighted-sample admission (B10.36) — the frozen-threshold
    * form of the Efraimidis–Spirakis draw: the release corpus publishes
    * its k-th score once ([[graft.text.TextOps.weightedThreshold]]),
    * each micro-batch admits documents clearing that bar — a STATELESS
    * map-side filter (no tally, no top-k per batch), re-read per batch
    * so a republished price takes effect at the next boundary; replays
    * are idempotent per doc_id (pure function of the row). */
  def streamWeightedFill(docs: DataFrame, thresholdPath: String,
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val thr = batch.sparkSession.read.parquet(thresholdPath)
        sink(graft.text.TextOps.weightedSampleWith(batch, thr), id)
      }
    }

  /** CDC log ingestion (B10.35) — the merge-on-read write path: each
    * micro-batch of change rows (full replacement values + `op` + `seq`)
    * APPENDS to the delta log; the target is never rewritten in-stream.
    * Readers get MERGE semantics on demand via
    * [[graft.ops.Relational.mergeView]] (latest-per-key collapse + CDC
    * apply). At-least-once replays append byte-identical rows, which the
    * view's (key, seq) dedup collapses — the view, not the writer, is
    * the idempotence point. */
  def streamMergeLog(changes: DataFrame, logPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    changes.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty)
        batch.write.mode("append").parquet(logPath)
    }

  /** Online subword encoding against the PUBLISHED tokenizer (B10.28) —
    * each micro-batch of (doc_id, text) documents encoded by the model
    * at `dir` ([[graft.text.TokenizerStore]]), RE-RESOLVED from the
    * Versioned pointer per batch inside foreachBatch: a retrained
    * tokenizer republished mid-stream takes effect at the next batch
    * boundary, atomically — a batch sees vocab N or vocab N+1, never
    * half a merge list (the streamLmScore pointer discipline). Stateless
    * map-side work once the model broadcasts; encoding is a pure
    * function of (doc, model), so at-least-once replays are idempotent
    * per (doc_id, pos). TokenizerStoreSpec pins batch-≡-stream and the
    * republish visibility for BOTH tokenizer families. */
  def streamEncodeBpe(docs: DataFrame, dir: String,
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val m = graft.text.TokenizerStore.readBpe(batch.sparkSession, dir)
        sink(graft.text.Bpe.encode(batch, m), id)
      }
    }

  /** [[streamEncodeBpe]] for the BYTE-level family (B10.38, round 15) —
    * same pointer re-resolution and idempotence argument, resolved via
    * the family-checked [[graft.text.TokenizerStore.readByteBpe]] so a
    * char model republished at a byte pointer fails at batch time, not
    * as silent garbage tokens. */
  def streamEncodeByteBpe(docs: DataFrame, dir: String,
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val m = graft.text.TokenizerStore
          .readByteBpe(batch.sparkSession, dir)
        sink(graft.text.ByteBpe.encode(batch, m), id)
      }
    }

  /** [[streamEncodeBpe]] for the unigram-LM family (B10.29) — same
    * pointer re-resolution, same idempotence argument. */
  def streamEncodeUnigram(docs: DataFrame, dir: String,
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val m = graft.text.TokenizerStore
          .readUnigram(batch.sparkSession, dir)
        sink(graft.text.Unigram.encode(batch, m), id)
      }
    }

  /** The third tokenizer family's online encode (B10.32) — the
    * streamEncodeBpe posture verbatim: published WordPiece model
    * re-resolved per batch behind the Versioned pointer, greedy
    * longest-match in the kernel, replays idempotent per (doc_id, pos). */
  def streamEncodeWordPiece(docs: DataFrame, dir: String,
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val m = graft.text.TokenizerStore
          .readWordPiece(batch.sparkSession, dir)
        sink(graft.text.WordPiece.encode(batch, m), id)
      }
    }

  def streamDsir(docs: DataFrame, rawLmDir: String, targetLmDir: String,
      sink: (DataFrame, Long) => Unit,
      minCount: Long = graft.text.LmScore.MinCount)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val s = batch.sparkSession
        sink(graft.text.TextOps.dsirSelect(batch,
          graft.text.LmScore.readLm(s, rawLmDir, minCount),
          graft.text.LmScore.readLm(s, targetLmDir, minCount)), id)
      }
    }

  // ------------------------------------------------------------ B10.6

  final case class UserEvent(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class UserStats(user_id: Long, n_events: Long, total_value: Double,
      last_seen: java.sql.Timestamp)

  /** Arbitrary stateful op: per-user running stats via
    * flatMapGroupsWithState (update mode). `evictAfter` enables
    * processing-time state eviction in production; tests run with NoTimeout
    * because timeout bookkeeping keeps scheduling no-data micro-batches,
    * which never lets MemoryStream's processAllAvailable settle. */
  def runningUserStats(events: Dataset[UserEvent],
      evictAfter: Option[String] = None): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (evictAfter.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStats, UserStats](
        OutputMode.Update(), timeoutConf) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserStats]) =>
          if (state.hasTimedOut) {
            val out = state.get
            state.remove()
            Iterator.single(out)
          } else {
            val prev = state.getOption
              .getOrElse(UserStats(userId, 0L, 0.0, new java.sql.Timestamp(0)))
            val buf = rows.toSeq
            val batchMax = buf.map(_.ts).maxBy(_.getTime)
            val next = UserStats(userId,
              prev.n_events + buf.size,
              prev.total_value + buf.map(_.value).sum,
              // keep monotone: a batch of late events must not move it back
              if (batchMax.after(prev.last_seen)) batchMax else prev.last_seen)
            state.update(next)
            evictAfter.foreach(state.setTimeoutDuration)
            Iterator.single(next)
          }
      }
  }

  // ------------------------------------------------------------ B10.9

  /** Stream-stream interval join: click→purchase attribution per user
    * within `horizon`. Both sides carry watermarks and the join condition
    * bounds purchase_ts to [click_ts, click_ts + horizon], so Spark can
    * evict buffered state once the watermark passes a row's interval —
    * without the time bound the state store grows forever. Inner join, so
    * matches emit eagerly (no watermark wait); the watermark only governs
    * state cleanup. Works identically on batch inputs (unified API) —
    * the spec asserts stream output == the batch twin on the same rows.
    *
    * `joinType = "left_outer"` additionally emits never-converted clicks
    * with null purchase columns — but only once the watermark proves no
    * future purchase can still match (inner matches stay eager; the null
    * rows are inherently watermark-delayed). */
  def clickPurchaseAttribution(events: DataFrame,
      horizon: String = "30 minutes",
      watermark: String = "30 minutes",
      joinType: String = "inner"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("value"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(purchases,
      col("user_id") === col("p_user_id")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"),
      joinType)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Spark 4 `transformWithState` twin of [[runningUserStats]] — the
    * successor API to (flat)mapGroupsWithState: state lives in NAMED
    * variables (ValueState/ListState/MapState) that can evolve
    * independently, with native per-state TTL and timers instead of one
    * monolithic GroupState. Same semantics as [[runningUserStats]] so the
    * spec asserts the two implementations agree row-for-row. Requires the
    * RocksDB state-store provider (rocksdbjni ships with Spark; the default
    * HDFS-backed provider rejects this operator):
    * `spark.sql.streaming.stateStore.providerClass =
    *  ...state.RocksDBStateStoreProvider`. */
  class RunningStatsProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, UserEvent, UserStats] {
    @transient private var stats: ValueState[UserStats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stats = getHandle.getValueState[UserStats]("stats",
        org.apache.spark.sql.Encoders.product[UserStats], ttl)

    override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
        timers: TimerValues): Iterator[UserStats] = {
      val prev =
        if (stats.exists()) stats.get()
        else UserStats(userId, 0L, 0.0, new java.sql.Timestamp(0))
      val buf = rows.toSeq
      val batchMax = buf.map(_.ts).maxBy(_.getTime)
      val next = UserStats(userId,
        prev.n_events + buf.size,
        prev.total_value + buf.map(_.value).sum,
        if (batchMax.after(prev.last_seen)) batchMax else prev.last_seen)
      stats.update(next)
      Iterator.single(next)
    }
  }

  /** Declares the transformWithState plan over an event stream. `stateTtl`
    * (None = keep state forever) turns on transformWithState's NATIVE
    * per-state TTL — the declarative replacement for the manual
    * setTimeoutDuration/hasTimedOut bookkeeping in [[runningUserStats]];
    * expired state simply reads as absent on the next access. TTL is
    * wall-clock based, so it requires `TimeMode.ProcessingTime()`.
    *
    * Operational caveat (verified): under ProcessingTime time mode the
    * operator always requests another micro-batch (timers/TTL can fire at
    * any moment), so the query runs no-data batches continuously —
    * `processAllAvailable` never settles and `Trigger.AvailableNow` never
    * terminates. Callers must use a real trigger interval in production
    * and deadline-bounded sink polling in tests. */
  def runningUserStatsTws(events: Dataset[UserEvent],
      stateTtl: Option[java.time.Duration] = None): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    val (ttlConf, timeMode) = stateTtl match {
      case Some(d) => (TTLConfig(d), TimeMode.ProcessingTime())
      case None => (TTLConfig.NONE, TimeMode.None())
    }
    events.groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor(ttlConf),
        timeMode, OutputMode.Update())
  }

  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Per-user per-event-type running counts on `MapState` — the keyed state
    * variable (vs the scalar ValueState of [[RunningStatsProcessor]]): one
    * entry per event type, point-updated, so a user's state grows with
    * their distinct types, never their event count. Emits the refreshed
    * counts for just the types touched in the batch (update-mode delta). */
  class TypeCountsProcessor
      extends StatefulProcessor[Long, UserEvent, TypeCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
        timers: TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.SortedSet.empty[String]
      rows.foreach { e =>
        val cur =
          if (counts.containsKey(e.event_type)) counts.getValue(e.event_type)
          else 0L
        counts.updateValue(e.event_type, cur + 1L)
        touched += e.event_type
      }
      touched.iterator.map(t => TypeCount(userId, t, counts.getValue(t)))
    }
  }

  /** Declares the MapState type-counts plan (no timers — TimeMode.None). */
  def typeCountsTws(events: Dataset[UserEvent]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TypeCountsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  final case class SessionSummary(user_id: Long, n_events: Long,
      total_value: Double, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp)

  /** Idle-gap sessionization via transformWithState REGISTERED TIMERS — the
    * capability neither `session_window` nor TTL covers: emit a closed
    * session's summary exactly when the event-time watermark proves no
    * event can extend it. Each batch merges the user's rows into a running
    * summary, moves the user's single timer to `session_end + gap`
    * (delete + re-register), and emits nothing; `handleExpiredTimer` fires
    * once the watermark passes that horizon, emits the summary, and clears
    * the state — so state is bounded by ACTIVE sessions only.
    *
    * Unlike the ProcessingTime mode (see [[runningUserStatsTws]]),
    * EventTime mode only schedules an extra batch while the watermark
    * actually advances, so `processAllAvailable` settles normally. */
  class SessionTimerProcessor(gapMs: Long)
      extends StatefulProcessor[Long, UserEvent, SessionSummary] {
    @transient private var session: ValueState[SessionSummary] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionSummary]("session",
        org.apache.spark.sql.Encoders.product[SessionSummary], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
        timers: TimerValues): Iterator[SessionSummary] = {
      val buf = rows.toSeq
      val lo = buf.map(_.ts.getTime).min
      val hi = buf.map(_.ts.getTime).max
      val merged =
        if (session.exists()) {
          val p = session.get()
          getHandle.deleteTimer(p.session_end.getTime + gapMs)
          SessionSummary(userId, p.n_events + buf.size,
            p.total_value + buf.map(_.value).sum,
            new java.sql.Timestamp(math.min(p.session_start.getTime, lo)),
            new java.sql.Timestamp(math.max(p.session_end.getTime, hi)))
        } else {
          SessionSummary(userId, buf.size, buf.map(_.value).sum,
            new java.sql.Timestamp(lo), new java.sql.Timestamp(hi))
        }
      session.update(merged)
      getHandle.registerTimer(merged.session_end.getTime + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(userId: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionSummary] = {
      if (!session.exists()) Iterator.empty
      else {
        val out = session.get()
        session.clear()
        Iterator.single(out)
      }
    }
  }

  /** Declares the timer-driven sessionization plan. The watermark must be
    * set BEFORE the groupByKey — it is what drives timer expiry in
    * `TimeMode.EventTime`. Append mode: rows exist only when a session
    * closes. */
  def sessionizeTws(events: Dataset[UserEvent], gapMs: Long = 1800000L,
      watermark: String = "10 minutes"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  // ------------------------------------------------------------ B10.8

  /** foreachBatch parquet sink: micro-batches land as idempotent overwrite
    * partitions keyed by batch id (exactly-once at the sink). */
  def sinkToParquet(df: DataFrame, outDir: String, checkpoint: String) =
    df.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
}
