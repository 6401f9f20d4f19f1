package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{IndexLifecycle, Meta, Versioned}

/** Persisted 63-bit fingerprint near-dup index — the production triple
  * (persisted index / shard probe at shard cost / streaming twin) for the
  * FINGERPRINT dedup modality, completing the story the other modalities
  * already have (MinHash: [[IncrementalDedup]], substring:
  * [[graft.text.SubstringDedup]], semantic: [[SemDedup]], codes: [[Pq]]).
  *
  * Generic over what the 63 bits mean: the text SimHash
  * ([[SimHash.simhash]]), the perceptual image dHash
  * ([[graft.multimodal.Multimodal.imageDHash]]), and the gain-invariant
  * audio envelope hash ([[Multimodal.audioEnvHash]]) all reduce a row to
  * ONE long, and from there near-dup detection is the same relational
  * shape — so one index serves every modality that fingerprints this way.
  * In particular this is what makes IMAGE/AUDIO dedup a first-class
  * production loop, not just a batch join: ingest a day of images, probe
  * 8 bytes/row against the corpus, fold survivors in.
  *
  * Index rows are [[SimHash.blockTable]]'s pigeonhole blocks — the SAME
  * function the batch self-join uses, so index and probe cannot drift —
  * hash-partitioned on disk by a bucket of (blk, bval). A shard probe
  * statically prunes the index scan to its own bucket set (≤ [[IndexParts]]
  * values — a trivial driver list; the [[IncrementalDedup.corpusHits]]
  * discipline: static IN beats relying on DPP, which needs a selective
  * probe predicate to fire). Recall stays GUARANTEED at ≤ maxHamming by
  * the pigeonhole argument; precision 1 by the exact Hamming verify.
  *
  * Layout (under [[graft.core.Versioned]]'s atomic `_CURRENT` publish):
  * `v<N>/blocks/pb=…` block rows, `v<N>/meta` (max_hamming frozen at
  * build + monotonic-id high-water mark). Appends mutate the current
  * version under the single-writer contract; compaction republishes.
  *
  * RADIUS SIZING AT SCALE: guaranteed recall forces maxHamming+1 blocks
  * of 63/(maxHamming+1) bits, so expected candidates per probe row are
  * (maxHamming+1) · n / 2^(63/(maxHamming+1)) — radius 3 (4 blocks of
  * ≥ 15 bits — the Manku et al. 2007 web-dedup configuration) costs ~30
  * candidates/probe per million indexed rows; radius 8 (9 blocks of 7
  * bits) collapses above ~100k rows and is for small corpora or
  * post-filtering a wider radius. [[graft.FpVolume]] measures the
  * radius-3 configuration at a million rows with planted ground truth.
  */
object FpIndex {

  /** On-disk hash partitions — the IncrementalDedup sizing argument. */
  val IndexParts = 32

  private def withBucket(blocks: DataFrame): DataFrame =
    blocks.withColumn("pb",
      pmod(xxhash64(col("blk"), col("bval")), lit(IndexParts)).cast("int"))

  /** Probe/index rows for a fingerprint table (id, fp): blocks + bucket.
    * Pure per-row transform — legal on streaming frames too. */
  private[sim] def blockRows(fps: DataFrame, maxHamming: Int): DataFrame =
    withBucket(SimHash.blockTable(fps, maxHamming))

  private val Blocks = IndexLifecycle.Table("blocks", "pb")

  private def writeMeta(spark: SparkSession, root: String,
      maxHamming: Int, maxId: Long): Unit = {
    import spark.implicits._
    // crash-safe retire-then-replace publish (core/Meta, ADVICE r12)
    Meta.write(Seq((maxHamming, maxId)).toDF("max_hamming", "max_id"), root)
  }

  private def readMeta(spark: SparkSession, root: String): (Int, Long) = {
    val r = Meta.read(spark, root).head()
    (r.getInt(0), r.getLong(1))
  }

  /** Build and PUBLISH the index from a corpus fingerprint table
    * (id, fp). Contains ALL corpus rows — internal dups included, since a
    * shard row matching ANY corpus member must flag. */
  def writeIndex(fps: DataFrame, dir: String, maxHamming: Int = 8): Unit = {
    val spark = fps.sparkSession
    val maxId = fps.agg(coalesce(max(col("id").cast("long")), lit(-1L)))
      .head().getLong(0)
    // an empty corpus would publish a blocks dir Spark cannot re-read
    // (no footer to infer a schema from) — refuse loudly instead of
    // letting the first probe fail obscurely
    require(maxId >= 0L, "refusing to publish an EMPTY fingerprint index")
    IndexLifecycle.publishVersion(spark, dir) { root =>
      IndexLifecycle.writeTable(blockRows(fps, maxHamming), root, Blocks)
      writeMeta(spark, root, maxHamming, maxId)
    }
  }

  /** TOMBSTONE corpus ids — the takedown path ([[Pq.retract]]'s shape for
    * the fingerprint modality: a removed image/document must stop
    * influencing future dup verdicts). Probes exclude tombstoned rows
    * immediately; [[compactIndex]] makes the drop physical and starts the
    * new version with a clean tombstone set. Idempotent at id granularity
    * (the exclusion reads DISTINCT ids — a replayed takedown changes
    * nothing); the high-water mark does NOT rewind, so a retracted id
    * stays burned and equivalent new content takes a fresh id. */
  def retract(spark: SparkSession, dir: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    if (ids.nonEmpty) {
      val root = Versioned.resolveRoot(spark, dir)
      IndexLifecycle.appendTombstones(ids.toDF("id"), root)
    }
  }

  /** The block table minus tombstoned rows — the single read path every
    * probe shares. The anti-join appears only when a tombstone set
    * exists, so the takedown-free plan keeps its spec-pinned pruned-scan
    * shape. */
  private def liveBlocks(spark: SparkSession, root: String): DataFrame =
    IndexLifecycle.liveRows(spark, root, Blocks, "id")

  /** Verified shard-vs-corpus near-dup pairs: (id, corpus_id, hamming)
    * with hamming ≤ the index's frozen maxHamming. Probe BEFORE append
    * (the ingest discipline — after the fold-in every shard row matches
    * itself). The index scan is statically pruned to the shard's bucket
    * set; recall is guaranteed by the shared pigeonhole blocking. */
  def probe(spark: SparkSession, shardFps: DataFrame,
      dir: String): DataFrame = {
    val root = Versioned.resolveRoot(spark, dir)
    val (maxHamming, _) = readMeta(spark, root)
    val p = blockRows(shardFps, maxHamming).localCheckpoint()
    val buckets = p.select("pb").distinct().collect().map(_.getInt(0)).toSeq
    val index = liveBlocks(spark, root)
      .filter(col("pb").isin(buckets: _*))
    p.alias("p").join(index.alias("i"),
        col("p.pb") === col("i.pb")
          && col("p.blk") === col("i.blk")
          && col("p.bval") === col("i.bval"))
      .select(col("p.id").as("id"), col("i.id").as("corpus_id"),
        SimHash.hamming(col("p.fp"), col("i.fp")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id", "corpus_id")
  }

  /** Distinct shard ids with ANY verified corpus near-dup — the online
    * contamination-flag shape ([[graft.stream.Streaming]] replays this
    * per micro-batch). */
  def corpusDupFlags(spark: SparkSession, shardFps: DataFrame,
      dir: String): DataFrame =
    probe(spark, shardFps, dir).select("id").distinct()

  /** Fold a shard's fingerprints into the published index at shard cost.
    * Monotonic-id guard as everywhere: a replayed shard fails loudly.
    * Same honest crash-window note as [[Pq.appendIndex]]: blocks append
    * and meta advance are two commits; recover a between-crash by
    * compacting or rebuilding. */
  def appendIndex(shardFps: DataFrame, dir: String): Unit = {
    val spark = shardFps.sparkSession
    val root = Versioned.resolveRoot(spark, dir)
    val (maxHamming, maxSeen) = readMeta(spark, root)
    val bounds = shardFps.agg(min(col("id").cast("long")),
      max(col("id").cast("long"))).head()
    if (!bounds.isNullAt(0)) {
      IndexLifecycle.requireMonotonic(bounds.getLong(0), maxSeen, "id")
      IndexLifecycle.appendTable(blockRows(shardFps, maxHamming), root,
        Blocks)
      writeMeta(spark, root, maxHamming, bounds.getLong(1))
    }
  }

  /** Dedupe a shard of fingerprints against the index AND within itself —
    * the drop classes verbatim from [[IncrementalDedup.dedupShard]]:
    * (1) shard rows with a verified corpus near-dup; (2) every member of a
    * within-shard cluster containing a corpus hit (transitivity through
    * the new rows); (3) in clean within-shard clusters, everyone but the
    * min id. Under monotonic ids this EQUALS whole-corpus fingerprint
    * dedup (min-id keep over [[SimHash.nearDupPairsByFp]] clusters)
    * restricted to the shard — and unlike the MinHash modality the
    * equality needs no recall caveat: the pigeonhole blocking guarantees
    * every ≤ maxHamming pair surfaces on both legs. Returns kept rows. */
  def dedupShard(spark: SparkSession, shardFps: DataFrame,
      dir: String): DataFrame = {
    val root = Versioned.resolveRoot(spark, dir)
    val (maxHamming, _) = readMeta(spark, root)
    val hits = probe(spark, shardFps, dir).select("id").distinct()
    val within = SimHash.nearDupPairsByFp(shardFps, maxHamming)
    val comp = Dedup.connectedComponents(within, "id_a", "id_b")
    val hitClusters = comp.join(hits, Seq("id"), "left_semi")
      .select("label").distinct()
    val dropContested = comp.join(hitClusters, Seq("label"), "left_semi")
      .select("id")
      .union(comp.join(hitClusters, Seq("label"), "left_anti")
        .filter(col("id") =!= col("label")).select("id"))
    val drop = dropContested.union(hits)
    shardFps.join(drop, Seq("id"), "left_anti")
  }

  /** The complete ingest step — probe → drop → fold-in: dedupe the shard
    * (against the corpus and itself), fold ALL shard rows in (the index
    * contract deliberately includes internal dups — a later row matching
    * ANY earlier member must flag, and transitivity through a dropped
    * member only holds if it stays probe-able), return the kept rows.
    * Kept rows are MATERIALIZED before the append — the probe is a lazy
    * plan over the index files, and evaluating it afterwards would
    * re-probe the grown index where every shard row matches itself. */
  def ingestShard(spark: SparkSession, shardFps: DataFrame,
      dir: String): DataFrame = {
    val kept = dedupShard(spark, shardFps, dir).localCheckpoint()
    appendIndex(shardFps, dir)
    kept
  }

  /** Compact into a freshly PUBLISHED version: every append lands one
    * file set per `pb=` partition, so after S shards a pruned probe opens
    * O(S) small files; the rewrite leaves ONE file per partition, DROPS
    * tombstoned rows physically (the new version starts with a clean
    * tombstone set — verdicts identical because probes already excluded
    * them), carries the meta (high-water mark included), and flips the
    * pointer LAST — probes see the old version or the new, never a mix. */
  def compactIndex(spark: SparkSession, dir: String): Unit = {
    val old = Versioned.resolveRoot(spark, dir)
    val (maxHamming, maxId) = readMeta(spark, old)
    IndexLifecycle.publishVersion(spark, dir) { root =>
      IndexLifecycle.compactTable(liveBlocks(spark, old), root, Blocks)
      writeMeta(spark, root, maxHamming, maxId)
    }
  }
}
