package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental dedup — the production pipeline shape: dedupe a NEW SHARD of
  * documents against an EXISTING corpus without re-reading the corpus text.
  * Whole-corpus dedup ([[Dedup.dedupCorpus]]) is the right tool exactly
  * once; after that, every arriving shard should pay costs proportional to
  * the SHARD, not the corpus.
  *
  * Mechanics: at corpus-build time, [[writeIndex]] persists the MinHash
  * band table (band keys are a pure function of each document —
  * [[MinHash.bandTable]] is shared with the batch self-join, so index and
  * probe can never drift) as a SLIM collision table hash-partitioned by a
  * bucket of the band-key hash, with the verify-side token sets in a
  * separate once-per-doc table (layout note on [[withBucket]]). At shard
  * time, [[dedupShard]] probes the shard's band keys against the index:
  * the equi-join carries the partition bucket, so the scan reads ONLY the
  * index partitions holding matching band keys (static IN prune,
  * plan-gated in DedupSpec), the collision shuffle carries 8-byte hashes,
  * and token arrays are fetched only for colliding candidates. At 100 TB
  * the index is the big side and this is the whole point: a shard probe's
  * heavy-column traffic is bounded by its collisions, never by the
  * corpus's token mass.
  *
  * Semantics — equal to whole-corpus dedup restricted to the shard,
  * PROVIDED every shard id is greater than every corpus id (the natural
  * monotonic-id ingestion contract; [[Dedup]]'s keep policy is min-id, so
  * corpus members always win against shard members, which is also the
  * curation-stable behavior: an already-released corpus never loses a
  * document because near-dups of it arrived later). Drop set:
  *
  *   1. shard docs whose verified Jaccard against ANY corpus doc ≥
  *      threshold (direct corpus hit);
  *   2. every member of a within-shard dup cluster containing a corpus hit
  *      (transitivity through the new docs);
  *   3. in clean (no-corpus-hit) within-shard clusters: everyone but the
  *      min id.
  *
  * Candidates on both legs use the same band keys and the same
  * exact-Jaccard verify as the batch pipeline, so the equality is exact,
  * not approximate — DedupSpec pins it against [[Dedup.dedupCorpus]] on
  * the full corpus.
  */
object IncrementalDedup {

  /** Number of on-disk hash partitions for the index: enough that a shard
    * probe prunes most of the index, few enough that directory listing
    * stays trivial. At real scale this would be sized to corpus bytes /
    * target partition size. */
  val IndexParts = 32

  /** Index LAYOUT (round 14 — measured on the full-stack curation
    * profile, where the near-dup probe was the dominant stage): TWO
    * tables instead of one.
    *
    *   path/bands  (id, band_id, bkh, pb) — SLIM collision rows: `bkh`
    *               is the 8-byte xxhash64 of the band key, replacing the
    *               r-slot key STRING, and `toks` no longer rides along.
    *               The old single-table form duplicated every document's
    *               token array once PER BAND (8×), so every probe
    *               shuffled 8 copies of the corpus's token mass; the
    *               probe-side collision join now moves ~28 bytes/row.
    *               A bkh collision between distinct band keys only
    *               CREATES A CANDIDATE, which the exact-Jaccard verify
    *               then rejects — correctness is untouched.
    *   path/toks   (id, toks, pt) — the verify payload ONCE per doc,
    *               fetched only for ids that actually collide (the
    *               candidate join is collision-bounded, never
    *               corpus-bounded). pt = id-hash bucket, for one-file-
    *               per-partition compaction.
    */
  private def withBucket(banded: DataFrame): DataFrame =
    banded
      .withColumn("bkh", xxhash64(col("band_key")))
      .withColumn("pb", pmod(col("bkh"), lit(IndexParts)).cast("int"))

  private def toksRows(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        MinHash.tokSet(col(textCol)).as("toks"))
      .withColumn("pt", pmod(xxhash64(col("id")), lit(IndexParts))
        .cast("int"))

  /** The probe-side band table `(id, toks, band_id, band_key, pb)` — a pure
    * per-row transform (no shuffle, no state), which is what makes it legal
    * on a STREAMING DataFrame too: [[graft.stream.Streaming]] builds the
    * online corpus-dup flag stream from this exact function, so batch probe
    * and stream probe can never drift. */
  private[graft] def probeBands(docs: DataFrame, idCol: String,
      textCol: String, numHashes: Int = 32, bands: Int = 8,
      shingleK: Int = 3): DataFrame =
    withBucket(MinHash.bandTable(docs, idCol, textCol, numHashes, bands,
      shingleK))

  /** Build (or rebuild) the corpus-side index: the band table partitioned
    * by band-key bucket. Contains ALL corpus docs — corpus-internal dups
    * included, since a shard doc matching ANY corpus member must drop. */
  def writeIndex(corpus: DataFrame, idCol: String, textCol: String,
      path: String, numHashes: Int = 32, bands: Int = 8,
      shingleK: Int = 3): Unit = {
    withBucket(MinHash.bandTable(corpus, idCol, textCol, numHashes, bands,
        shingleK))
      .select("id", "band_id", "bkh", "pb")
      .write.mode("overwrite").partitionBy("pb").parquet(s"$path/bands")
    toksRows(corpus, idCol, textCol)
      .write.mode("overwrite").partitionBy("pt").parquet(s"$path/toks")
  }

  /** Fold one ingested shard into the persisted index at SHARD cost — the
    * write half of the probe→drop→fold-in production loop ([[ingestShard]]),
    * closing the same loop the substring index already closes
    * ([[graft.text.SubstringDedup.appendShingleIndex]]). Band rows are a
    * pure per-document function and shards are doc-disjoint under the
    * monotonic-id ingest contract, so appending the shard's band rows under
    * its `pb=` partitions yields BYTE-THE-SAME index contents as rebuilding
    * from the union — `writeIndex(corpus)` + `appendIndex(shard)` ≡
    * `writeIndex(corpus ∪ shard)` (DedupSpec pins probe-result equality on
    * random planted-dup corpora). Pass the FULL probed shard, not just its
    * kept rows: the index contract deliberately includes internal dups
    * ([[writeIndex]] scaladoc — a later doc matching ANY earlier member
    * must drop, and transitivity through a dropped member only holds if
    * that member stays probe-able). Single writer assumed, the
    * [[graft.ops.QuantileSketch]] append discipline. */
  def appendIndex(shard: DataFrame, idCol: String, textCol: String,
      path: String, numHashes: Int = 32, bands: Int = 8,
      shingleK: Int = 3): Unit = {
    withBucket(MinHash.bandTable(shard, idCol, textCol, numHashes, bands,
        shingleK))
      .select("id", "band_id", "bkh", "pb")
      .write.mode("append").partitionBy("pb").parquet(s"$path/bands")
    toksRows(shard, idCol, textCol)
      .write.mode("append").partitionBy("pt").parquet(s"$path/toks")
  }

  /** The complete ingest step: dedupe `shard` against the index (and
    * itself), fold the shard into the index, return the kept rows. The
    * kept result is MATERIALIZED (eager localCheckpoint; cluster:
    * checkpoint) strictly BEFORE the append — [[dedupShard]] is a lazy
    * plan over the index files, and evaluating it after the append would
    * re-probe the grown index, where every shard doc now matches itself
    * (Jaccard 1) and would silently drop. */
  def ingestShard(spark: SparkSession, shard: DataFrame, idCol: String,
      textCol: String, indexPath: String, threshold: Double = 0.8,
      numHashes: Int = 32, bands: Int = 8, shingleK: Int = 3): DataFrame = {
    val kept = dedupShard(spark, shard, idCol, textCol, indexPath, threshold,
      numHashes, bands, shingleK).localCheckpoint()
    appendIndex(shard, idCol, textCol, indexPath, numHashes, bands, shingleK)
    kept
  }

  /** Shard ids with a verified near-dup in the indexed corpus. Exposed so
    * DedupSpec can plan-gate the pruning on exactly the join that reads
    * the index.
    *
    * The index scan is pruned STATICALLY to the shard's probed bucket set
    * (≤ [[IndexParts]] values — the probe's distinct `pb` list is bounded
    * by the partition count, so the driver list is trivial). Round 9
    * hardening, the [[SemDedup.corpusHits]] discipline: the previous form
    * relied on dynamic partition pruning, which Spark only inserts when
    * the probe side carries a likely-selective predicate — true for the
    * spec's filtered shard, FALSE for a bare shard read from files (the
    * normal ingest shape), which would silently scan the full index. The
    * static IN filter prunes regardless, and DPP on top is free when it
    * does fire. */
  private[graft] def corpusHits(spark: SparkSession, shard: DataFrame,
      idCol: String, textCol: String, indexPath: String, threshold: Double,
      numHashes: Int, bands: Int, shingleK: Int,
      excludeIds: Option[DataFrame] = None): DataFrame = {
    val probe = probeBands(shard, idCol, textCol, numHashes, bands, shingleK)
      .localCheckpoint()
    val buckets = probe.select("pb").distinct().collect().map(_.getInt(0)).toSeq
    val bands0 = spark.read.parquet(s"$indexPath/bands")
      .filter(col("pb").isin(buckets: _*))
    // retraction support (round 12): tombstoned corpus ids must not hit
    val bandsIdx = excludeIds.fold(bands0)(ex =>
      bands0.join(ex.select(col("id")), Seq("id"), "left_anti"))
    // 1. collision join on SLIM rows — the shuffle carries 8-byte band
    //    hashes, never token arrays; distinct (probe, corpus) pairs so a
    //    multi-band collision is verified once, not once per band
    val cand = probe
      .select(col("id").as("pid"), col("band_id"), col("bkh"), col("pb"))
      .join(bandsIdx.select(col("id").as("iid"), col("band_id"),
        col("bkh"), col("pb")), Seq("pb", "band_id", "bkh"))
      .select("pid", "iid").distinct()
    // 2. fetch the verify payload only for ids that actually collided
    //    (candidate-bounded), then the SAME exact-Jaccard verify as the
    //    batch pipeline
    val corpusToks = spark.read.parquet(s"$indexPath/toks")
    cand
      .join(corpusToks.select(col("id").as("iid"),
        col("toks").as("itoks")), Seq("iid"))
      .join(probe.select(col("id").as("pid"), col("toks"))
        .dropDuplicates("pid"), Seq("pid"))
      .select(col("pid").as("id"),
        MinHash.exactJaccard(col("toks"), col("itoks")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select("id").distinct()
  }

  /** Dedupe `shard` against the persisted index AND against itself;
    * returns the kept shard rows unchanged (schema-preserving filter, the
    * same contract as [[Dedup.dedupCorpus]]). `excludeIds` (one `id`
    * column) removes retracted corpus docs from the index side before the
    * probe — the [[graft.sim.Curation.retract]] tombstone hook. */
  def dedupShard(spark: SparkSession, shard: DataFrame, idCol: String,
      textCol: String, indexPath: String, threshold: Double = 0.8,
      numHashes: Int = 32, bands: Int = 8, shingleK: Int = 3,
      excludeIds: Option[DataFrame] = None): DataFrame = {
    val hits = corpusHits(spark, shard, idCol, textCol, indexPath, threshold,
      numHashes, bands, shingleK, excludeIds)
    val within = MinHash.nearDupPairsUnordered(shard, idCol, textCol,
      numHashes, bands, shingleK, threshold)
    // components over the within-shard graph only — corpus docs enter as a
    // per-cluster "hit" flag, not as nodes, so the fixpoint runs on
    // shard-sized data (corpus ids are all smaller, so a contaminated
    // cluster's true component min is always on the corpus side: drop all)
    val comp = Dedup.connectedComponents(within, "id_a", "id_b")
    val hitClusters = comp.join(hits, Seq("id"), "left_semi")
      .select("label").distinct()
    val dropContested = comp.join(hitClusters, Seq("label"), "left_semi")
      .select("id")
      .union(comp.join(hitClusters, Seq("label"), "left_anti")
        .filter(col("id") =!= col("label")).select("id"))
    // direct hits cover singleton shard docs that never entered the pair
    // graph; union + the anti-join dedup the overlap
    val drop = dropContested.union(hits.select("id"))
    shard.join(drop, shard(idCol) === drop("id"), "left_anti")
  }
}
