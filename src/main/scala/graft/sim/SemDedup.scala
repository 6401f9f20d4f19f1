package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication — SURVEY.md §2 B9.29 (round 8).
  *
  * The published shape ("SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication", Abbas et al. 2023): k-means-cluster the
  * embedding space, then look for near-duplicate pairs ONLY within each
  * cluster — the embedding twin of the MinHash→components pipeline
  * ([[Dedup.dedupCorpus]]), with the cluster assignment playing the role of
  * the LSH band. Composes the pieces this repo already tests:
  * [[Ann.kmeansCentroids]] (seeded, fixed-iteration spherical Lloyd) +
  * [[Ann.ivfAssignWith]] (one broadcast join + arg-max) +
  * [[Dedup.clusters]] (transitive components, min-id representative).
  *
  * Scale story: the only quadratic term is per-cluster — Σ C(n_c, 2) ≈
  * n²/(2k) for k balanced clusters vs C(n, 2) exact, and k grows with the
  * corpus in a real build (k ~ √n sizing ⇒ per-cluster cost ~ n, total
  * ~ n^1.5), while the cluster-keyed self-join shuffles each vector once.
  * The documented trade (same as the paper's): a near-dup pair straddling
  * a cluster boundary is missed — exact-direction duplicates CANNOT
  * straddle (cosine is scale-invariant, so a duplicate scores identically
  * against every centroid and the deterministic arg-max assigns both ends
  * to the same cluster), which is what the planted-equality test pins;
  * noisy near-dups near a boundary are the recall price, bought down with
  * more Lloyd iterations or multi-assignment, never paid in precision
  * (the within-cluster verify is exact cosine). */
object SemDedup {

  import VectorMath.cosine

  /** Within-cluster candidate pairs (NO threshold yet) — exposed separately
    * so tests can measure the candidate volume, the quantity that decides
    * whether the op is subquadratic (the [[Ann.lshCandidatePairs]]
    * discipline). One row per unordered pair sharing a cluster. */
  def clusterCandidatePairs(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val assigned = Ann.ivfAssignWith(Ann.vecsOf(emb), centroids)
    assigned.alias("a").join(assigned.alias("b"),
        col("a.centroid_id") === col("b.centroid_id")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("a.v").as("va"),
        col("b.vec_id").as("vec_b"), col("b.v").as("vb"))
  }

  /** Semantic near-duplicate pairs: cluster-local candidates verified by
    * exact cosine ≥ threshold. Precision 1; recall bounded by the
    * boundary-straddle trade documented above. */
  def semDedupPairs(emb: DataFrame, centroids: DataFrame,
      threshold: Double): DataFrame =
    clusterCandidatePairs(emb, centroids)
      .select(col("vec_a"), col("vec_b"),
        cosine(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= threshold)

  /** [[semDedupCorpus]] against an EXPLICIT centroid set — the form the
    * incremental path is proven against (the centroids there are frozen at
    * index-build time, so the equality statement needs both sides clustered
    * by the same centroid table). */
  def semDedupCorpusWith(emb: DataFrame, centroids: DataFrame,
      threshold: Double): DataFrame = {
    val drop = Dedup.clusters(semDedupPairs(emb, centroids, threshold),
        "vec_a", "vec_b")
      .filter(!col("keep")).select(col("member"))
    emb.join(drop, emb("vec_id") === drop("member"), "left_anti")
  }

  /** End-to-end semantic dedup: train centroids (seeded Lloyd), find
    * cluster-local pairs, cluster them transitively, keep each component's
    * canonical (min-id) member. Returns the kept rows of `emb` unchanged —
    * the same schema-preserving-filter contract as [[Dedup.dedupCorpus]]. */
  def semDedupCorpus(emb: DataFrame, threshold: Double, nCentroids: Int,
      iters: Int = 5): DataFrame =
    semDedupCorpusWith(emb, Ann.kmeansCentroids(emb, nCentroids, iters),
      threshold)

  // ------------------------------------------------------------------
  // incremental form: probe a persisted cluster-partitioned index
  // ------------------------------------------------------------------

  /** Build the persisted semantic-dedup index at `path` — the embedding
    * modality's twin of [[IncrementalDedup.writeIndex]] (B9.32, round 9):
    *
    *  - `path/centroids`: the trained (centroid_id, cv) table, frozen.
    *    Re-training means re-partitioning the whole index, so centroids
    *    are fixed at build time — the standard IVF serving shape; a
    *    periodic rebuild absorbs drift.
    *  - `path/assigned`: every corpus vector with its cluster assignment,
    *    PARTITIONED ON DISK by `centroid_id`. At 100 TB this layout is the
    *    whole point: a shard probe touches only the partitions of the
    *    clusters its own vectors fall in, never the full corpus.
    *
    * Assignment runs against the READ-BACK centroids, not the in-memory
    * ones, so index and every later probe see byte-identical centroid
    * doubles (parquet round-trips IEEE754 exactly; the guard is against a
    * future re-train racing the write). Corpus-internal near-dups stay in
    * the index — a shard doc matching ANY corpus member must drop, same
    * contract as the MinHash index. */
  def writeIndex(corpus: DataFrame, path: String, nCentroids: Int,
      iters: Int = 5): Unit = {
    val spark = corpus.sparkSession
    Ann.kmeansCentroids(corpus, nCentroids, iters)
      .write.mode("overwrite").parquet(s"$path/centroids")
    Ann.ivfAssignWith(Ann.vecsOf(corpus),
        spark.read.parquet(s"$path/centroids"))
      .withColumn("centroid_id", col("centroid_id").cast("int"))
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$path/assigned")
  }

  /** The frozen centroid table of the index at `path`. */
  def indexCentroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/centroids")

  /** Shard ids with a verified (exact-cosine) near-dup in the indexed
    * corpus. Exposed so SemDedupSpec can plan-gate the partition pruning
    * on exactly the join that reads the index.
    *
    * The index scan is pruned STATICALLY to the shard's probed cluster
    * set: the distinct assigned centroid ids (≤ the centroid count — a
    * table that is broadcast-sized by construction, so the driver list is
    * k-bounded, the [[graft.ops.QuantileSketch]] day-probe precedent)
    * become an IN filter on the partition column, visible as
    * `PartitionFilters` on the scan. Dynamic partition pruning is NOT
    * relied on deliberately: Spark only inserts it when the probe side
    * carries a likely-selective predicate, so an unfiltered shard — the
    * normal ingest shape — would silently scan the FULL index (measured
    * on this very plan). The probe is checkpointed once and reused for
    * the cluster list and the join, and its key is cast to the index's
    * inferred partition type so the scan side compares the bare partition
    * attribute. Shard cost ∝ shard at 100 TB. */
  private[sim] def corpusHits(spark: SparkSession, shard: DataFrame,
      path: String, threshold: Double): DataFrame =
    corpusDupFlags(spark, shard, path, threshold)
      .select(col("vec_id").as("id")).distinct()

  /** The flag-emitting form of the index probe: one
    * `(vec_id, dup_of, cosine)` row per shard vector × corpus vector pair
    * with cosine ≥ threshold inside the shard vector's assigned cluster —
    * the embedding analog of the MinHash probe's `(doc_id, dup_of,
    * jaccard)` flags, shared verbatim by the streaming twin
    * ([[graft.stream.Streaming]] `streamSemDupFlags`) so batch and stream
    * cannot drift. [[corpusHits]] reduces these flags to distinct shard
    * ids for the dedup verdict. */
  def corpusDupFlags(spark: SparkSession, shard: DataFrame,
      path: String, threshold: Double): DataFrame = {
    val probe = Ann.ivfAssignWith(Ann.vecsOf(shard),
        indexCentroids(spark, path))
      .withColumn("centroid_id", col("centroid_id").cast("int"))
      .localCheckpoint()
    val probed = probe.select("centroid_id").distinct()
      .collect().map(_.getInt(0)).toSeq
    // no broadcast hint on the probe: a daily shard can be GBs of vectors
    // (forcing it driver-side would OOM at scale), and the checkpointed
    // probe has size stats, so AQE broadcasts exactly when it actually
    // fits — the static partition prune above is independent of the join
    // strategy either way
    val index = spark.read.parquet(s"$path/assigned")
      .filter(col("centroid_id").isin(probed: _*))
    probe.alias("p").join(index.alias("i"),
        col("p.centroid_id") === col("i.centroid_id"))
      .select(col("p.vec_id").as("vec_id"), col("i.vec_id").as("dup_of"),
        cosine(col("p.v"), col("i.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** k-NN neighbors of a NEW SHARD drawn from the persisted index — the
    * incremental form of [[Ann.knnGraph]] (maintain a corpus k-NN graph
    * as data arrives: new vectors get their neighbor lists at shard cost
    * instead of re-running the whole-corpus build). Each shard vector's
    * candidates are its `nprobe` nearest frozen centroids' inverted
    * lists, read partition-pruned from the cluster-partitioned index
    * (the [[corpusDupFlags]] static-prune discipline), then ranked in
    * the same per-vector WindowGroupLimit window as every other k-NN
    * path. Returns (vec_id, nbr_id, cosine, rank). Recall follows the
    * batch IVF trade (more nprobe, more recall — monotone by
    * construction); SemDedupSpec gates it against the exact
    * shard-vs-corpus graph. */
  def knnShard(spark: SparkSession, shard: DataFrame, path: String,
      nprobe: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = indexCentroids(spark, path)
    val wProbe = Window.partitionBy("vec_id")
      .orderBy(desc("csim"), asc("centroid_id"))
    val probes = Ann.vecsOf(shard).crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("centroid_id"),
        cosine(col("v"), col("cv")).as("csim"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("vec_id"), col("v"),
        col("centroid_id").cast("int").as("centroid_id"))
      .localCheckpoint()
    val probed = probes.select("centroid_id").distinct()
      .collect().map(_.getInt(0)).toSeq
    val index = spark.read.parquet(s"$path/assigned")
      .filter(col("centroid_id").isin(probed: _*))
    val wK = Window.partitionBy("vec_id").orderBy(desc("cosine"), asc("nbr_id"))
    probes.alias("q").join(index.alias("c"),
        col("q.centroid_id") === col("c.centroid_id"))
      .select(col("q.vec_id").as("vec_id"), col("c.vec_id").as("nbr_id"),
        cosine(col("q.v"), col("c.v")).as("cosine"))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
  }

  /** Dedupe `shard` against the persisted index AND against itself;
    * returns the kept shard rows unchanged (schema-preserving filter).
    * Semantics equal whole-corpus [[semDedupCorpusWith]] over
    * corpus ∪ shard under the index's frozen centroids, restricted to the
    * shard, PROVIDED every shard id exceeds every corpus id (the
    * monotonic-id ingest contract — min-id keep means corpus members
    * always win, so corpus verdicts never change): the drop classes and
    * the transitivity argument are [[IncrementalDedup.dedupShard]]'s,
    * verbatim — direct corpus hits, whole within-shard clusters containing
    * a hit, and non-min members of clean within-shard clusters. The
    * boundary-straddle recall trade is the batch one (scaladoc above) and
    * cannot split an exact-direction duplicate, which is what keeps the
    * SemDedupSpec equality exact. */
  def semDedupShard(spark: SparkSession, shard: DataFrame, path: String,
      threshold: Double): DataFrame = {
    val hits = corpusHits(spark, shard, path, threshold)
    val within = semDedupPairs(shard, indexCentroids(spark, path), threshold)
      .select("vec_a", "vec_b")
    val comp = Dedup.connectedComponents(within, "vec_a", "vec_b")
    val hitClusters = comp.join(hits, Seq("id"), "left_semi")
      .select("label").distinct()
    val dropContested = comp.join(hitClusters, Seq("label"), "left_semi")
      .select("id")
      .union(comp.join(hitClusters, Seq("label"), "left_anti")
        .filter(col("id") =!= col("label")).select("id"))
    val drop = dropContested.union(hits.select("id"))
    shard.join(drop, shard("vec_id") === drop("id"), "left_anti")
  }
}
