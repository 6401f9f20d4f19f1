package graft.sim

import org.apache.spark.sql.DataFrame
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

  /** End-to-end semantic dedup: train centroids (seeded Lloyd), find
    * cluster-local pairs, cluster them transitively, keep each component's
    * canonical (min-id) member. Returns the kept rows of `emb` unchanged —
    * the same schema-preserving-filter contract as [[Dedup.dedupCorpus]]. */
  def semDedupCorpus(emb: DataFrame, threshold: Double, nCentroids: Int,
      iters: Int = 5): DataFrame = {
    val centroids = Ann.kmeansCentroids(emb, nCentroids, iters)
    val drop = Dedup.clusters(semDedupPairs(emb, centroids, threshold),
        "vec_a", "vec_b")
      .filter(!col("keep")).select(col("member"))
    emb.join(drop, emb("vec_id") === drop("member"), "left_anti")
  }
}
