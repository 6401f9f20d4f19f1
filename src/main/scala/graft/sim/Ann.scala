package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over an embedding column —
  * SURVEY.md B9.3 scale path (IVF) next to the exact brute-force baseline.
  *
  * IVF-flat: a small deterministic centroid set partitions the corpus into
  * inverted lists; a query scores only the `nprobe` nearest lists. At scale
  * the corpus is written bucketed by `centroid_id` so a probe prunes
  * partitions instead of scanning 100 TB; here the same plan shape runs
  * in-memory. Centroid assignment is one broadcast join + arg-min — no
  * iterative k-means needed for a recall baseline (centroids are a fixed
  * sample, the classic "random centers" IVF bootstrap).
  */
object Ann {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Corpus with an IVF assignment: nearest of `nCentroids` deterministic
    * centers (the first vectors by vec_id — a fixed sample). */
  def ivfAssign(emb: DataFrame, nCentroids: Int): DataFrame = {
    val vecs = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val centroids = broadcast(vecs.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv")))
    vecs.crossJoin(centroids)
      .select(col("vec_id"), col("v"), col("centroid_id"),
        cosine(col("v"), col("cv")).as("csim"))
      .groupBy("vec_id")
      .agg(max_by(col("centroid_id"), struct(col("csim"), col("centroid_id")))
        .as("centroid_id"),
        min(col("v")).as("v")) // v constant per vec_id
  }

  /** Exact top-k by cosine against a literal probe vector. */
  def bruteTopK(emb: DataFrame, probe: Seq[Double], k: Int): DataFrame = {
    val p = typedLit(probe)
    emb.select(col("vec_id"),
        cosine(col("embedding").cast("array<double>"), p).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** IVF search: score centroids, keep nprobe lists, brute-force inside. */
  def ivfSearch(assigned: DataFrame, nCentroids: Int, nprobe: Int,
      probe: Seq[Double], k: Int): DataFrame = {
    val p = typedLit(probe)
    val probeLists = assigned
      .filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), cosine(col("v"), p).as("csim"))
      .orderBy(desc("csim"), asc("cid"))
      .limit(nprobe)
    assigned
      .join(broadcast(probeLists), col("centroid_id") === col("cid"), "left_semi")
      .select(col("vec_id"), cosine(col("v"), p).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }
}
