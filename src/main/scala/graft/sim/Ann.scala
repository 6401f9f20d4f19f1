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

  import VectorMath.{cosine, dot}

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

  // ------------------------------------------- random-hyperplane LSH ANN

  /** Deterministic pseudo-random hyperplanes: `nTables` tables of `nBits`
    * sign bits each (seeded — identical across runs and JVMs). */
  private def hyperplanes(dim: Int, nTables: Int, nBits: Int): Seq[Seq[Seq[Double]]] = {
    val rng = new scala.util.Random(0x5eed)
    Seq.fill(nTables)(Seq.fill(nBits)(Seq.fill(dim)(rng.nextGaussian())))
  }

  /** Per-table bucket ids for a vector column: bucket = sign-bit fold of
    * the hyperplane dot products. Cosine-close vectors collide with
    * probability (1 - θ/π)^nBits per table; nTables unions the recall.
    *
    * The planes enter as ONE nested-array literal and the per-table /
    * per-bit iteration happens in `transform`/`zip_with` lambdas, so the
    * expression tree stays constant-size no matter how many tables × bits
    * are configured (the naive per-plane `when(dot…)` expansion is
    * nTables·nBits expression subtrees — 512 at the 32×16 default, which
    * cripples analysis/codegen before a single row is read). */
  def lshBuckets(v: Column, dim: Int, nTables: Int, nBits: Int): Column = {
    val planes = hyperplanes(dim, nTables, nBits)
    val bitWeights = typedLit((0 until nBits).map(b => 1L << b))
    transform(typedLit(planes), table =>
      aggregate(
        zip_with(table, bitWeights, (plane, w) =>
          when(dot(v, plane) >= 0, w).otherwise(lit(0L))),
        lit(0L), (acc, x) => acc + x))
  }

  /** LSH-bucketed ANN: candidates = vectors sharing any table bucket with
    * the probe; exact rank within candidates. The bucket explode is the
    * scale path — the corpus is written partitioned by (table, bucket) and
    * a probe touches nTables partitions instead of everything. */
  def lshSearch(emb: DataFrame, probe: Seq[Double], k: Int,
      nTables: Int = 8, nBits: Int = 6): DataFrame = {
    val dim = probe.length
    val vecs = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val bucketed = vecs
      .select(col("vec_id"), col("v"),
        posexplode(lshBuckets(col("v"), dim, nTables, nBits)))
      .withColumnRenamed("pos", "table_id")
      .withColumnRenamed("col", "bucket")
    val probeBuckets = hyperplanes(dim, nTables, nBits).zipWithIndex.map {
      case (table, t) =>
        val b = table.zipWithIndex.map { case (plane, bit) =>
          if (plane.zip(probe).map { case (a, x) => a * x }.sum >= 0) 1L << bit
          else 0L
        }.sum
        (t, b)
    }
    val probeDf = broadcast(
      emb.sparkSession.createDataFrame(probeBuckets)
        .toDF("table_id", "bucket"))
    val p = typedLit(probe)
    bucketed.join(probeDf, Seq("table_id", "bucket"), "left_semi")
      .select(col("vec_id"), col("v")).dropDuplicates("vec_id")
      .select(col("vec_id"), cosine(col("v"), p).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** LSH candidate pairs: vectors sharing at least one (table, bucket),
    * each unordered pair once, cosine NOT yet verified. Exposed separately
    * from [[lshNearDupPairs]] so tests can assert candidate volume — the
    * quantity that decides whether the op is subquadratic. A random pair
    * collides with probability ≈ nTables · 2^-nBits, so the defaults
    * (32 tables × 16 bits) admit ~0.05% of all pairs; a near pair at angle
    * θ collides with 1 - (1 - (1-θ/π)^nBits)^nTables — ≈0.94 at cosine 0.9,
    * ≈1 for exact duplicates. Sign-bit LSH only separates at genuinely-near
    * thresholds (cosine ≳ 0.85): round 2 declared this op at cosine 0.4
    * (θ≈66°) with 4-bit tables, where 64% of ALL pairs collide — an
    * all-pairs join in disguise, ~10,000× slower at 100× the data. That
    * regime is not LSH-servable; use the exact blocked variant there. */
  def lshCandidatePairs(emb: DataFrame, dim: Int,
      nTables: Int = 32, nBits: Int = 16): DataFrame = {
    val vecs = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val bucketed = vecs
      .select(col("vec_id"), col("v"),
        posexplode(lshBuckets(col("v"), dim, nTables, nBits)))
      .withColumnRenamed("pos", "table_id")
      .withColumnRenamed("col", "bucket")
    bucketed.alias("a").join(bucketed.alias("b"),
        col("a.table_id") === col("b.table_id")
          && col("a.bucket") === col("b.bucket")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("a.v").as("va"),
        col("b.vec_id").as("vec_b"), col("b.v").as("vb"))
      // a close pair collides in several tables — one candidate per pair
      .dropDuplicates("vec_a", "vec_b")
  }

  /** LSH-bucketed near-duplicate PAIR generation — the 100 TB path for
    * embedding dedup: [[lshCandidatePairs]] + exact cosine verification,
    * which keeps precision 1; the only approximation is candidate recall
    * (see the collision math above). Contrast with label-blocked all-pairs
    * (the oracle-declared `dedup_near_embedding`): that is exact but its
    * per-block pair count grows quadratically with corpus size, while
    * these buckets subdivide as the corpus grows. Same shape as
    * [[lshSearch]] but self-joined on the bucket key instead of probed. */
  def lshNearDupPairs(emb: DataFrame, dim: Int, threshold: Double,
      nTables: Int = 32, nBits: Int = 16): DataFrame =
    lshCandidatePairs(emb, dim, nTables, nBits)
      .select(col("vec_a"), col("vec_b"),
        cosine(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("vec_a", "vec_b")
}
