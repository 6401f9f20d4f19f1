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
    * centers (the first vectors by vec_id — a fixed sample). The recall
    * BASELINE; [[kmeansCentroids]] + [[ivfAssignWith]] is the refined
    * build. */
  def ivfAssign(emb: DataFrame, nCentroids: Int): DataFrame =
    ivfAssignWith(vecsOf(emb), bootstrapCentroids(vecsOf(emb), nCentroids))

  private[sim] def vecsOf(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** The fixed-sample centroid bootstrap: first `n` vectors by vec_id.
    * Sampled by RANK, not by raw id value (ADVICE r11): `vec_id < n` seeds
    * fewer than n centroids on sparse ids and none at all when ids start
    * above n. centroid_id keeps the seed's vec_id (rank order ≡ id order,
    * so downstream tie-breaks are unchanged on dense ids). */
  private[sim] def bootstrapCentroids(vecs: DataFrame, n: Int): DataFrame =
    vecs.select(col("vec_id").as("centroid_id"), col("v").as("cv"))
      .orderBy("centroid_id").limit(n)

  /** Nearest-centroid assignment against an explicit `(centroid_id, cv)`
    * table — ONE broadcast join + arg-max, the shared step of the IVF
    * bootstrap, every Lloyd iteration, and the final list build. The
    * vector rides along as a second `max_by` over the same total ordering
    * key: v is constant per vec_id so ANY row's copy is correct, and
    * max_by carries the value without ordering on it — the earlier
    * `min(col("v"))` form compared the k candidate arrays
    * LEXICOGRAPHICALLY element-by-element per vector just to pick among
    * identical copies (r7 what's-wrong item, closed round 9). */
  def ivfAssignWith(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val ord = struct(col("csim"), col("centroid_id"))
    vecs.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("centroid_id"),
        cosine(col("v"), col("cv")).as("csim"))
      .groupBy("vec_id")
      .agg(max_by(col("centroid_id"), ord).as("centroid_id"),
        max_by(col("v"), ord).as("v"))
  }

  /** Spherical k-means (Lloyd) refinement of the IVF centroid set — the
    * standard IVF build, replacing the random-sample bootstrap with
    * centroids that actually balance the inverted lists. Deterministic by
    * construction: seeded init (= the [[ivfAssign]] bootstrap sample),
    * FIXED iteration count (no data-dependent convergence check), and
    * every tie in the assignment broken by centroid_id. Each iteration is
    * one broadcast-assignment pass over the corpus plus a (k × dim)-sized
    * mean aggregation — nothing corpus-sized ever shuffles — and ends in
    * `localCheckpoint` (cluster: `checkpoint`) so lineage stays one
    * iteration deep, the same fixpoint discipline as
    * [[Dedup.connectedComponents]]. Spherical: means are renormalized to
    * unit length, matching the cosine assignment geometry. Centroids whose
    * list empties drop out (standard Lloyd degeneracy; k shrinks rather
    * than keeping a dead list). Returns `(centroid_id, cv)`. */
  def kmeansCentroids(emb: DataFrame, nCentroids: Int,
      iters: Int = 5): DataFrame = {
    val vecs = vecsOf(emb).localCheckpoint() // scanned 2×iters times
    var centroids = bootstrapCentroids(vecs, nCentroids)
    for (_ <- 1 to iters) {
      val assigned = ivfAssignWith(vecs, centroids)
      // element-wise mean per centroid: position fan-out → (k × dim)-key
      // partial-aggregated avg → rebuild the array in position order
      val means = assigned
        .select(col("centroid_id"), posexplode(col("v")))
        .groupBy("centroid_id", "pos").agg(avg("col").as("m"))
        .groupBy("centroid_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("mv"))
      centroids = means
        .select(col("centroid_id"),
          transform(col("mv"), x => x / sqrt(dot(col("mv"), col("mv"))))
            .as("cv"))
        .localCheckpoint()
    }
    centroids
  }

  /** Mean cosine of each vector to its assigned centroid — the (spherical)
    * k-means objective. Lloyd increases it monotonically; the SimSpec gate
    * asserts the refined build beats the bootstrap on it, alongside the
    * measured recall comparison. */
  def assignmentObjective(assigned: DataFrame, centroids: DataFrame): Double =
    assigned.join(broadcast(centroids), "centroid_id")
      .agg(avg(cosine(col("v"), col("cv"))))
      .head.getDouble(0)

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
    val centroids = assigned.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"))
    ivfSearchWith(assigned, centroids, nprobe, probe, k)
  }

  /** [[ivfSearch]] against an explicit centroid table (the k-means build,
    * where centroids are synthetic means, not corpus members). */
  def ivfSearchWith(assigned: DataFrame, centroids: DataFrame, nprobe: Int,
      probe: Seq[Double], k: Int): DataFrame = {
    val p = typedLit(probe)
    val probeLists = centroids
      .select(col("centroid_id").as("cid"), cosine(col("cv"), p).as("csim"))
      .orderBy(desc("csim"), asc("cid"))
      .limit(nprobe)
    assigned
      .join(broadcast(probeLists), col("centroid_id") === col("cid"), "left_semi")
      .select(col("vec_id"), cosine(col("v"), p).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** Batch IVF serving — a `(qid, pv)` probe DataFrame routed through ONE
    * candidate join instead of one driver round-trip per probe (the
    * `LexIndex.searchTopKBatch` posture). Per-qid probe lists are cut in a
    * WindowGroupLimit window over the broadcast centroid table with the
    * single-probe tie-break (csim DESC, centroid_id ASC), so each batch row
    * reproduces [[ivfSearchWith]] exactly (SimSpec pins the equivalence);
    * the candidate join keys on centroid_id, and at scale — with the corpus
    * written partitioned by centroid_id ([[SemDedup]]'s index layout) — the
    * batch's union of probe lists IS the pruned-partition set, so q probes
    * cost one scan of ≤ q·nprobe inverted lists, not q corpus scans.
    * Probes broadcast (a batch is model-sized, the corpus side is not).
    * Returns `(qid, vec_id, cosine, rank ≤ k)`. */
  def ivfSearchBatch(assigned: DataFrame, centroids: DataFrame, nprobe: Int,
      probes: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wProbe = Window.partitionBy("qid")
      .orderBy(desc("csim"), asc("centroid_id"))
    val routes = probes.crossJoin(broadcast(centroids))
      .select(col("qid"), col("pv"), col("centroid_id"),
        cosine(col("cv"), col("pv")).as("csim"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("pv"), col("centroid_id"))
    val wK = Window.partitionBy("qid").orderBy(desc("cosine"), asc("vec_id"))
    assigned.alias("c").join(broadcast(routes.alias("q")),
        col("q.centroid_id") === col("c.centroid_id"))
      .select(col("q.qid").as("qid"), col("c.vec_id").as("vec_id"),
        cosine(col("c.v"), col("q.pv")).as("cosine"))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
  }

  /** Declared IVF serving query — the ANN scale path as a first-class
    * oracled key beside the exact baseline (`sim_cosine_topk`) and the
    * binary/scalar quantizers (`sim_bq_topk`/`sim_sq_encode`). Bootstrap
    * centroids (first 16 corpus vectors by rank) rather than the k-means
    * build, because Lloyd means are float SUMS over cluster members — an
    * unspecified summation order on BOTH engines — where the bootstrap is
    * pure selection; every cosine then folds left-to-right
    * ([[VectorMath.dot]] ≡ DuckDB `list_reduce`), so the whole approximate
    * search is bit-reproducible and the oracle mirrors the ALGORITHM
    * (argmax assignment with ties to the higher centroid, nprobe=4 probe
    * list, in-list exact rank) rather than re-deriving ground truth — the
    * same mirror-the-algorithm posture as `sim_sq_encode`. nprobe=4 of 16
    * lists scans ~1/4 of the corpus; at 100 TB the corpus is written
    * partitioned by centroid_id and the probe-list cut becomes static
    * partition pruning. Recall against the exact top-k is measured in
    * SimSpec, not assumed. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ivf_topk" -> ((s, d) => {
      val emb = graft.core.Tables.embeddings(s, d)
      val probe = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      val vecs = vecsOf(emb.filter(col("vec_id") =!= 0))
      val centroids = bootstrapCentroids(vecs, 16)
      ivfSearchWith(ivfAssignWith(vecs, centroids), centroids,
        nprobe = 4, probe, k = 20)
    }))

  def oracleSql: Map[String, String] = Map(
    // mirrors the algorithm step-for-step: shared left-fold dot products
    // (bit-identical to VectorMath.dot), assignment = row_number over
    // (csim DESC, centroid_id DESC) ≡ max_by(struct(csim, centroid_id)),
    // probe list = csim DESC / cid ASC LIMIT nprobe ≡ orderBy().limit()
    "sim_ivf_topk" ->
      """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |normed AS (SELECT vec_id, v,
        |    sqrt(list_reduce(list_transform(list_zip(v, v), z -> z[1] * z[2]),
        |      (acc, x) -> acc + x)) AS norm FROM emb),
        |probe AS (SELECT v AS p, norm AS pnorm FROM normed WHERE vec_id = 0),
        |corpus AS (SELECT vec_id, v, norm FROM normed WHERE vec_id <> 0),
        |cent AS (SELECT vec_id AS centroid_id, v AS cv, norm AS cnorm
        |  FROM corpus ORDER BY vec_id LIMIT 16),
        |ascore AS (SELECT c.vec_id, c.v, c.norm, t.centroid_id,
        |    list_reduce(list_transform(list_zip(c.v, t.cv), z -> z[1] * z[2]),
        |      (acc, x) -> acc + x) / (c.norm * t.cnorm) AS csim
        |  FROM corpus c CROSS JOIN cent t),
        |asg AS (SELECT vec_id, v, norm, centroid_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY csim DESC, centroid_id DESC) AS rn FROM ascore)
        |  WHERE rn = 1),
        |plist AS (SELECT centroid_id AS cid FROM (
        |    SELECT t.centroid_id,
        |      list_reduce(list_transform(list_zip(t.cv, p.p), z -> z[1] * z[2]),
        |        (acc, x) -> acc + x) / (t.cnorm * p.pnorm) AS csim
        |    FROM cent t CROSS JOIN probe p)
        |  ORDER BY csim DESC, centroid_id ASC LIMIT 4),
        |scored AS (SELECT a.vec_id,
        |    list_reduce(list_transform(list_zip(a.v, p.p), z -> z[1] * z[2]),
        |      (acc, x) -> acc + x) / (a.norm * p.pnorm) AS cosine
        |  FROM asg a JOIN plist ON a.centroid_id = plist.cid
        |  CROSS JOIN probe p)
        |SELECT vec_id, cosine FROM scored
        |ORDER BY cosine DESC, vec_id ASC LIMIT 20""".stripMargin)

  /** IVF-candidate k-NN GRAPH — the scale path behind the declared
    * `sim_knn_graph` (which is label-blocked exact, the documented
    * fixture-honesty trade): every vector's top-k cosine neighbors drawn
    * from its `nprobe` nearest inverted lists instead of all pairs, pruned
    * in the SAME per-vector WindowGroupLimit window the declared query
    * plan-gates.
    *
    * Cost shape: the probe side carries nprobe rows per vector, the join
    * is keyed on centroid_id, and candidates ≈ n·nprobe·(n/k) pairs vs
    * C(n,2) exact — subquadratic whenever k ≫ nprobe, and k grows with the
    * corpus in an IVF build (k ~ √n is the standard sizing, giving
    * n^1.5·nprobe/√n̄ work). Each neighbor appears in exactly one inverted
    * list, so (vec_id, nbr_id) needs no dedup. Recall is measured, not
    * assumed: SimSpec gates mean recall@k vs the exact graph at two nprobe
    * settings (monotone in nprobe by construction — more lists can only
    * add candidates). */
  /** The canonical centroid-probe ordering, shared by every multi-probe
    * window in the repo (knnGraph here, the [[SemDedup]] index probes and
    * probe-rank table): descending cosine, ties to the HIGHER centroid id —
    * exactly the total order `ivfAssignWith`'s `max_by(struct(csim,
    * centroid_id))` maximizes, so rank 1 of any probe window coincides with
    * the arg-max ASSIGNMENT even on exact ties (two centroids equidistant
    * from a vector — e.g. duplicated centroids after a degenerate Lloyd
    * collapse — previously sent the assignment to the higher id but the
    * probe to the lower, an empty-partition systematic miss). */
  private[sim] def probeOrder = Seq(desc("csim"), desc("centroid_id"))

  def knnGraph(emb: DataFrame, centroids: DataFrame, nprobe: Int,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = vecsOf(emb)
    val assigned = ivfAssignWith(vecs, centroids)
    val wProbe = Window.partitionBy("vec_id").orderBy(probeOrder: _*)
    val probes = vecs.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("centroid_id"),
        cosine(col("v"), col("cv")).as("csim"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("vec_id"), col("v"), col("centroid_id"))
    val wK = Window.partitionBy("vec_id").orderBy(desc("cosine"), asc("nbr_id"))
    probes.alias("q").join(assigned.alias("c"),
        col("q.centroid_id") === col("c.centroid_id")
          && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("vec_id"), col("c.vec_id").as("nbr_id"),
        cosine(col("q.v"), col("c.v")).as("cosine"))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
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
