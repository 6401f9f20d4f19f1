package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Product quantization (PQ) — the MEMORY side of the 100 TB ANN story
  * (SURVEY.md §2 B9.39; Jégou et al. 2011, "Product quantization for
  * nearest neighbor search" — public method, re-expressed as Spark
  * relational ops).
  *
  * IVF ([[Ann]], [[SemDedup]]) bounds how much of the corpus a query
  * SCANS; PQ bounds what each scanned vector COSTS: the d-dim float
  * vector (d·4 bytes) is replaced by M sub-quantizer codes (M small
  * ints — 64·4 = 256 bytes → 8 codes at M=8, a 32× compression), and a
  * query scores a code row with M table lookups
  * ([[org.apache.spark.sql.graftexpr.PqAdcExpr]] — asymmetric distance,
  * the query side stays exact) instead of d multiplications. At 100 TB
  * that is the difference between an index that fits executor memory and
  * one that doesn't: 10¹¹ 64-dim vectors are 25.6 TB of floats but 0.8 TB
  * of M=8 codes.
  *
  * Training is per-subspace EUCLIDEAN Lloyd — deliberately not the
  * spherical variant [[Ann.kmeansCentroids]] uses for IVF routing: ADC
  * approximates ⟨q, x⟩ by ⟨q, decode(codes(x))⟩, so a codeword must
  * approximate its subvectors in the L2/inner-product sense; renormalizing
  * codewords to unit length would corrupt subvector magnitudes. Same
  * determinism discipline as the IVF build: seeded init (first K vectors
  * by vec_id), fixed iteration count, every arg-min tie broken by code id,
  * degenerate (emptied) codes drop and the table re-indexes densely.
  *
  * All heavy steps are the repo's standard shapes: assignment is one
  * broadcast join + arg-max per (vector, subspace); codebook means are a
  * (M·K·sub)-key partial aggregation; encoding shuffles M slim
  * (vec_id, m, code) rows per vector — never the vectors themselves twice.
  */
object Pq {

  import VectorMath.dot

  private def vecs(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Subspace fan-out: one (vec_id, m, sv) row per vector per subspace.
    * `sub` = d / M must divide evenly (checked by [[codebooks]]). */
  private def subvectors(v: DataFrame, mSub: Int, sub: Int): DataFrame =
    v.select(col("vec_id"), explode(sequence(lit(0), lit(mSub - 1))).as("m"),
        col("v"))
      .select(col("vec_id"), col("m"),
        slice(col("v"), (col("m") * sub + 1).cast("int"), lit(sub)).as("sv"))

  /** Arg-min L2 assignment of each (vec_id, m) subvector to its subspace's
    * codebook: argmin_c |sv − cv|² = argmax_c (⟨sv, cv⟩ − |cv|²/2) since
    * |sv|² is constant per subvector — one broadcast join + max_by, no
    * distance array materialized. Ties break to the SMALLEST code id. */
  private def assign(sv: DataFrame, cb: DataFrame): DataFrame = {
    val scored = sv.join(
        broadcast(cb.withColumn("half_cn", dot(col("cv"), col("cv")) / 2)),
        "m")
      .select(col("vec_id"), col("m"), col("sv"), col("code"),
        (dot(col("sv"), col("cv")) - col("half_cn")).as("score"))
    val ord = struct(col("score"), -col("code"))
    scored.groupBy("vec_id", "m")
      .agg(max_by(col("code"), ord).as("code"), max_by(col("sv"), ord).as("sv"))
  }

  /** Train the M per-subspace codebooks over `emb`: Euclidean Lloyd with
    * seeded init (subvectors of the first `k` vectors by vec_id), `iters`
    * fixed iterations, dense re-index at the end. Returns (m, code, cv). */
  def codebooks(emb: DataFrame, mSub: Int, k: Int, iters: Int = 3): DataFrame = {
    val v = vecs(emb)
    val dim = v.select(size(col("v"))).head().getInt(0)
    require(dim % mSub == 0, s"dim $dim must be divisible by M=$mSub")
    val sub = dim / mSub
    val sv = subvectors(v, mSub, sub).localCheckpoint() // scanned 2×iters
    var cb = sv.filter(col("vec_id") < k)
      .select(col("m"), col("vec_id").cast("int").as("code"),
        col("sv").as("cv"))
    for (_ <- 1 to iters) {
      // element-wise Euclidean mean per (subspace, code) — the Ann.kmeans
      // rebuild pattern, WITHOUT the spherical renormalization
      cb = assign(sv, cb)
        .select(col("m"), col("code"), posexplode(col("sv")))
        .groupBy("m", "code", "pos").agg(avg("col").as("mean"))
        .groupBy("m", "code")
        .agg(transform(array_sort(collect_list(struct(col("pos"),
          col("mean")))), s => s.getField("mean")).as("cv"))
        .localCheckpoint()
    }
    // dense code ids per subspace (degenerate codes may have dropped):
    // the ADC lookup table is a stride-W array, so codes must be 0..K_m-1
    val w = Window.partitionBy("m").orderBy("code")
    cb.select(col("m"), (row_number().over(w) - 1).as("code"), col("cv"))
  }

  /** Encode the corpus: (vec_id, codes) with `codes(m)` = subspace m's
    * nearest code word. The PQ index row — M ints instead of d floats. */
  def encode(emb: DataFrame, cb: DataFrame, mSub: Int): DataFrame = {
    val v = vecs(emb)
    val dim = v.select(size(col("v"))).head().getInt(0)
    val sv = subvectors(v, mSub, dim / mSub)
    assign(sv, cb)
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
        s => s.getField("code")).as("codes"))
  }

  /** The query-side flat lookup table for [[PqAdcExpr]]: lut[m·W + c] =
    * ⟨probe_m, cb_m[c]⟩, W = the widest subspace's code count (narrower
    * subspaces pad with 0.0 — unreferenced by construction, since every
    * stored code points at a real codebook row of its own subspace). */
  def lutFor(cb: DataFrame, probe: Seq[Double], mSub: Int): Seq[Double] = {
    val rows = cb.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val sub = probe.length / mSub
    val width = rows.groupBy(_._1).values.map(_.length).max
    val lut = Array.fill(mSub * width)(0.0)
    rows.foreach { case (m, c, cv) =>
      var s = 0.0
      var i = 0
      while (i < cv.length) { s += probe(m * sub + i) * cv(i); i += 1 }
      lut(m * width + c) = s
    }
    lut.toSeq
  }

  /** Approximate top-k by ADC score against a literal probe — the PQ scan:
    * M lookups per row, TakeOrderedAndProject for the k. Rank ties break
    * by vec_id, the [[Ann.bruteTopK]] convention. */
  def topK(encoded: DataFrame, cb: DataFrame, probe: Seq[Double], mSub: Int,
      k: Int): DataFrame = {
    val lut = typedLit(lutFor(cb, probe, mSub))
    encoded.select(col("vec_id"),
        org.apache.spark.sql.graftexpr.PqAdcExpr.column(col("codes"), lut)
          .as("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(k)
  }

  /** IVF × PQ — the fully composed 100 TB scan shape: IVF bounds WHAT the
    * query reads (the `nprobe` nearest inverted lists), PQ bounds what
    * each read row COSTS (M lookups). `assigned` is the corpus's
    * (vec_id, centroid_id) routing ([[Ann.ivfAssignWith]] /
    * [[SemDedup]]'s index — the SPHERICAL build; routing geometry and
    * code geometry are independent concerns). At scale the codes table is
    * written partitioned by centroid_id and the probe list becomes a
    * static partition prune (the SemDedup discipline); here the same
    * plan shape runs in-memory as a broadcast semi-join. Probe-list
    * ordering matches [[Ann.ivfSearchWith]]. */
  def ivfPqTopK(encoded: DataFrame, assigned: DataFrame,
      centroids: DataFrame, cb: DataFrame, probe: Seq[Double], mSub: Int,
      k: Int, nprobe: Int): DataFrame = {
    val p = typedLit(probe)
    val probeLists = centroids
      .select(col("centroid_id").as("cid"),
        VectorMath.cosine(col("cv"), p).as("csim"))
      .orderBy(desc("csim"), asc("cid"))
      .limit(nprobe)
    val probed = encoded
      .join(assigned.select(col("vec_id"), col("centroid_id")), "vec_id")
      .join(broadcast(probeLists), col("centroid_id") === col("cid"),
        "left_semi")
    topK(probed, cb, probe, mSub, k)
  }

  // ------------------------------------------------------------------
  // persisted IVF-PQ index — the production shape
  // ------------------------------------------------------------------
  //
  //   dir/codebooks   (m, code, cv) — the frozen PQ model
  //   dir/centroids   (centroid_id, cv) — the frozen spherical router
  //   dir/codes       (vec_id, codes) PARTITIONED by centroid_id
  //   dir/meta        one row (max_id) — monotonic-id high-water mark
  //
  // Both models are FROZEN at build time, so appends are pure functions of
  // the shard (the SemDedup/IncrementalDedup discipline) and the probe is
  // a static partition prune: the query's nprobe nearest centroids are a
  // driver-side computation over the tiny collected router, and the codes
  // scan carries `centroid_id IN (...)` — never DPP, which would
  // full-scan on this shape. Unversioned by choice: codes are DERIVED
  // data cheap to rebuild, appends mutate under the repo's single-writer
  // contract, and the atomic-publish pattern for indexes with in-place
  // readers is already demonstrated (and tested) in [[SemDedup]].

  private def mOf(cb: DataFrame): Int =
    cb.agg(max(col("m"))).head().getInt(0) + 1

  /** Train both models over `emb` and write the full index at `dir`. */
  def writeIndex(emb: DataFrame, dir: String, mSub: Int, k: Int,
      nCentroids: Int, routerIters: Int = 3, pqIters: Int = 3): Unit = {
    val cb = codebooks(emb, mSub, k, pqIters).localCheckpoint()
    val centroids = Ann.kmeansCentroids(emb, nCentroids, routerIters)
      .localCheckpoint()
    cb.coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    encodeRouted(emb, cb, centroids, mSub)
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$dir/codes")
    writeMeta(emb, dir)
  }

  private def encodeRouted(emb: DataFrame, cb: DataFrame,
      centroids: DataFrame, mSub: Int): DataFrame =
    encode(emb, cb, mSub).join(
      Ann.ivfAssignWith(vecs(emb), centroids)
        .select(col("vec_id"), col("centroid_id")),
      "vec_id")

  private def writeMeta(emb: DataFrame, dir: String): Unit =
    emb.agg(max(col("vec_id")).as("max_id")).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")

  /** Fold a new shard into the index at shard cost: encode + route against
    * the FROZEN models, append to the routed partitions. Monotonic-id
    * guard as everywhere: a replayed shard fails loudly. */
  def appendIndex(shard: DataFrame, dir: String): Unit = {
    val spark = shard.sparkSession
    val maxSeen = spark.read.parquet(s"$dir/meta").head().getLong(0)
    val bounds = shard.agg(min(col("vec_id")), max(col("vec_id"))).head()
    if (!bounds.isNullAt(0)) {
      require(bounds.getLong(0) > maxSeen,
        s"monotonic-id ingest contract violated: shard min id " +
          s"${bounds.getLong(0)} <= index high-water mark $maxSeen")
      val cb = spark.read.parquet(s"$dir/codebooks")
      val centroids = spark.read.parquet(s"$dir/centroids")
      encodeRouted(shard, cb, centroids, mOf(cb))
        .write.mode("append").partitionBy("centroid_id")
        .parquet(s"$dir/codes")
      import spark.implicits._
      Seq(bounds.getLong(1)).toDF("max_id").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/meta")
    }
  }

  /** Query the persisted index: driver-side router scoring over the tiny
    * collected centroid table → `centroid_id IN (...)` static prune of
    * the codes partitions → ADC scan. Probe-list ordering matches
    * [[ivfPqTopK]] (desc cosine, ties to the lower id). */
  def probeIndexTopK(spark: SparkSession, dir: String, probe: Seq[Double],
      k: Int, nprobe: Int): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val probed = cents.map { case (cid, cv) => (cos(probe, cv), cid) }
      .sortBy { case (c, cid) => (-c, cid) }.take(nprobe).map(_._2)
    val cb = spark.read.parquet(s"$dir/codebooks")
    val lut = typedLit(lutFor(cb, probe, mOf(cb)))
    spark.read.parquet(s"$dir/codes")
      .filter(col("centroid_id").isin(probed: _*))
      .select(col("vec_id"),
        org.apache.spark.sql.graftexpr.PqAdcExpr.column(col("codes"), lut)
          .as("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(k)
  }

  /** Mean squared quantization error |v − decode(codes(v))|² over the
    * corpus — the Lloyd objective; each fixed iteration is non-increasing,
    * the PqSpec monotonicity gate. Computed subspace-wise (the total MSE
    * is the sum of per-subspace MSEs). */
  def quantizationMse(emb: DataFrame, cb: DataFrame, mSub: Int): Double = {
    val v = vecs(emb)
    val dim = v.select(size(col("v"))).head().getInt(0)
    val sv = subvectors(v, mSub, dim / mSub)
    assign(sv, cb).join(broadcast(cb), Seq("m", "code"))
      .select((dot(col("sv"), col("sv"))
        - lit(2) * dot(col("sv"), col("cv"))
        + dot(col("cv"), col("cv"))).as("se"))
      .agg(avg("se")).head().getDouble(0)
  }
}
