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
    * fixed iterations, dense re-index at the end. Returns (m, code, cv).
    *
    * Training runs on at most ~`maxTrain` rows — the standard PQ
    * production practice (Lloyd over the full corpus is neither possible
    * at 10¹¹ rows nor useful: codebook quality saturates long before) —
    * selected by a DETERMINISTIC hash of vec_id, so the frozen-model
    * discipline is untouched: same corpus → same sample → same
    * codebooks, and re-sharding cannot change them. ENCODING still
    * covers every row; only the Lloyd iterations see the sample. Corpora
    * at or under the cap train exactly as before. */
  def codebooks(emb: DataFrame, mSub: Int, k: Int, iters: Int = 3,
      maxTrain: Long = 200000L): DataFrame = {
    val v0 = vecs(emb)
    val dim = v0.select(size(col("v"))).head().getInt(0)
    require(dim % mSub == 0, s"dim $dim must be divisible by M=$mSub")
    val sub = dim / mSub
    val n = v0.count()
    // ceiling divisor (ADVICE r12): floor + 1 halved the sample right
    // past the cap (n = maxTrain+1 → divisor 2 → ~n/2 rows instead of
    // ~maxTrain); ceil keeps the expected sample near maxTrain across
    // the boundary
    val v = if (n <= maxTrain) v0
      else v0.filter(
        pmod(xxhash64(col("vec_id")),
          lit((n + maxTrain - 1) / maxTrain)) === 0)
    val sv = subvectors(v, mSub, sub).localCheckpoint() // scanned 2×iters
    // seed by RANK, not by raw id value (ADVICE r11): `vec_id < k` seeds
    // fewer than k codes on sparse ids and an EMPTY codebook when ids
    // start above k. The first-k-by-vec_id sample is k-bounded, so the
    // rank window runs on ≤k rows.
    val seeds = v.select("vec_id").orderBy("vec_id").limit(k)
      .withColumn("code",
        (row_number().over(Window.orderBy("vec_id")) - 1).cast("int"))
    require(seeds.limit(1).count() > 0,
      "cannot train PQ codebooks over an empty corpus")
    var cb = sv.join(broadcast(seeds), "vec_id")
      .select(col("m"), col("code"), col("sv").as("cv"))
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
    require(probe.length % mSub == 0,
      s"probe dim ${probe.length} is not divisible by M=$mSub — the probe " +
        "does not match the trained codebooks")
    val rows = cb.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val sub = probe.length / mSub
    rows.headOption.foreach { case (_, _, cv) =>
      require(cv.length == sub,
        s"probe subvector width $sub != codeword width ${cv.length} — " +
          "probe dimension does not match the trained codebooks")
    }
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

  /** Per-vector ADC lookup tables built RELATIONALLY — the many-probe
    * form of [[lutFor]] (that one collects nothing but the codebooks and
    * serves a single driver-side query; this one serves a whole SHARD of
    * probe vectors, e.g. the PQ-accelerated semantic-dedup probe,
    * [[SemDedup.corpusDupFlags]] with a margin). One slim
    * (vec_id, slot, val) row per (probe, subspace, code) — the vector
    * payload fans out as `sub`-wide slices, never whole — map-assembled
    * into the same zero-padded stride-`width` flat array [[lutFor]]
    * builds. Returns (vec_id, lut). */
  def lutTable(v: DataFrame, cb: DataFrame, mSub: Int,
      width: Int): DataFrame = {
    val dim = v.select(size(col("v"))).head().getInt(0)
    require(dim % mSub == 0, s"dim $dim must be divisible by M=$mSub")
    val sub = dim / mSub
    // MAP-ONLY (round 12, third form): the codebook is a frozen k-bounded
    // model, so it rides driver-side into a flat slot-major literal
    // (dropped degenerate codes stay zero — dot with a zero codeword is
    // the 0.0 the old pad encoded) and each probe row builds its whole
    // LUT in place via the codegen'd `pq_lut` loop. The history is the
    // measurement trail: form 1 (map_from_entries + element_at per slot)
    // was O(width²) per probe — 987 s at the volume scale; form 2
    // (subvector explode ⋈ broadcast cb, groupBy collect back) fixed the
    // arithmetic but still shuffled probes × M × K slim rows (92M at the
    // volume scale) to assemble arrays; this form is the same d·W
    // multiplications with NO exchange at all — at 100 TB the LUT is
    // born inside the scan stage that reads the probes.
    val flat = new Array[Double](mSub * width * sub)
    cb.select("m", "code", "cv").collect().foreach { r =>
      val cw = r.getSeq[Double](2)
      require(cw.length == sub,
        s"codeword dim ${cw.length} != probe subvector dim $sub")
      val base = (r.getInt(0) * width + r.getInt(1)) * sub
      var j = 0
      while (j < sub) { flat(base + j) = cw(j); j += 1 }
    }
    v.select(col("vec_id"),
      org.apache.spark.sql.graftexpr.PqLutExpr.column(
        col("v"), typedLit(flat.toSeq), lit(mSub)).as("lut"))
  }

  /** The stride of [[lutTable]]/[[lutFor]] arrays for `cb`: the widest
    * subspace's code count. */
  def lutWidth(cb: DataFrame): Int =
    cb.groupBy("m").count().agg(max(col("count"))).head().getLong(0).toInt

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
  // residual encoding (IVFADC) — the quality half of the PQ story
  // ------------------------------------------------------------------
  //
  // Raw PQ quantizes the vectors themselves; at M=8 on structureless data
  // that floor is ~0.30 recall@10 (PqSpec's measured worst case). The
  // published IVFADC (Jégou et al. 2011 §IV) quantizes each vector's
  // RESIDUAL x − c(x) against its routed IVF centroid instead: residual
  // magnitudes are a fraction of vector magnitudes, so the same M·K code
  // budget spends its resolution on the part of x the router doesn't
  // already explain. Scoring decomposes exactly:
  //
  //   ⟨q, x⟩ = ⟨q, c(x)⟩ + ⟨q, x − c(x)⟩ ≈ ⟨q, c(x)⟩ + ADC(codes(x))
  //
  // — the first term is a per-probed-centroid constant (nprobe driver-side
  // dot products, attached as a tiny literal map / broadcast column), the
  // second the usual M lookups. One SHARED codebook set over all residuals
  // (the paper's memory-efficient variant), so the LUT is built once per
  // query, not once per probed list.

  /** (vec_id, embedding, centroid_id): each vector's residual against its
    * arg-max routed centroid — the IVFADC training/encoding input. */
  def residualsRouted(emb: DataFrame, centroids: DataFrame): DataFrame =
    Ann.ivfAssignWith(vecs(emb), centroids)
      .join(broadcast(centroids), "centroid_id")
      .select(col("vec_id"), col("centroid_id").cast("int").as("centroid_id"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("embedding"))

  /** Train the shared residual codebooks under the frozen router. */
  def residualCodebooks(emb: DataFrame, centroids: DataFrame, mSub: Int,
      k: Int, iters: Int = 3): DataFrame =
    codebooks(residualsRouted(emb, centroids), mSub, k, iters)

  /** Residual-encode the corpus: (vec_id, codes, centroid_id). */
  def encodeResidual(emb: DataFrame, centroids: DataFrame, cb: DataFrame,
      mSub: Int): DataFrame = {
    val res = residualsRouted(emb, centroids).localCheckpoint()
    encode(res, cb, mSub)
      .join(res.select("vec_id", "centroid_id"), "vec_id")
  }

  /** The IVFADC scan over residual-encoded rows: the probed inverted
    * lists join as a broadcast that BOTH prunes and carries each list's
    * ⟨q, c⟩ offset; score = offset + ADC. Probe-list ordering matches
    * [[ivfPqTopK]]. */
  def ivfPqTopKResidual(encodedRes: DataFrame, centroids: DataFrame,
      cb: DataFrame, probe: Seq[Double], mSub: Int, k: Int,
      nprobe: Int): DataFrame = {
    val p = typedLit(probe)
    val probeLists = centroids
      .select(col("centroid_id").as("cid"),
        VectorMath.cosine(col("cv"), p).as("csim"),
        dot(col("cv"), p).as("off"))
      .orderBy(desc("csim"), asc("cid"))
      .limit(nprobe)
    val lut = typedLit(lutFor(cb, probe, mSub))
    encodedRes
      .join(broadcast(probeLists), col("centroid_id") === col("cid"))
      .select(col("vec_id"),
        (col("off") + org.apache.spark.sql.graftexpr.PqAdcExpr
          .column(col("codes"), lut)).as("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(k)
  }

  // ------------------------------------------------------------------
  // persisted IVFADC index — the production shape
  // ------------------------------------------------------------------
  //
  //   dir/_CURRENT        version pointer ([[graft.core.Versioned]]),
  //                       flipped LAST — build and compaction both
  //                       publish atomically (round 12; closes the
  //                       unversioned materialize-then-overwrite crash
  //                       window of r11)
  //   dir/v<N>/codebooks  (m, code, cv) — frozen RESIDUAL codebooks
  //   dir/v<N>/centroids  (centroid_id, cv) — frozen spherical router
  //   dir/v<N>/codes      (vec_id, codes) PARTITIONED by centroid_id;
  //                       codes quantize x − c(x) (IVFADC, round 12);
  //                       with sqRefine also (sq, norm) — SQ8 codes of
  //                       the FULL vector + its float norm, the
  //                       self-contained refine store
  //   dir/v<N>/sq_params  (sqRefine only) one row (mins, steps) — the
  //                       frozen [[Sq]] affine params
  //                       with bqPrefilter also (sig) — [[Bq]] sign
  //                       signatures of the FULL vector, the 1-bit
  //                       first-stage store
  //   dir/v<N>/bq_dim     (bqPrefilter only) one row (dim) — the frozen
  //                       signature dimension
  //   dir/v<N>/meta       one row (max_id) — monotonic-id high-water mark
  //
  // Both models are FROZEN at build time, so appends are pure functions of
  // the shard (the SemDedup/IncrementalDedup discipline) and the probe is
  // a static partition prune: the query's nprobe nearest centroids are a
  // driver-side computation over the tiny collected router, and the codes
  // scan carries `centroid_id IN (...)` — never DPP, which would
  // full-scan on this shape.

  private def mOf(cb: DataFrame): Int =
    cb.agg(max(col("m"))).head().getInt(0) + 1

  import graft.core.Versioned

  /** Train router + residual codebooks over `emb`, write and PUBLISH the
    * full index at `dir`. The codebooks train on residuals against the
    * READ-BACK router (the [[SemDedup.writeIndex]] discipline: index and
    * every later probe see byte-identical centroid doubles). */
  def writeIndex(emb: DataFrame, dir: String, mSub: Int, k: Int,
      nCentroids: Int, routerIters: Int = 3, pqIters: Int = 3,
      sqRefine: Boolean = false, bqPrefilter: Boolean = false): Unit = {
    val spark = emb.sparkSession
    val version = Versioned.nextVersion(spark, dir)
    val root = s"$dir/$version"
    Ann.kmeansCentroids(emb, nCentroids, routerIters).coalesce(1)
      .write.mode("overwrite").parquet(s"$root/centroids")
    val centroids = spark.read.parquet(s"$root/centroids")
    val res = residualsRouted(emb, centroids).localCheckpoint()
    val cb = codebooks(res, mSub, k, pqIters).localCheckpoint()
    cb.coalesce(1).write.mode("overwrite").parquet(s"$root/codebooks")
    val coded = encode(res, cb, mSub)
      .join(res.select("vec_id", "centroid_id"), "vec_id")
    val withSq = if (!sqRefine) coded else {
      // SQ8 refine store (the FAISS IndexRefine posture): SQ codes of the
      // FULL vector (not the residual — the refine must stand alone) plus
      // its float norm, so the rerank scores a near-exact cosine without
      // ever reading the float corpus. Params train here and freeze with
      // the other two models.
      val p = Sq.train(emb)
      writeSqParams(spark, root, p)
      coded.join(sqRefineCols(emb, p), "vec_id")
    }
    val out = if (!bqPrefilter) withSq else {
      // BQ prefilter store ([[Bq]], the 1-bit end of the spectrum): sign
      // signatures of the FULL vectors — 8 bytes/row at d=64, the
      // cheapest possible first-stage scan. The dimension freezes with
      // the other models (bq_dim) so appends stay uniform and a
      // mismatched shard fails loudly instead of packing garbage bits.
      val dim = vecs(emb).select(size(col("v"))).head().getInt(0)
      writeBqDim(spark, root, dim)
      withSq.join(Bq.encode(emb, dim), "vec_id")
    }
    out.write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$root/codes")
    writeMeta(spark, root, emb.agg(max(col("vec_id").cast("long")))
      .head() match { case r if r.isNullAt(0) => Long.MinValue
                      case r                  => r.getLong(0) })
    Versioned.publish(spark, dir, version)
  }

  /** (vec_id, sq, norm) for the refine store: map-only SQ8 encode of the
    * full vectors + their float norms. */
  private def sqRefineCols(emb: DataFrame, p: Sq.Params): DataFrame =
    Sq.encode(emb, p).withColumnRenamed("codes", "sq")
      .join(vecs(emb).select(col("vec_id"),
        sqrt(dot(col("v"), col("v"))).as("norm")), "vec_id")

  private def writeSqParams(spark: SparkSession, root: String,
      p: Sq.Params): Unit = {
    import spark.implicits._
    Seq((p.mins.toSeq, p.steps.toSeq)).toDF("mins", "steps")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/sq_params")
  }

  private def readSqParams(spark: SparkSession, root: String): Sq.Params = {
    val r = spark.read.parquet(s"$root/sq_params").head()
    Sq.Params(r.getSeq[Double](0).toArray, r.getSeq[Double](1).toArray)
  }

  private def hasSqParams(spark: SparkSession, root: String): Boolean =
    pathExists(spark, s"$root/sq_params")

  private def writeBqDim(spark: SparkSession, root: String,
      dim: Int): Unit = {
    import spark.implicits._
    Seq(dim).toDF("dim").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/bq_dim")
  }

  private def readBqDim(spark: SparkSession, root: String): Int =
    spark.read.parquet(s"$root/bq_dim").head().getInt(0)

  private def hasBqDim(spark: SparkSession, root: String): Boolean =
    pathExists(spark, s"$root/bq_dim")

  private def pathExists(spark: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sessionState.newHadoopConf()).exists(path)
  }

  /** TOMBSTONE the given vectors (round 12 — the takedown path the
    * append-only contract cannot express, [[graft.sim.Curation.retract]]'s
    * shape for the standalone ANN index): every probe mode excludes them
    * from results immediately; [[compactIndex]] makes the drop physical
    * and starts the new version with a clean tombstone set. Idempotent at
    * vec_id granularity (the probe-side exclusion reads DISTINCT ids, so
    * a replayed retraction changes nothing). The high-water mark does NOT
    * rewind: a retracted id stays burned, and re-adding equivalent
    * content takes a fresh id — the monotonic-ingest contract everywhere
    * in this repo. */
  def retract(spark: SparkSession, dir: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    if (ids.nonEmpty) {
      val root = Versioned.resolveRoot(spark, dir)
      ids.toDF("vec_id").coalesce(1)
        .write.mode("append").parquet(s"$root/tombstones")
    }
  }

  /** The codes table minus any tombstoned rows — the single read path
    * every probe mode shares. The anti-join only appears when a
    * tombstone set exists, so the normal (takedown-free) plan keeps its
    * spec-pinned scan-only shape. */
  private def liveCodes(spark: SparkSession, root: String): DataFrame = {
    val codes = spark.read.parquet(s"$root/codes")
    if (!pathExists(spark, s"$root/tombstones")) codes
    else codes.join(
      broadcast(spark.read.parquet(s"$root/tombstones")
        .select("vec_id").distinct()),
      Seq("vec_id"), "left_anti")
  }

  private def writeMeta(spark: SparkSession, root: String,
      maxId: Long): Unit = {
    import spark.implicits._
    // crash-safe retire-then-replace publish (core/Meta, ADVICE r12:
    // the old delete-then-rename left a window with NO meta at all)
    graft.core.Meta.write(Seq(maxId).toDF("max_id"), root)
  }

  /** Fold a new shard into the PUBLISHED index at shard cost: residual-
    * encode + route against the FROZEN models, append to the routed
    * partitions, then advance the high-water mark. Monotonic-id guard as
    * everywhere: a replayed shard fails loudly. Honest crash-window note
    * (ADVICE r11): codes append and meta advance are two commits; a crash
    * BETWEEN them leaves the mark stale-low, so replaying that same shard
    * would pass the guard and double-append its codes — recover by
    * compacting ([[compactIndex]] republishes a coherent version) or
    * rebuilding; every other crash point either fails loudly or is
    * invisible. */
  def appendIndex(shard: DataFrame, dir: String): Unit = {
    val spark = shard.sparkSession
    val root = Versioned.resolveRoot(spark, dir)
    val maxSeen = graft.core.Meta.read(spark, root).head().getLong(0)
    val bounds = shard.agg(min(col("vec_id").cast("long")),
      max(col("vec_id").cast("long"))).head()
    if (!bounds.isNullAt(0)) {
      require(bounds.getLong(0) > maxSeen,
        s"monotonic-id ingest contract violated: shard min id " +
          s"${bounds.getLong(0)} <= index high-water mark $maxSeen")
      val cb = spark.read.parquet(s"$root/codebooks")
      val centroids = spark.read.parquet(s"$root/centroids")
      val coded = encodeResidual(shard, centroids, cb, mOf(cb))
      // an sqRefine index must stay uniformly refinable: encode the shard
      // against the FROZEN affine params (out-of-range drift saturates —
      // the documented Sq behavior — it never corrupts the schema)
      val withSq = if (!hasSqParams(spark, root)) coded
        else coded.join(sqRefineCols(shard, readSqParams(spark, root)),
          "vec_id")
      // and a bqPrefilter index stays uniformly scannable: signatures
      // pack against the FROZEN dimension — a mismatched shard fails
      // loudly rather than packing garbage bits
      val out = if (!hasBqDim(spark, root)) withSq
        else {
          val dim = readBqDim(spark, root)
          val sdim = vecs(shard).select(size(col("v"))).head().getInt(0)
          require(sdim == dim,
            s"bq store dim mismatch: index froze $dim, shard has $sdim")
          withSq.join(Bq.encode(shard, dim), "vec_id")
        }
      out.write.mode("append").partitionBy("centroid_id")
        .parquet(s"$root/codes")
      writeMeta(spark, root, bounds.getLong(1))
    }
  }

  /** Compact the published index into a freshly PUBLISHED version — the
    * ingest-loop maintenance step ([[SemDedup.compactIndex]]'s shape):
    * every [[appendIndex]] lands one file set inside each `centroid_id=`
    * partition, so after S shards a pruned probe opens O(S) small files.
    * Rewrites codes with ONE file per partition (`repartition` on the
    * partition column), copies the frozen models and high-water mark, and
    * flips the pointer last — live readers see the old version or the
    * new, never a mix; content is row-identical (PqSpec pins probe
    * equality + the file-count drop). */
  def compactIndex(spark: SparkSession, dir: String): Unit = {
    val root = Versioned.resolveRoot(spark, dir)
    val version = Versioned.nextVersion(spark, dir)
    val newRoot = s"$dir/$version"
    spark.read.parquet(s"$root/codebooks").coalesce(1)
      .write.mode("overwrite").parquet(s"$newRoot/codebooks")
    spark.read.parquet(s"$root/centroids").coalesce(1)
      .write.mode("overwrite").parquet(s"$newRoot/centroids")
    if (hasSqParams(spark, root))
      spark.read.parquet(s"$root/sq_params").coalesce(1)
        .write.mode("overwrite").parquet(s"$newRoot/sq_params")
    if (hasBqDim(spark, root))
      spark.read.parquet(s"$root/bq_dim").coalesce(1)
        .write.mode("overwrite").parquet(s"$newRoot/bq_dim")
    // liveCodes drops tombstoned rows — compaction makes the takedown
    // PHYSICAL, and the new version starts with a clean tombstone set
    // (the tombstones dir is deliberately not copied)
    liveCodes(spark, root)
      .repartition(col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$newRoot/codes")
    writeMeta(spark,
      newRoot, graft.core.Meta.read(spark, root).head().getLong(0))
    Versioned.publish(spark, dir, version)
  }

  /** Query the persisted index: driver-side router scoring over the tiny
    * collected centroid table → `centroid_id IN (...)` static prune of
    * the codes partitions → offset + ADC scan (the IVFADC decomposition
    * above: each probed list's ⟨q, c⟩ rides in as a literal map on the
    * partition column). Probe-list ordering matches [[ivfPqTopK]] (desc
    * cosine, ties to the lower id). */
  /** Driver-side router scoring over the tiny collected centroid table:
    * the `nprobe` nearest centroids as (cosine, centroid_id, ⟨q, c⟩),
    * desc cosine with ties to the lower id — the static partition-prune
    * list every index probe shape shares. */
  private def routedProbes(spark: SparkSession, root: String,
      probe: Seq[Double], nprobe: Int): Array[(Double, Long, Double)] = {
    val cents = spark.read.parquet(s"$root/centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    def dotN(a: Seq[Double], b: Seq[Double]): (Double, Double) = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      (d, d / math.sqrt(na * nb))
    }
    cents
      .map { case (cid, cv) => val (d, c) = dotN(probe, cv); (c, cid, d) }
      .sortBy { case (c, cid, _) => (-c, cid) }.take(nprobe)
  }

  def probeIndexTopK(spark: SparkSession, dir: String, probe: Seq[Double],
      k: Int, nprobe: Int): DataFrame = {
    val root = Versioned.resolveRoot(spark, dir)
    val probed = routedProbes(spark, root, probe, nprobe)
    val cb = spark.read.parquet(s"$root/codebooks")
    val lut = typedLit(lutFor(cb, probe, mOf(cb)))
    val offMap = map(probed.flatMap { case (_, cid, d) =>
      Seq(lit(cid.toInt), lit(d)) }: _*)
    liveCodes(spark, root)
      .filter(col("centroid_id").isin(probed.map(_._2.toInt): _*))
      .select(col("vec_id"),
        (element_at(offMap, col("centroid_id"))
          + org.apache.spark.sql.graftexpr.PqAdcExpr
            .column(col("codes"), lut)).as("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(k)
  }

  /** IVFADC+R — exact re-rank of the ADC shortlist (the refinement step
    * of Jégou et al. 2011 §VII, in its common re-read-the-vector form).
    * PQ codes are a COARSE score: at M=8 their retrieval recall is
    * bounded by code resolution (PqSpec measures 0.30@10 on the random
    * worst case). The production answer is not bigger codes, it is a
    * two-stage scan: ADC ranks a `rerank`-deep shortlist from the codes
    * partitions (cheap, memory-resident at 100 TB), then ONLY those
    * `rerank` rows touch the float vectors for the true cosine. Recall
    * is then bounded by routing (nprobe) and shortlist coverage — not by
    * quantization — while the float table is read `rerank` rows per
    * query instead of per-corpus.
    *
    * The shortlist ids are collected driver-side — a k-bounded list, the
    * repo's static-prune discipline — so the float scan carries a pushed
    * `vec_id IN (...)` instead of a join against the whole table.
    * `emb` is the caller's float-vector table (vec_id, embedding): the
    * index deliberately does not store floats, that being its point.
    * Ties break by vec_id, the [[Ann.bruteTopK]] convention. */
  def probeIndexTopKRerank(spark: SparkSession, dir: String,
      emb: DataFrame, probe: Seq[Double], k: Int, nprobe: Int,
      rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank depth $rerank must be >= k=$k")
    val ids = probeIndexTopK(spark, dir, probe, rerank, nprobe)
      .select("vec_id").collect().map(_.getLong(0))
    val p = typedLit(probe)
    vecs(emb)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), VectorMath.cosine(col("v"), p).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** IVFADC + SQ8 refine — the SELF-CONTAINED rerank (the FAISS
    * IndexRefine posture with an SQ8 refine store): like
    * [[probeIndexTopKRerank]], ADC ranks a `rerank`-deep shortlist from
    * the codes partitions; unlike it, the re-score reads the index's own
    * `sq`/`norm` columns — SQ8 codes of the full vector at 4× compression
    * — instead of the caller's float corpus. At 100 TB that matters
    * because the floats are the thing the index exists to not read: the
    * refine turns the two-stage scan into a pure index operation (codes
    * partitions only, both stages statically pruned to the same nprobe
    * lists), at SQ8's per-dimension-bounded error instead of exactness —
    * |cos_est − cos| ≤ Σ|q_i|·step_i/2 / (|q|·|x|), [[Sq.errorBound]]'s
    * certificate divided by the norms the scan carries.
    *
    * Requires an index built with `sqRefine = true` (loud otherwise). The
    * shortlist re-read is a pushed k-bounded `vec_id IN` point-lookup
    * within the already-pruned partitions — column pruning keeps the ADC
    * pass reading (vec_id, codes) and only this pass touching (sq, norm).
    * Ties break by vec_id, the [[Ann.bruteTopK]] convention. */
  def probeIndexTopKRerankSq(spark: SparkSession, dir: String,
      probe: Seq[Double], k: Int, nprobe: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank depth $rerank must be >= k=$k")
    val root = Versioned.resolveRoot(spark, dir)
    require(hasSqParams(spark, root),
      s"index at $dir has no SQ8 refine store — build with sqRefine=true")
    val p = readSqParams(spark, root)
    val ids = probeIndexTopK(spark, dir, probe, rerank, nprobe)
      .select("vec_id").collect().map(_.getLong(0))
    val (off, w) = Sq.queryParts(p, probe)
    val qNorm = math.sqrt(probe.map(x => x * x).sum)
    val probed = routedProbes(spark, root, probe, nprobe)
    liveCodes(spark, root)
      .filter(col("centroid_id").isin(probed.map(_._2.toInt): _*)
        && col("vec_id").isin(ids: _*))
      .select(col("vec_id"),
        ((lit(off) + org.apache.spark.sql.graftexpr.SqDotExpr
          .column(col("sq"), typedLit(w))) / (lit(qNorm) * col("norm")))
          .as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** IVF-SQ — the refine store as a first-class scan mode: score the
    * probed partitions' SQ8 codes directly (no PQ coarse stage), giving
    * near-exact ANN at the store's 4× compression. One persisted index,
    * five scan modes along the quantization spectrum: [[probeIndexTopK]]
    * (coarse ADC), THIS (near-exact one-stage),
    * [[probeIndexTopKBqSq]] (1-bit Hamming shortlist + SQ refine, the
    * cheapest first stage), [[probeIndexTopKRerankSq]] (ADC shortlist +
    * SQ refine), [[probeIndexTopKRerank]] (ADC shortlist + exact
    * floats). Every
    * returned cosine is within [[Sq.errorBound]]/(|q|·|x|) of exact —
    * the same certificate the refine mode carries. */
  def probeIndexTopKSq(spark: SparkSession, dir: String,
      probe: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val root = Versioned.resolveRoot(spark, dir)
    require(hasSqParams(spark, root),
      s"index at $dir has no SQ8 refine store — build with sqRefine=true")
    val p = readSqParams(spark, root)
    val (off, w) = Sq.queryParts(p, probe)
    val qNorm = math.sqrt(probe.map(x => x * x).sum)
    val probed = routedProbes(spark, root, probe, nprobe)
    liveCodes(spark, root)
      .filter(col("centroid_id").isin(probed.map(_._2.toInt): _*))
      .select(col("vec_id"),
        ((lit(off) + org.apache.spark.sql.graftexpr.SqDotExpr
          .column(col("sq"), typedLit(w))) / (lit(qNorm) * col("norm")))
          .as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** BQ→SQ — the fully-quantized two-stage scan, cheapest-first: a
    * Hamming pass over the 8-byte-per-row sign signatures ([[Bq]],
    * co-stored by `writeIndex(bqPrefilter = true)`) ranks a
    * `rerank`-deep shortlist within the statically-pruned partitions,
    * then ONLY those rows re-score against the SQ8 refine store
    * (near-exact, certificate-bounded). Neither stage reads the PQ
    * codes OR the float corpus: at 100 TB the first pass streams the
    * narrowest column the index has (one long per vector at d=64 —
    * column pruning keeps it to (vec_id, sig)), which is the point of a
    * prefilter. Versus [[probeIndexTopKRerankSq]] this trades ADC's
    * trained coarse ranking for an untrained sign ranking that appends
    * can never invalidate; recall at equal depth is measured, not
    * assumed (BqIndexSpec), and full depth provably equals the one-stage
    * [[probeIndexTopKSq]] scan. Requires BOTH stores (loud otherwise).
    * Ties: hamming asc then vec_id asc; final cosine desc then vec_id. */
  def probeIndexTopKBqSq(spark: SparkSession, dir: String,
      probe: Seq[Double], k: Int, nprobe: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank depth $rerank must be >= k=$k")
    val root = Versioned.resolveRoot(spark, dir)
    require(hasBqDim(spark, root),
      s"index at $dir has no BQ prefilter store — build with bqPrefilter=true")
    require(hasSqParams(spark, root),
      s"index at $dir has no SQ8 refine store — build with sqRefine=true")
    val dim = readBqDim(spark, root)
    require(probe.length == dim,
      s"probe dim ${probe.length} != index bq dim $dim")
    val probed = routedProbes(spark, root, probe, nprobe)
    val ids = liveCodes(spark, root)
      .filter(col("centroid_id").isin(probed.map(_._2.toInt): _*))
      .select(col("vec_id"),
        Bq.hammingToProbe(col("sig"), Bq.signature(probe)).as("hamming"))
      .orderBy(asc("hamming"), asc("vec_id"))
      .limit(rerank)
      .select("vec_id").collect().map(_.getLong(0))
    val p = readSqParams(spark, root)
    val (off, w) = Sq.queryParts(p, probe)
    val qNorm = math.sqrt(probe.map(x => x * x).sum)
    liveCodes(spark, root)
      .filter(col("centroid_id").isin(probed.map(_._2.toInt): _*)
        && col("vec_id").isin(ids: _*))
      .select(col("vec_id"),
        ((lit(off) + org.apache.spark.sql.graftexpr.SqDotExpr
          .column(col("sq"), typedLit(w))) / (lit(qNorm) * col("norm")))
          .as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** BATCHED BQ→SQ probe — the serving form of [[probeIndexTopKBqSq]]:
    * a whole probes DataFrame through the fully-quantized two-stage scan
    * in ONE relational plan. Probe signatures pack MAP-SIDE
    * ([[Bq.signatureExpr]] inside the probes projection — no exchange);
    * routing is the [[probeIndexTopKBatch]] broadcast-router rank; the
    * codes scan is statically pruned to the union of probed lists (a
    * driver collect bounded by ROUTER size, never probe count); stage 1
    * ranks Hamming per probe with a window capped at `rerank`
    * (WindowGroupLimit prunes before the sort at scale), stage 2
    * re-scores ONLY the survivors against the SQ8 refine store with
    * per-probe affine parts carried as columns (offset = ⟨v, mins⟩ and
    * weights = v∘steps are map-side arithmetic against the frozen params
    * as literals — no per-probe driver round-trip anywhere). Returns
    * (probe_id, vec_id, cosine, rank ≤ k). Per-probe results are
    * EXACTLY [[probeIndexTopKBqSq]]'s (BqIndexSpec pins it): the batch
    * form changes the plan, not the answer. */
  def probeIndexTopKBqSqBatch(spark: SparkSession, dir: String,
      probes: DataFrame, k: Int, nprobe: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank depth $rerank must be >= k=$k")
    val root = Versioned.resolveRoot(spark, dir)
    require(hasBqDim(spark, root),
      s"index at $dir has no BQ prefilter store — build with bqPrefilter=true")
    require(hasSqParams(spark, root),
      s"index at $dir has no SQ8 refine store — build with sqRefine=true")
    val dim = readBqDim(spark, root)
    val p = readSqParams(spark, root)
    val minsL = typedLit(p.mins.toSeq)
    val stepsL = typedLit(p.steps.toSeq)
    val cents = spark.read.parquet(s"$root/centroids")
    val pv = vecs(probes).select(col("vec_id").as("probe_id"), col("v"),
      Bq.signatureExpr(col("v"), dim).as("psig"),
      dot(col("v"), minsL).as("off"),
      zip_with(col("v"), stepsL, (x, st) => x * st).as("w"),
      sqrt(dot(col("v"), col("v"))).as("qnorm"))
    val wRoute = Window.partitionBy("probe_id")
      .orderBy(desc("csim"), asc("centroid_id"))
    val routed = pv
      .crossJoin(broadcast(cents.select(col("centroid_id"), col("cv"))))
      .select(col("probe_id"), col("centroid_id"),
        VectorMath.cosine(col("v"), col("cv")).as("csim"),
        col("psig"), col("off"), col("w"), col("qnorm"))
      .withColumn("pr", row_number().over(wRoute))
      .filter(col("pr") <= nprobe)
      .select(col("probe_id"),
        col("centroid_id").cast("int").as("centroid_id"),
        col("psig"), col("off"), col("w"), col("qnorm"))
      .localCheckpoint()
    val probedCids = routed.select("centroid_id").distinct()
      .collect().map(_.getInt(0)).toSeq // ≤ router size, never probe count
    val wHam = Window.partitionBy("probe_id")
      .orderBy(asc("hamming"), asc("vec_id"))
    val wk = Window.partitionBy("probe_id")
      .orderBy(desc("cosine"), asc("vec_id"))
    liveCodes(spark, root)
      .filter(col("centroid_id").isin(probedCids: _*))
      .join(routed, "centroid_id")
      .select(col("probe_id"), col("vec_id"),
        Bq.hammingCols(col("sig"), col("psig"), Bq.words(dim))
          .as("hamming"),
        col("sq"), col("norm"), col("off"), col("w"), col("qnorm"))
      .withColumn("hr", row_number().over(wHam))
      .filter(col("hr") <= rerank)
      .select(col("probe_id"), col("vec_id"),
        ((col("off") + org.apache.spark.sql.graftexpr.SqDotExpr
          .column(col("sq"), col("w")))
          / (col("qnorm") * col("norm"))).as("cosine"))
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= k)
      .orderBy("probe_id", "rank")
  }

  /** BATCHED index probe — the ANN-serving shape: score a whole
    * DataFrame of probes (vec_id, embedding) in one relational plan
    * instead of one driver round-trip each. Per-probe LUTs are born
    * MAP-SIDE via the codegen `pq_lut` (no exchange — the
    * [[lutTable]] form); routing is a broadcast-router rank (the
    * [[SemDedup.corpusDupFlags]] shape, ties to the lower centroid like
    * [[probeIndexTopK]]); and the codes scan is STATICALLY pruned to the
    * union of all probed lists — a driver-side collect bounded by the
    * ROUTER size, never the probe count. Returns (probe_id, vec_id,
    * score, rank) with rank ≤ k per probe, ties to the lower vec_id.
    * Per-probe results are EXACTLY [[probeIndexTopK]]'s (spec-pinned):
    * the batch form changes the plan, not the answer. */
  def probeIndexTopKBatch(spark: SparkSession, dir: String,
      probes: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val root = Versioned.resolveRoot(spark, dir)
    val cb = spark.read.parquet(s"$root/codebooks")
    val mSub = mOf(cb)
    val cents = spark.read.parquet(s"$root/centroids")
    val pv = vecs(probes).select(col("vec_id").as("probe_id"), col("v"))
    val wRoute = Window.partitionBy("probe_id")
      .orderBy(desc("csim"), asc("centroid_id"))
    val routed = pv
      .crossJoin(broadcast(cents.select(col("centroid_id"), col("cv"))))
      .select(col("probe_id"), col("centroid_id"),
        VectorMath.cosine(col("v"), col("cv")).as("csim"),
        dot(col("v"), col("cv")).as("off"))
      .withColumn("pr", row_number().over(wRoute))
      .filter(col("pr") <= nprobe)
      .select(col("probe_id"),
        col("centroid_id").cast("int").as("centroid_id"), col("off"))
      .localCheckpoint()
    val probedCids = routed.select("centroid_id").distinct()
      .collect().map(_.getInt(0)).toSeq // ≤ router size, never probe count
    val luts = lutTable(pv.select(col("probe_id").as("vec_id"), col("v")),
        cb, mSub, lutWidth(cb))
      .withColumnRenamed("vec_id", "probe_id")
    val px = routed.join(luts, "probe_id")
    val wk = Window.partitionBy("probe_id")
      .orderBy(desc("score"), asc("vec_id"))
    liveCodes(spark, root)
      .filter(col("centroid_id").isin(probedCids: _*))
      .join(px, "centroid_id")
      .select(col("probe_id"), col("vec_id"),
        (col("off") + org.apache.spark.sql.graftexpr.PqAdcExpr
          .column(col("codes"), col("lut"))).as("score"))
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= k)
      .orderBy("probe_id", "rank")
  }

  /** In-memory IVFADC+R twin of [[probeIndexTopKRerank]] for the
    * [[ivfPqTopKResidual]] composition — the A/B surface PqSpec gates:
    * at `rerank` = corpus size this is EXACTLY [[Ann.bruteTopK]] (the
    * shortlist covers everything and the re-rank is the exact scan). */
  def ivfPqTopKRerank(encodedRes: DataFrame, centroids: DataFrame,
      cb: DataFrame, emb: DataFrame, probe: Seq[Double], mSub: Int,
      k: Int, nprobe: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank depth $rerank must be >= k=$k")
    val ids = ivfPqTopKResidual(encodedRes, centroids, cb, probe, mSub,
        rerank, nprobe)
      .select("vec_id").collect().map(_.getLong(0))
    val p = typedLit(probe)
    vecs(emb)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), VectorMath.cosine(col("v"), p).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
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
