package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) — the MIDDLE tier of the quantization
  * spectrum (SURVEY.md §2 B9 ANN family; the standard int8 range-coding
  * every production ANN stack ships beside PQ):
  *
  *   floats 1× (exact) — SQ8 4× (near-exact) — PQ 32× (coarse, [[Pq]])
  *
  * Each dimension quantizes independently to an 8-bit level against
  * frozen per-dimension affine params: code_i = round((x_i − min_i) /
  * step_i) with step_i = (max_i − min_i) / 255, decode_i = min_i +
  * step_i·code_i. Per-dimension error is bounded by step_i/2 inside the
  * trained range (out-of-range values SATURATE to 0/255 — the standard
  * SQ8 behavior for shards drifting past the frozen params; a saturated
  * dimension errs by the overshoot, never corrupts its neighbors).
  *
  * Scoring never decodes: ⟨q, decode(c)⟩ = ⟨q, min⟩ + Σ (q_i·step_i)·c_i
  * — a per-query scalar offset plus the codegen'd
  * [[org.apache.spark.sql.graftexpr.SqDotExpr]] kernel over the int
  * codes (the [[Pq]] ADC discipline: the corpus is compressed, the query
  * side stays exact). Unlike PQ there is no codebook and no training
  * iteration — params are one min/max aggregation — and the error is
  * small enough that SQ8 ranking is near-exact: the spec gates recall
  * AND the analytic |approx − exact| ≤ Σ|q_i|·step_i/2 bound; the
  * [[topKRerank]] two-stage form restores exactness entirely (the
  * [[Pq.probeIndexTopKRerank]] shape).
  *
  * All shapes are the repo's standard ones: training is one partial-
  * aggregated d-key fan-out, encoding is map-only (pipelines inside the
  * scan at 100 TB), the scan is codes + TakeOrdered with no join, and
  * the frozen params travel as a d-bounded driver-side model (the
  * frozen-centroid discipline of [[Ann]]/[[SemDedup]]).
  */
object Sq {

  val Levels = 255

  /** Frozen per-dimension affine params. A constant dimension (max ==
    * min) gets step 0 and always encodes/decodes to its min. */
  final case class Params(mins: Array[Double], steps: Array[Double]) {
    def dim: Int = mins.length
  }

  private def vecs(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Train the params: per-dimension min/max over the corpus — one
    * posexplode fan-out partial-aggregated on d keys, then a d-bounded
    * driver collect (the frozen-model discipline; d is 64 here, never
    * corpus-sized). */
  def train(emb: DataFrame): Params = {
    val rows = vecs(emb)
      .select(posexplode(col("v")))
      .groupBy("pos").agg(min("col").as("mn"), max("col").as("mx"))
      .orderBy("pos")
      .collect()
    require(rows.nonEmpty, "cannot train SQ params over an empty corpus")
    val mins = rows.map(_.getDouble(1))
    val steps = rows.map(r => (r.getDouble(2) - r.getDouble(1)) / Levels)
    Params(mins, steps)
  }

  /** Encode the corpus: (vec_id, codes), codes_i ∈ [0, 255]. Map-only —
    * the params ride as literal arrays, no join, no shuffle; at 100 TB
    * this pipelines inside the scan that reads the floats. */
  def encode(emb: DataFrame, p: Params): DataFrame = {
    val minsL = typedLit(p.mins.toSeq)
    val stepsL = typedLit(p.steps.toSeq)
    vecs(emb).select(col("vec_id"),
      zip_with(zip_with(col("v"), minsL, (x, mn) => x - mn), stepsL,
        (d, st) => when(st === 0.0, lit(0)).otherwise(
          least(greatest(round(d / st), lit(0.0)), lit(Levels.toDouble)))
          .cast("int")).as("codes"))
  }

  /** The per-query kernel inputs: (offset ⟨q, min⟩, weights q_i·step_i) —
    * driver-side, d-bounded. */
  def queryParts(p: Params, probe: Seq[Double]): (Double, Seq[Double]) = {
    require(probe.length == p.dim,
      s"probe dim ${probe.length} != trained dim ${p.dim}")
    var off = 0.0
    var i = 0
    while (i < p.dim) { off += probe(i) * p.mins(i); i += 1 }
    (off, probe.indices.map(i => probe(i) * p.steps(i)))
  }

  /** Approximate top-k by SQ8 score: one codes scan through the codegen'd
    * `sq_dot`, TakeOrdered for the k. Ties break by vec_id (the
    * [[Ann.bruteTopK]] convention). */
  def topK(encoded: DataFrame, p: Params, probe: Seq[Double],
      k: Int): DataFrame = {
    val (off, w) = queryParts(p, probe)
    encoded.select(col("vec_id"),
        (lit(off) + org.apache.spark.sql.graftexpr.SqDotExpr
          .column(col("codes"), typedLit(w))).as("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(k)
  }

  /** Two-stage exact form ([[Pq.probeIndexTopKRerank]]'s shape): SQ8
    * ranks a `rerank`-deep shortlist, then ONLY those rows touch the
    * float vectors — a pushed k-bounded `vec_id IN` point-lookup — for
    * the true cosine. SQ8's error is per-dimension-bounded, so a modest
    * shortlist restores the exact answer. */
  def topKRerank(encoded: DataFrame, emb: DataFrame, p: Params,
      probe: Seq[Double], k: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank depth $rerank must be >= k=$k")
    val ids = topK(encoded, p, probe, rerank)
      .select("vec_id").collect().map(_.getLong(0))
    val pr = typedLit(probe)
    vecs(emb)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), VectorMath.cosine(col("v"), pr).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** The analytic score-error bound for a probe: |⟨q, decode(c)⟩ −
    * ⟨q, x⟩| ≤ Σ_i |q_i|·step_i/2 for any in-range x — the certificate
    * the spec checks measured errors against. */
  def errorBound(p: Params, probe: Seq[Double]): Double =
    probe.indices.map(i => math.abs(probe(i)) * p.steps(i) / 2).sum
}
