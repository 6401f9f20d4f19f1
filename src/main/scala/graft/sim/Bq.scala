package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary (1-bit) quantization: the cheapest point on the repo's
  * quantization spectrum (float32 → [[Pq]] 8-byte codes → [[Sq]] 8-bit
  * levels → THIS, 1 bit/dim). Each dimension keeps only its sign; a
  * d-dim vector packs into ⌈d/64⌉ longs and distance becomes Hamming —
  * xor + popcount, both codegen'd builtins, ~64 dims per CPU cycle.
  *
  * Why it earns a slot next to PQ/SQ8 at 100 TB: 32× smaller than the
  * floats (64-dim vector = ONE long), needs NO training (no codebooks,
  * no per-dim affine params — nothing to drift as the corpus grows, so
  * append-only ingest can never invalidate the code table), and for
  * mean-centered / random-unit geometry sign agreement is a monotone
  * proxy of angle (Charikar 2002: P[sign(r·a)=sign(r·b)] = 1 − θ/π —
  * the same hyperplane-LSH fact [[SimHash]] uses, here with axis-aligned
  * planes). It ranks a shortlist; the exact answer comes from the same
  * two-stage rerank contract as [[Sq.topKRerank]] / Pq's certified scan:
  * Hamming shortlist → k-bounded point-lookup of the true floats →
  * exact cosine. Quality (recall vs exact) is measured in BqSpec and the
  * volume artifact, not assumed.
  *
  * Determinism discipline: sign(x) = (x >= 0) on the RAW stored float —
  * no arithmetic before the comparison — so encode is bit-stable across
  * partitionings and engines by construction; all ties break by vec_id.
  */
object Bq {

  /** Words per signature for a d-dim vector. */
  def words(dim: Int): Int = (dim + 63) / 64

  private def vecs(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Encode the corpus: (vec_id, sig) with sig = array of ⌈dim/64⌉ longs,
    * bit i of word w = [dimension 64w+i >= 0]. Map-only — no training
    * table, no join, no shuffle; at 100 TB this pipelines inside the
    * scan that reads the floats (the [[Sq.encode]] shape, minus even the
    * broadcast params). The per-word fold is a fixed lambda-free tree of
    * codegen builtins (when/shiftleft/bitwiseOR) — no HigherOrderFunction
    * interpretation in the encode path.
    *
    * Honest edge: a vector SHORTER than `dim` zero-pads (element_at past
    * the end is null, and a null sign test takes the 0 branch) rather
    * than failing — the caller owns dim uniformity, which is why the
    * persisted index freezes `bq_dim` and checks the shard's dimension
    * on append ([[graft.sim.Pq.appendIndex]]) instead of trusting this
    * expression to notice. */
  def encode(emb: DataFrame, dim: Int): DataFrame =
    vecs(emb).select(col("vec_id"),
      signatureExpr(col("v"), dim).as("sig"))

  /** The per-ROW signature expression over a double-array column — the
    * body of [[encode]], exposed so batch-serving plans can pack probe
    * signatures map-side inside their own projection. */
  def signatureExpr(v: Column, dim: Int): Column = {
    require(dim > 0, s"dim must be positive, got $dim")
    val sigWords: Seq[Column] = (0 until words(dim)).map { w =>
      val lo = w * 64
      val hi = math.min(dim, lo + 64)
      (lo until hi).map { i =>
        when(element_at(v, i + 1) >= 0,
          lit(1L << (i - lo))).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
    }
    array(sigWords: _*)
  }

  /** Hamming between two signature COLUMNS of `nWords` words each — the
    * pairwise form [[hammingToProbe]] specializes when one side is a
    * literal; same fixed codegen tree, zero lambdas. */
  def hammingCols(a: Column, b: Column, nWords: Int): Column =
    (1 to nWords).map { i =>
      bit_count(element_at(a, i).bitwiseXOR(element_at(b, i)))
    }.reduce(_ + _).cast("int")

  /** Driver-side signature of a probe vector — the d-bounded twin of
    * [[encode]]'s column expression (same sign rule, same packing). */
  def signature(probe: Seq[Double]): Seq[Long] = {
    require(probe.nonEmpty, "probe must be non-empty")
    (0 until words(probe.length)).map { w =>
      val lo = w * 64
      val hi = math.min(probe.length, lo + 64)
      var acc = 0L
      var i = lo
      while (i < hi) { if (probe(i) >= 0) acc |= 1L << (i - lo); i += 1 }
      acc
    }
  }

  /** Hamming distance of a stored signature against a literal probe
    * signature: per-word bit_count(xor) summed in a FIXED expression tree
    * — all codegen builtins, zero lambdas, so the probe scan stays inside
    * whole-stage codegen. */
  def hammingToProbe(sig: Column, probeSig: Seq[Long]): Column =
    probeSig.zipWithIndex.map { case (p, w) =>
      bit_count(element_at(sig, w + 1).bitwiseXOR(lit(p)))
    }.reduce(_ + _).cast("int")

  /** Approximate top-k by Hamming: one signature scan +
    * TakeOrderedAndProject. Ties break (hamming asc, vec_id asc) — the
    * [[Ann.bruteTopK]] convention flipped for a distance. */
  def topK(encoded: DataFrame, probeSig: Seq[Long], k: Int): DataFrame =
    encoded.select(col("vec_id"),
        hammingToProbe(col("sig"), probeSig).as("hamming"))
      .orderBy(asc("hamming"), asc("vec_id"))
      .limit(k)

  /** Two-stage exact-cosine form ([[Sq.topKRerank]]'s contract): Hamming
    * ranks a `rerank`-deep shortlist over the 32×-compressed signatures,
    * then ONLY those rows touch the float vectors — a k-bounded pushed
    * `vec_id IN` point-lookup — for the true cosine. */
  def topKRerank(encoded: DataFrame, emb: DataFrame, probe: Seq[Double],
      k: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank depth $rerank must be >= k=$k")
    val ids = topK(encoded, signature(probe), rerank)
      .select("vec_id").collect().map(_.getLong(0))
    val pr = typedLit(probe)
    vecs(emb)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), VectorMath.cosine(col("v"), pr).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }
}
