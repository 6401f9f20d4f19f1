package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sim.VectorMath

/** Hyperplane-LSH fingerprints for EMBEDDINGS (Charikar 2002 random
  * projections) — the training-free near-dup modality for vectors, the
  * sibling of the token [[SimHash]]: bit j of the fingerprint is the sign
  * of the dot product with a fixed random hyperplane, so
  * P[bit_j(a) ≠ bit_j(b)] = θ(a,b)/π and Hamming distance over 63 bits is
  * an unbiased angle estimator. From the fingerprint on, EVERYTHING is
  * the existing 63-bit machinery: [[SimHash.nearDupPairsByFp]] for the
  * pigeonhole-banded batch self-join (recall GUARANTEED at ≤ maxHamming)
  * and [[FpIndex]] for the persisted index / shard probe / streaming twin
  * — this file only contributes the encode kernel.
  *
  * Why it earns a slot next to [[SemDedup]] (the k-means-blocked exact
  * path) and [[Bq]] (axis-aligned sign bits for rank-then-rerank): the
  * projection needs NO training — no centroids to refit, nothing that an
  * append-only ingest loop can invalidate as the corpus grows — and the
  * output is 8 bytes/row feeding an index whose recall at radius r is a
  * pigeonhole theorem, not a measured property. [[Bq]]'s axis-aligned
  * signs are the same geometry but tied to the raw basis (64 dims = 64
  * bits, correlated when coordinates are); the Rademacher mix here spends
  * exactly 63 bits regardless of dimension and decorrelates them.
  *
  * Determinism discipline: the planes are ±1 Rademacher vectors derived
  * from md5 in plain Scala ([[planeSigns]]) and spliced as LITERALS into
  * both the Spark expression and the DuckDB oracle — one source function,
  * two engines, provably identical constants. The per-plane dot product
  * is [[VectorMath.dot]]'s codegen'd LEFT-TO-RIGHT fold — the identical
  * IEEE sequence as the oracle's signed chain `v[1]-v[2]+…` (multiplying
  * by ±1.0 and adding ≡ subtracting; 0.0+x ≡ x) — so the sign test, and
  * hence every bit, is bit-stable across engines and partitionings.
  *
  * 100 TB posture: encode is map-only (63 fixed-constant dot products
  * inside the scan projection — no join, no shuffle, no training table);
  * the banded self-join shuffles 8-byte fingerprints keyed on short
  * block values, never vectors; the persisted loop inherits [[FpIndex]]'s
  * statically-pruned shard probe. Radius sizing is the FpIndex scaladoc's
  * formula; the declared queries use radius 12 (13 blocks of ≥4 bits) —
  * wide enough to see cosine-≈0.9 neighbors (E[hamming] = 63·θ/π ≈ 9 at
  * cosine 0.9), priced for corpora up to ~10⁵ rows; drop to the Manku
  * radius 3 for web scale.
  */
object EmbedFp {

  /** Fingerprint width: 63 bits, not 64 — the repo's fingerprint
    * machinery ([[SimHash]]/[[FpIndex]]) keeps the sign bit clear. */
  val Bits = 63

  /** Declared-query radius (see the scaladoc's sizing note). */
  val DeclaredRadius = 12

  /** ±1.0 Rademacher sign for (plane j, dim d): the low bit of the first
    * md5 byte of "graft-embed-fp:j:d". Plain Scala — the ONE source both
    * engines' literals splice from. */
  def planeSigns(dim: Int): IndexedSeq[IndexedSeq[Double]] = {
    (0 until Bits).map { j =>
      (0 until dim).map { d =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val h = md.digest(s"graft-embed-fp:$j:$d".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1.0 else -1.0
      }
    }
  }

  /** 63-bit fingerprint of a double-array column: bit j = [v·plane_j ≥ 0]
    * (ties to +, the [[Bq]] sign convention). ONE codegen'd kernel — the
    * `rademacher_fp` native expression (B11.4 #14), which carries the
    * plane matrix as a task-shared reference object so the whole-stage
    * span stays unbroken; map-only, legal on streaming frames. Measured:
    * the composed 63-dot-product form below knocks the projection onto
    * the interpreted path (2.3k vecs/s); this kernel runs the identical
    * IEEE arithmetic inside codegen (see [[fingerprintViaComposed]],
    * spec-pinned bit-equal). */
  def fingerprint(v: Column, dim: Int): Column =
    org.apache.spark.sql.graftexpr.RademacherFpExpr
      .column(v, planeSigns(dim))

  /** Reference composition of built-ins — bit-identical to
    * [[fingerprint]] on null-free uniform-dim input (EmbedFpSpec pins
    * it); kept for property tests and as the semantics documentation:
    * bit j = [dot_f64(v, plane_j) ≥ 0]. */
  private[graft] def fingerprintViaComposed(v: Column, dim: Int): Column = {
    val planes = planeSigns(dim)
    (0 until Bits).map { j =>
      when(VectorMath.dot(v, typedLit(planes(j))) >= 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** (id, fp) fingerprint table of an embeddings frame (vec_id,
    * embedding) — the exact input shape [[SimHash.nearDupPairsByFp]] and
    * [[FpIndex.writeIndex]]/[[FpIndex.probe]] consume, so the whole
    * persisted near-dup loop (index / shard probe at shard cost /
    * streaming twin / retraction) comes for free from this projection. */
  def fingerprints(emb: DataFrame, dim: Int): DataFrame =
    emb.select(col("vec_id").as("id"),
      fingerprint(col("embedding").cast("array<double>"), dim).as("fp"))

  /** Banded near-dup pairs over the embedding fingerprints — recall at
    * ≤ maxHamming guaranteed by the shared pigeonhole blocking, precision
    * 1 by the exact Hamming verify. */
  def nearDupPairs(emb: DataFrame, dim: Int,
      maxHamming: Int = DeclaredRadius): DataFrame =
    SimHash.nearDupPairsByFp(fingerprints(emb, dim), maxHamming)
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"),
        col("hamming"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-vector fingerprint table — the encode kernel oracled bit-exactly
    // (the text_fingerprint posture: the fingerprint IS the declared
    // output, so every plane constant and every IEEE step is checked).
    "sim_embed_fp" -> ((s, d) =>
      fingerprints(Tables.embeddings(s, d), 64)
        .select(col("id").as("vec_id"), col("fp"))
        .orderBy("vec_id")),

    // Banded hyperplane-LSH near-dup pairs at the declared radius. The
    // oracle is the BRUTE-FORCE all-pairs Hamming join over the same
    // fingerprints — equality is exactly the pigeonhole recall guarantee
    // plus the exact verify, checked end-to-end on real data.
    "dedup_embed_fp" -> ((s, d) =>
      nearDupPairs(Tables.embeddings(s, d), 64)
        .orderBy("vec_a", "vec_b")),

    // The actionable end of the vector near-dup modality: banded pairs →
    // transitive clusters → keep/drop verdicts, through the SAME
    // [[Dedup.clusters]] propagation the token-Jaccard pipeline uses —
    // one component algorithm, three edge sources (Jaccard, k-NN, LSH).
    "dedup_embed_clusters" -> ((s, d) =>
      graft.sim.Dedup.clusters(
          nearDupPairs(Tables.embeddings(s, d), 64)
            .select(col("vec_a"), col("vec_b")),
          "vec_a", "vec_b")
        .orderBy("member"))
  )

  /** The oracle's plane table as a VALUES CTE — one row per plane, the
    * ±1.0 arrays spliced from the SAME [[planeSigns]] the Spark literals
    * come from. Row form (not a 63-term expression chain): DuckDB's
    * binder recursion depth caps a left-leaning sum at 128 terms, and the
    * per-plane dot via `list_reduce(list_zip(v, s))` is the repo's proven
    * cross-engine left-fold idiom anyway. */
  private def planesValuesSql(dim: Int): String =
    planeSigns(dim).zipWithIndex.map { case (signs, j) =>
      s"  ($j, [${signs.map(s => if (s >= 0) "1.0" else "-1.0").mkString(", ")}])"
    }.mkString(",\n")

  /** CTE chain `emb → planes → bits → fp`: bit j = [v·s_j ≥ 0] << j,
    * folded with an exact BIGINT SUM (disjoint bits, so + ≡ the Spark
    * side's bitwiseOR; SUM over 63 bounded terms is order-free). */
  private lazy val fpCteSql: String =
    s"""emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |planes(j, s) AS (VALUES
      |${planesValuesSql(64)}),
      |bits AS (SELECT e.vec_id,
      |    CASE WHEN list_reduce(list_transform(list_zip(e.v, p.s),
      |        z -> z[1] * z[2]), (acc, x) -> acc + x) >= 0
      |      THEN CAST(1 AS BIGINT) << p.j ELSE CAST(0 AS BIGINT) END AS b
      |  FROM emb e CROSS JOIN planes p),
      |fp AS (SELECT vec_id, CAST(SUM(b) AS BIGINT) AS fp
      |  FROM bits GROUP BY vec_id)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "sim_embed_fp" ->
      s"""WITH $fpCteSql
        |SELECT vec_id, fp FROM fp ORDER BY vec_id""".stripMargin,

    "dedup_embed_fp" ->
      s"""WITH $fpCteSql
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
        |FROM fp a JOIN fp b ON a.vec_id < b.vec_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= $DeclaredRadius
        |ORDER BY vec_a, vec_b""".stripMargin,

    // brute-force pairs + recursive reachability to fixpoint — the
    // dedup_clusters oracle pattern over the fingerprint edge source
    "dedup_embed_clusters" ->
      s"""WITH RECURSIVE $fpCteSql,
        |good AS (SELECT a.vec_id AS u, b.vec_id AS v
        |  FROM fp a JOIN fp b ON a.vec_id < b.vec_id
        |  WHERE bit_count(xor(a.fp, b.fp)) <= $DeclaredRadius),
        |edges AS (SELECT u, v FROM good UNION ALL SELECT v, u FROM good),
        |reach(id, root) AS (
        |  SELECT DISTINCT u, u FROM edges
        |  UNION
        |  SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.id)
        |SELECT id AS member, MIN(root) AS cluster, (id = MIN(root)) AS keep
        |FROM reach GROUP BY id ORDER BY member""".stripMargin
  )
}
