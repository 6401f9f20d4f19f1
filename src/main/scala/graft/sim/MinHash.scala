package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection — SURVEY.md §2 B9.2.
  *
  * Entirely built from codegen'd higher-order array functions (no UDF, no
  * UDAF): shingle → k minhashes via affine transforms of Murmur3 → band keys
  * → bucket self-join → exact-Jaccard verification of candidates only.
  *
  * Scale shape: per-doc signature computation is a narrow map; the only
  * shuffle is the band-bucket join, whose fan-in is bounded by bucket sizes
  * (near-dup clusters), never O(n²). The verification join touches candidate
  * pairs only — this is the standard web-scale dedup pipeline shape.
  */
object MinHash {

  val Prime: Long = 4294967311L // smallest prime > 2^32

  /** Word k-shingles of a space-tokenized text column. Documents shorter
    * than k tokens yield their full token string as a single shingle. */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(text, " ")
    array_distinct(
      transform(sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  /** k-permutation MinHash signature: sig[j] = min over shingles of
    * ((2j+1)·murmur3(s) + j² + 7919) mod P — deterministic, seedless. */
  def signature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), j =>
      array_min(transform(shingleCol, s =>
        pmod((j * 2 + 1) * hash(s).cast("long") + j * j + 7919L, lit(Prime)))))

  /** Signature-estimated Jaccard: fraction of agreeing minhash slots. */
  def estimateJaccard(sigA: Column, sigB: Column, numHashes: Int): Column =
    (size(filter(zip_with(sigA, sigB, (a, b) => a === b), x => x))
      .cast("double") / numHashes)

  /** Exact token-set Jaccard (for candidate verification). */
  def exactJaccard(tokA: Column, tokB: Column): Column =
    size(array_intersect(tokA, tokB)).cast("double") /
      size(array_union(tokA, tokB))

  /** The verify-side token set — ONE definition shared by [[bandTable]]
    * and the slim index's toks table ([[IncrementalDedup.writeIndex]]),
    * so the two can never drift. */
  private[sim] def tokSet(text: Column): Column =
    array_distinct(split(text, " "))

  /** Near-duplicate pairs via banded LSH + exact verification, in the
    * deterministic (id_a, id_b) order a report wants. Pipelines that
    * consume the pairs as a GRAPH (connected components in [[Dedup]])
    * should use [[nearDupPairsUnordered]] — they localCheckpoint an
    * unordered projection immediately, so the global sort here would be
    * paid and thrown away. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8, shingleK: Int = 3,
      threshold: Double = 0.6): DataFrame =
    nearDupPairsUnordered(docs, idCol, textCol, numHashes, bands, shingleK,
      threshold).orderBy("id_a", "id_b")

  /** Near-duplicate pairs via banded LSH + exact verification (unordered).
    *
    * @param docs       (idCol, textCol) input
    * @param numHashes  signature width (bands * rowsPerBand)
    * @param bands      number of LSH bands
    * @param threshold  exact-Jaccard cutoff for verified output
    */
  def nearDupPairsUnordered(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8, shingleK: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    val banded = bandTable(docs, idCol, textCol, numHashes, bands, shingleK)

    val candidates = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band_id") === col("b.band_id")
          && col("a.band_key") === col("b.band_key")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.toks").as("toks_a"), col("b.toks").as("toks_b"))
      .dropDuplicates("id_a", "id_b") // same pair can collide in many bands

    candidates
      .select(col("id_a"), col("id_b"),
        exactJaccard(col("toks_a"), col("toks_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The per-document LSH band table `(id, toks, band_id, band_key)` — the
    * single source of truth for band keys, shared by the self-join above
    * and by [[IncrementalDedup]]'s persisted index + probe (band keys are a
    * pure function of the document, so an index built yesterday and a probe
    * computed today can never disagree). `toks` rides along because every
    * consumer follows the candidate join with the exact-Jaccard verify. */
  private[sim] def bandTable(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, shingleK: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val base = docs.select(col(idCol).as("id"),
      tokSet(col(textCol)).as("toks"),
      signature(shingles(col(textCol), shingleK), numHashes).as("sig"))
    // band key: the r-slot slice of the signature, joined to one string
    base.select(col("id"), col("toks"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          concat_ws("_", slice(col("sig"), b * r + 1, lit(r))))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_key")
  }
}
