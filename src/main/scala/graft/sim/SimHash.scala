package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprints — SURVEY.md §2 B9 (dedup family).
  *
  * 64-bit SimHash built from codegen'd array functions: each token votes
  * ±1 per bit position according to its xxhash64; the sign of each bit's
  * vote total becomes the fingerprint bit. Near-dups then reduce to
  * hamming-distance ≤ t, computed with bit_count(xor) — O(1) per pair and
  * joinable via prefix buckets at scale.
  */
object SimHash {

  /** 63-bit SimHash of a space-tokenized text column (63 bits, not 64: the
    * fingerprint folds as acc*2+bit, and Spark 4's default ANSI mode would
    * raise on the sign-bit overflow a 64th bit could cause). */
  def simhash(text: Column): Column = {
    val toks = array_distinct(split(text, " "))
    // votes[i+1] = sum over tokens of ±1, by the parity of xxhash64(token, i)
    // (re-hashing per bit index avoids variable-distance bit shifts, which
    // Spark's shiftright only supports with literal distances)
    val votes = transform(sequence(lit(0), lit(62)), i =>
      aggregate(toks, lit(0),
        (acc, t) => acc +
          when(pmod(xxhash64(t, i), lit(2L)) === 1L, 1).otherwise(-1)))
    // MSB-first fold of sign(vote) bits into one non-negative BIGINT
    aggregate(sequence(lit(62), lit(0), lit(-1)), lit(0L),
      (acc, i) => acc * 2 + when(element_at(votes, i + 1) > 0, 1L).otherwise(0L))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Pairs within hamming distance `maxHamming`, with GUARANTEED recall:
    * the fingerprint is split into maxHamming+1 disjoint bit blocks, and each
    * doc is indexed once per (block index, block value). If at most
    * maxHamming bits differ, the differing bits touch at most maxHamming
    * blocks, so by pigeonhole at least one block matches exactly — every
    * true pair is generated as a candidate (the single-prefix blocking this
    * replaces missed any pair whose differing bit fell inside the prefix).
    * Exact hamming verification then keeps precision 1. The (block, value)
    * equi-join is the scale shape: shuffle keyed on short block values,
    * candidates bounded by per-bucket collisions, never all-pairs. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8): DataFrame =
    nearDupPairsByFp(
      docs.select(col(idCol).as("id"), simhash(col(textCol)).as("fp")),
      maxHamming)

  /** The pigeonhole block fan-out over a fingerprint table (id, fp):
    * one row per (block index, block value) — maxHamming+1 rows per
    * fingerprint. Shared by the batch self-join below AND the persisted
    * [[FpIndex]] (index rows and probe rows come from THIS function, so
    * index and probe can never drift — the IncrementalDedup.probeBands
    * discipline). A pure per-row transform: legal on streaming frames. */
  private[sim] def blockTable(base: DataFrame, maxHamming: Int): DataFrame = {
    val nBlocks = maxHamming + 1
    val bitsPer = 63 / nBlocks
    val blocks = (0 until nBlocks).map { i =>
      val lo = i * bitsPer
      val width = if (i == nBlocks - 1) 63 - lo else bitsPer
      struct(lit(i).as("blk"),
        shiftright(col("fp"), lo).bitwiseAND(lit((1L << width) - 1)).as("bval"))
    }
    base
      .select(col("id"), col("fp"), explode(array(blocks: _*)).as("b"))
      .select(col("id"), col("fp"), col("b.blk").as("blk"), col("b.bval").as("bval"))
  }

  /** The banded join over ANY 63-bit fingerprint table (id, fp) — shared
    * by the text SimHash above and the perceptual image dHash
    * ([[graft.multimodal.Multimodal.imageNearDups]]): the recall
    * guarantee is a property of the blocking, not of how the bits were
    * made. */
  def nearDupPairsByFp(base: DataFrame, maxHamming: Int = 8): DataFrame = {
    val indexed = blockTable(base, maxHamming)
    indexed.alias("a").join(indexed.alias("b"),
        col("a.blk") === col("b.blk") && col("a.bval") === col("b.bval")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.fp"), col("b.fp")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      // a close pair can agree on several blocks — dedupe after the cheap filter
      .dropDuplicates("id_a", "id_b")
      .orderBy("id_a", "id_b")
  }
}
