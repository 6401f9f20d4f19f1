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

  /** Pairs within hamming distance t, blocked on the top 16 fingerprint bits
    * (near-identical docs share the high bits with overwhelming probability;
    * the block bounds the self-join at scale). */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      simhash(col(textCol)).as("fp"))
    val blocked = base.withColumn("block", shiftright(col("fp"), 47))
    blocked.alias("a").join(blocked.alias("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.fp"), col("b.fp")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("id_a", "id_b")
  }
}
