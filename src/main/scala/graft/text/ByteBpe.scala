package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** BYTE-level byte-pair encoding (SURVEY §2 B9.74) — the GPT-2 byte
  * encoder (Radford et al. 2019 "Language Models are Unsupervised
  * Multitask Learners" §2.2; the byte-fallback arrangement LLaMA-family
  * vocabularies descend from): run the Sennrich merge machinery not over
  * code points but over the word's UTF-8 BYTES, so the initial alphabet
  * is exactly 256 symbols and EVERY byte sequence is representable —
  * round-trip lossless on arbitrary UTF-8 with no `[UNK]` and no
  * open-ended initial vocabulary (a char-level model's initial alphabet
  * is unbounded: every new script grows it; the byte model's never
  * does — the reason production vocabularies choose it).
  *
  * Representation: a byte is its UPPERCASE HEX PAIR ("C3", "A9"), the
  * segmentation a space-joined string of hex pairs + the `</w>`
  * sentinel — chosen over GPT-2's printable-unicode byte alphabet
  * because both engines spell it with stock builtins
  * (`hex(encode(word, 'UTF-8'))` here, `hex(encode(word))` in DuckDB —
  * verified uppercase in both), keeping the declared key oracle-able,
  * and because hex pairs are space-free by construction so ALL of
  * [[Bpe]]'s merge machinery (pair stats, boundary-pinned merge
  * replace, the train loop, the heap-replay kernel) applies verbatim.
  * GPT-2's alphabet choice only optimizes human-readability of the
  * merges file; the algebra is identical.
  *
  * Scale shape is [[Bpe]]'s unchanged: ONE corpus-sized word-count
  * pass, then vocabulary-bounded merge rounds; encode runs once per
  * DISTINCT word and fans back on a broadcast. A word's byte
  * segmentation is ≤ 4× its code-point segmentation (UTF-8's width
  * bound), so the vocabulary-table constant grows but the asymptotics
  * do not. Production encode dispatches to the same
  * [[org.apache.spark.sql.graftexpr.BpeEncodeExpr]] heap kernel
  * (`byteLevel = true` — the kernel's replay is segmentation-agnostic;
  * only the initial split differs), proven equal to the regex chain in
  * ByteBpeSpec.
  */
object ByteBpe {

  /** Same sentinel as the char-level family — outside the hex alphabet
    * ([0-9A-F]), so stripping it at decode time is unambiguous. */
  val Eow: String = Bpe.Eow

  /** Initial byte segmentation of a word as a spaced string:
    * "hé" → "68 C3 A9 </w>". Two codegen'd builtins: hex the UTF-8
    * bytes, then break the hex string into pairs ("" → "</w>", matching
    * [[Bpe.charSeg]] on the empty word). */
  def byteSeg(word: Column): Column =
    concat(regexp_replace(
      hex(org.apache.spark.sql.functions.encode(word, "UTF-8")),
      "(..)", "$1 "), lit(Eow))

  /** Train a byte-level model: [[Bpe.trainLoop]] over the byte
    * segmentation — identical argmax/merge/checkpoint discipline,
    * identical early stop. The returned [[Bpe.Model]] is the same shape
    * (merge pairs in training order); only the symbol alphabet differs. */
  def train(docs: DataFrame, numMerges: Int,
      minCount: Long = 2L): Bpe.Model =
    Bpe.trainLoop(
      Bpe.wordFreq(docs).withColumn("seg", byteSeg(col("word"))),
      numMerges, minCount)

  /** Final training-state segmentation table (word, freq, seg) — equals
    * [[encodeWord]] of the training words (ByteBpeSpec's replay gate,
    * the [[Bpe.trainedSeg]] posture). */
  def trainedSeg(docs: DataFrame, model: Bpe.Model): DataFrame =
    Bpe.wordFreq(docs).withColumn("seg",
      Bpe.applyMerges(byteSeg(col("word")), model.merges))

  /** The regex-chain form — the REFERENCE semantics (training replay by
    * construction, the [[Bpe.encodeWordChain]] posture). */
  def encodeWordChain(word: Column, model: Bpe.Model): Column =
    split(Bpe.applyMerges(byteSeg(word), model.merges), " ")

  /** The kernel form — vocabulary-size-independent expression tree
    * (byte-level initial split inside the kernel). */
  def encodeWordKernel(word: Column, model: Bpe.Model): Column =
    org.apache.spark.sql.graftexpr.BpeEncodeExpr
      .column(word, model.merges, byteLevel = true)

  /** Encode a word column to its subword array — chain below the
    * [[Bpe.KernelThreshold]], heap kernel above (same dispatch rule as
    * the char family, same proven-equal contract). */
  def encodeWord(word: Column, model: Bpe.Model): Column =
    if (model.size <= Bpe.KernelThreshold) encodeWordChain(word, model)
    else encodeWordKernel(word, model)

  /** Encode a corpus — [[Bpe.encodeBy]]'s distinct-word + broadcast
    * fan-back plumbing with the byte encoder. */
  def encode(docs: DataFrame, model: Bpe.Model): DataFrame =
    Bpe.encodeBy(docs, encodeWord(_, model))

  /** Invert an encoded word: subword symbols are concatenations of hex
    * pairs (plus possibly the sentinel, which merges may have absorbed),
    * so the word comes back by joining, stripping `</w>`, un-hexing and
    * UTF-8-decoding — the LOSSLESSNESS witness (ByteBpeSpec's round-trip
    * property: decodeSubs ∘ encodeWord = identity on arbitrary UTF-8,
    * OOV or not, with any model including the empty one). */
  def decodeSubs(subs: Column): Column =
    decode(unhex(regexp_replace(concat_ws("", subs),
      java.util.regex.Pattern.quote(Eow), "")), "UTF-8")

  /** Training shards under the byte tokenizer — [[Bpe.packEncoded]]'s
    * shared packing stage, so "encode then pack" cannot drift between
    * tokenizer families. */
  def packCorpus(docs: DataFrame, model: Bpe.Model,
      binSize: Long = 512L): DataFrame =
    Bpe.packEncoded(docs, encode(docs, model), binSize)

  /** Round-1 pair statistics as a declared, oracle-checked query — the
    * [[Bpe]] `text_bpe_pairs` posture over the BYTE segmentation: the
    * exact integer table the first byte-level training argmax reads
    * (top-100; count desc, pair lexicographic). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bytebpe_pairs" -> ((s, d) => {
      val wf = Bpe.wordFreq(Tables.documents(s, d))
        .withColumn("seg", byteSeg(col("word")))
      Bpe.pairStats(wf)
        .orderBy(desc("n"), asc("x"), asc("y"))
        .limit(100)
    }))

  def oracleSql: Map[String, String] = Map(
    // identical construction: word counts → hex-pair byte segmentation
    // (encode → hex → pair split; DuckDB's hex(BLOB) is uppercase like
    // Spark's) → adjacent pairs riding the space-joined string →
    // freq-weighted counts
    "text_bytebpe_pairs" ->
      """WITH wf AS (SELECT w AS word, COUNT(*) AS freq FROM
        |  (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |s AS (SELECT freq, string_split(
        |    regexp_replace(hex(encode(word)), '(..)', '\1 ', 'g') || '</w>',
        |    ' ') AS syms
        |  FROM wf),
        |p AS (SELECT freq, unnest(list_transform(range(1, len(syms)),
        |    i -> syms[i] || ' ' || syms[i + 1])) AS pr FROM s)
        |SELECT string_split(pr, ' ')[1] AS x, string_split(pr, ' ')[2] AS y,
        |  CAST(SUM(freq) AS BIGINT) AS n
        |FROM p GROUP BY x, y
        |ORDER BY n DESC, x ASC, y ASC LIMIT 100""".stripMargin)
}
