package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Byte-pair-encoding subword tokenizer, trained distributively (Sennrich,
  * Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
  * Subword Units" — the published algorithm every GPT/Llama-style tokenizer
  * descends from).
  *
  * The load-bearing scale fact: BPE training never touches the corpus after
  * ONE word-count pass. Merges operate on the (word, freq, segmentation)
  * VOCABULARY table — bounded by distinct-word count, not token count — so
  * a 100 TB corpus costs one corpus-sized shuffle (the word count) plus R
  * vocabulary-sized rounds. Each round is: adjacent-pair counts weighted by
  * word freq (the text_ngrams slice+zip fan-out, lambda-free) → a 1-row
  * deterministic argmax collect (count desc, pair lexicographic — the
  * frozen-model discipline; R rows total cross the driver) → one codegen'd
  * `regexp_replace` over the segmentation column. Lineage is capped with a
  * per-round localCheckpoint (the dedup-fixpoint pattern).
  *
  * Segmentation state is a SPACE-JOINED STRING ("l o w </w>"), not an
  * array: merge application becomes a single regexp_replace with
  * whitespace-boundary lookarounds — Java regex replaces left-to-right and
  * non-overlapping, which is exactly the reference algorithm's merge rule
  * ("a a a" + merge (a,a) → "aa a"). Tokens are space-split upstream, so
  * symbols can never contain a space and the encoding is lossless.
  *
  * ENCODE CONTRACT: encoding applies the SAME merge list, in training
  * order, each once — so for every training-corpus word the encoder
  * reproduces the training-time segmentation EXACTLY (each training round
  * applied merge r once to the post-(r−1) state; the encode fold replays
  * the identical sequence). Classic "loop until no merge applies" encoders
  * can diverge from training in the corner where a later merge re-creates
  * an earlier merge's left symbol; this encoder is defined to be the
  * training replay, which is the property a tokenizer actually needs
  * (train-time and inference-time tokenizations identical). BpeSpec gates
  * this equality, the paper's canonical first merges, round-trip
  * losslessness, OOV behavior, and two-partitioning determinism.
  */
object Bpe {

  /** End-of-word sentinel (the paper's `</w>`): makes "est" at a word end
    * a different symbol than "est" mid-word, and round-trips word
    * boundaries through the subword stream. */
  val Eow = "</w>"

  final case class Model(merges: Seq[(String, String)]) {
    def size: Int = merges.length
    /** Merge prefixes are themselves valid (smaller) models. */
    def truncated(n: Int): Model = Model(merges.take(n))
  }

  private def tokens: Column = split(col("text"), " ")

  /** Initial character segmentation of a word as a spaced string:
    * "low" → "l o w </w>". One codegen'd regexp_replace — every char gets
    * a trailing space, then the sentinel lands as the final symbol.
    * DOTALL ((?s)) so line terminators segment too (ADVICE r12: words
    * are space-split, so \n/\r/\u2028 survive into them; without the
    * flag Java's `.` skips them and the chain path diverges from the
    * code-point kernel). */
  def charSeg(word: Column): Column =
    concat(regexp_replace(word, "(?s)(.)", "$1 "), lit(Eow))

  /** (word, freq) over the corpus — the single corpus-sized pass. */
  def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(tokens).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Adjacent symbol pairs of a segmentation table, weighted by word
    * frequency: (x, y, n). Lambda-free slice+arrays_zip fan-out; counts
    * overlapping adjacencies ("a a a" contributes (a,a) twice), exactly
    * like the reference `get_stats`. */
  def pairStats(seg: DataFrame): DataFrame = {
    val syms = col("syms")
    seg.select(split(col("seg"), " ").as("syms"), col("freq"))
      .select(slice(syms, lit(1), size(syms) - 1).as("a"),
        slice(syms, lit(2), size(syms) - 1).as("b"), col("freq"))
      .select(explode(arrays_zip(col("a"), col("b"))).as("p"), col("freq"))
      .select(col("p.a").as("x"), col("p.b").as("y"), col("freq"))
      .groupBy("x", "y").agg(sum("freq").cast("long").as("n"))
  }

  /** One merge as a column op: replace non-overlapping, left-to-right
    * occurrences of symbol pair (x, y) with the concatenation. The
    * lookarounds pin symbol boundaries (a match may not touch adjacent
    * non-space chars), so "w e" never fires inside "we st". */
  def mergeExpr(seg: Column, x: String, y: String): Column = {
    val pat = "(?<!\\S)" + java.util.regex.Pattern.quote(x + " " + y) + "(?!\\S)"
    val rep = java.util.regex.Matcher.quoteReplacement(x + y)
    regexp_replace(seg, lit(pat), lit(rep))
  }

  /** The encode fold: the full merge list applied in training order, once
    * each — ONE fixed chain of codegen'd regexp_replace calls. */
  def applyMerges(seg: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(seg) { case (c, (x, y)) => mergeExpr(c, x, y) }

  /** Train a model of ≤ `numMerges` merges; stops early when the best
    * remaining pair's weighted count drops below `minCount` (merging
    * singletons memorizes noise — the paper's frequency threshold). */
  def train(docs: DataFrame, numMerges: Int, minCount: Long = 2L): Model =
    trainLoop(wordFreq(docs).withColumn("seg", charSeg(col("word"))),
      numMerges, minCount)

  /** The merge loop over an arbitrary initial (word, freq, seg) table —
    * shared by the char-level trainer above and the byte-level one
    * ([[ByteBpe.train]]): the machinery is segmentation-agnostic (any
    * space-free symbol alphabet), only the initial segmentation
    * differs between the families. */
  private[text] def trainLoop(vocab0: DataFrame, numMerges: Int,
      minCount: Long): Model = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var vocab = vocab0.localCheckpoint()
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      // deterministic argmax: count desc, then pair lexicographic — the
      // 1-row collect is the frozen-model discipline (R rows total ever
      // reach the driver, never the vocabulary)
      val top = pairStats(vocab)
        .orderBy(desc("n"), asc("x"), asc("y")).limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) done = true
      else {
        val (x, y) = (top(0).getString(0), top(0).getString(1))
        merges += ((x, y))
        vocab = vocab
          .withColumn("seg", mergeExpr(col("seg"), x, y))
          .localCheckpoint()
      }
    }
    Model(merges.toSeq)
  }

  /** Final training-state segmentation table (word, freq, seg) — the
    * byproduct "the vocab table IS the tokenizer" view; equals
    * [[encodeWords]] of the training words (BpeSpec's central gate). */
  def trainedSeg(docs: DataFrame, model: Model): DataFrame =
    wordFreq(docs).withColumn("seg",
      applyMerges(charSeg(col("word")), model.merges))

  /** Above this merge count the regex chain stops being viable (one
    * nested regexp_replace per merge — a production 30k-merge vocabulary
    * would be a 30k-deep expression tree) and encode dispatches to the
    * [[org.apache.spark.sql.graftexpr.BpeEncodeExpr]] kernel: the merge
    * list rides OUT of the expression tree as a task-shared reference
    * object and each word replays in O(L log L) via the classic
    * rank-heap, PROVEN equal to the chain (BpeSpec + a randomized
    * property). */
  val KernelThreshold = 64

  /** The regex-chain form — the REFERENCE semantics (training replay by
    * construction; every equality gate is stated against this). */
  def encodeWordChain(word: Column, model: Model): Column =
    split(applyMerges(charSeg(word), model.merges), " ")

  /** The kernel form — vocabulary-size-independent expression tree. */
  def encodeWordKernel(word: Column, model: Model): Column =
    org.apache.spark.sql.graftexpr.BpeEncodeExpr.column(word, model.merges)

  /** Encode a word column to its subword array. */
  def encodeWord(word: Column, model: Model): Column =
    if (model.size <= KernelThreshold) encodeWordChain(word, model)
    else encodeWordKernel(word, model)

  /** Encode a corpus: (doc_id, pos, word, subs, n_subs), one row per word
    * occurrence, order recoverable by (doc_id, pos). The regex chain runs
    * once per DISTINCT word (input-vocabulary-bounded), then a broadcast
    * join fans the segmentations back to occurrences — at 100 TB the
    * vocab side stays kB-to-GB scale while occurrences stream map-side;
    * if a pathological vocab outgrows broadcast, the same plan degrades
    * to a shuffle join on `word` without changing semantics. OOV words
    * take the identical expression path — there is no "unknown" token,
    * unseen words just segment further (the paper's open-vocabulary
    * property). */
  def encode(docs: DataFrame, model: Model): DataFrame =
    encodeBy(docs, encodeWord(_, model))

  /** The distinct-word + broadcast-fan-back encode plumbing over an
    * arbitrary per-word encoder — shared with [[ByteBpe.encode]]. */
  private[text] def encodeBy(docs: DataFrame,
      encoder: Column => Column): DataFrame = {
    val occ = docs
      .select(col("doc_id"), posexplode(tokens).as(Seq("pos", "word")))
    val vocab = occ.select("word").distinct()
      .withColumn("subs", encoder(col("word")))
    occ.join(broadcast(vocab), "word")
      .select(col("doc_id"), col("pos"), col("word"), col("subs"),
        size(col("subs")).as("n_subs"))
  }

  /** Total encoded symbol count of a corpus under a model — the
    * compression metric BpeSpec's monotonicity gate measures (more merges
    * can only shrink it: each merge application only ever joins two
    * symbols into one). */
  def totalSymbols(docs: DataFrame, model: Model): Long =
    encode(docs, model).agg(sum("n_subs").cast("long")).head().getLong(0)

  /** The pipeline ENDPOINT: raw documents → subword stream → fixed-size
    * training contexts, entirely in-engine. [[encode]]'s per-word rows
    * flatten to one ordered subword stream per document (posexplode over
    * subs — (pos, sub_pos) is the total order), then pack greedily into
    * bins of ≤ `binSize` subwords per shard (`source`-partitioned running
    * count — the text_pack_bins shape: a GLOBAL cumsum would serialize
    * the corpus, per-shard windows keep it partitioned; a document never
    * splits across bins, the standard document-boundary packing).
    * Output: (source, bin, doc_id, pos, sub_pos, sub) — the materialized
    * training shards, order recoverable per bin.
    *
    * Scale shape: one corpus-sized encode (vocab-bounded regex chain +
    * broadcast fan-back), one doc-level aggregate for the per-doc
    * subword counts, one source-partitioned window, and the final join
    * fans bins back onto the subword rows by doc_id — no global pass
    * anywhere. */
  def packCorpus(docs: DataFrame, model: Model,
      binSize: Long = 512L): DataFrame =
    packEncoded(docs, encode(docs, model), binSize)

  /** The packing stage alone, over any (doc_id, pos, word, subs, n_subs)
    * encoding — shared by BPE and the unigram tokenizer
    * ([[Unigram.packCorpus]]), so "encode then pack" cannot drift
    * between tokenizer families. */
  private[text] def packEncoded(docs: DataFrame, enc: DataFrame,
      binSize: Long): DataFrame = {
    val perDoc = enc.groupBy("doc_id")
      .agg(sum("n_subs").cast("long").as("doc_subs"))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = perDoc
      .withColumn("cum", sum(col("doc_subs")).over(w))
      .select(col("doc_id"), col("source"),
        expr(s"(cum - doc_subs) div $binSize").as("bin"))
    enc
      .select(col("doc_id"), col("pos"),
        posexplode(col("subs")).as(Seq("sub_pos", "sub")))
      .join(binned, "doc_id")
      .select(col("source"), col("bin"), col("doc_id"), col("pos"),
        col("sub_pos"), col("sub"))
  }

  /** Round-1 pair statistics as a declared, oracle-checked query: the
    * weighted adjacent-pair counts over the initial character
    * segmentation — the exact table the first training argmax reads
    * (top-100; count desc, pair lexicographic). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_pairs" -> ((s, d) => {
      val wf = wordFreq(Tables.documents(s, d))
        .withColumn("seg", charSeg(col("word")))
      pairStats(wf)
        .orderBy(desc("n"), asc("x"), asc("y"))
        .limit(100)
    }))

  def oracleSql: Map[String, String] = Map(
    // identical construction: word counts → char segmentation (RE2 spells
    // the same per-char replacement with \1 and a 'g' flag) → adjacent
    // pairs riding a space-joined string (symbols are space-free by
    // construction) → freq-weighted counts
    "text_bpe_pairs" ->
      """WITH wf AS (SELECT w AS word, COUNT(*) AS freq FROM
        |  (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |s AS (SELECT freq, string_split(
        |    regexp_replace(word, '(?s)(.)', '\1 ', 'g') || '</w>', ' ') AS syms
        |  FROM wf),
        |p AS (SELECT freq, unnest(list_transform(range(1, len(syms)),
        |    i -> syms[i] || ' ' || syms[i + 1])) AS pr FROM s)
        |SELECT string_split(pr, ' ')[1] AS x, string_split(pr, ' ')[2] AS y,
        |  CAST(SUM(freq) AS BIGINT) AS n
        |FROM p GROUP BY x, y
        |ORDER BY n DESC, x ASC, y ASC LIMIT 100""".stripMargin)
}
