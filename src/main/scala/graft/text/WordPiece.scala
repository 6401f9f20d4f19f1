package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** WordPiece tokenizer — the THIRD public tokenizer family beside BPE
  * ([[Bpe]], bottom-up frequency merges) and unigram-LM ([[Unigram]],
  * top-down EM pruning): bottom-up like BPE, but each merge maximizes
  * the LIKELIHOOD GAIN of a unigram LM over the segmentation rather than
  * raw pair frequency — score(x, y) = count(xy) / (count(x)·count(y))
  * (Schuster & Nakajima 2012; the trainer the HuggingFace tokenizers
  * library publishes, and the BERT vocabulary's construction). Encoding
  * is NOT a merge replay: it is greedy longest-match-first over the
  * final vocabulary with `##` continuation prefixes and a WHOLE-WORD
  * `[UNK]` on any unmatched position (Devlin et al. 2019 — the
  * tensorflow-text reference algorithm), which is why the family
  * segments differently from both siblings and earns its own row.
  *
  * Scale shape is [[Bpe.train]]'s EXACTLY: ONE corpus-sized pass
  * ([[Bpe.wordFreq]], reused verbatim), every training round on the
  * (word, freq) VOCABULARY table, only the per-round argmax row (R rows
  * total) ever reaching the driver; encode runs the kernel once per
  * DISTINCT word and broadcast-fans back; packing REUSES
  * [[Bpe.packEncoded]] so "encode then pack" cannot drift across the
  * three families.
  *
  * Determinism: pair/symbol counts are BIGINT sums (order-free); the
  * per-round score is ONE fixed IEEE tree (n / (cx·cy) on doubles —
  * exactly-rounded, identical cross-engine) with the (score DESC, x, y)
  * total order breaking ties — so the trained model is a pure function
  * of the corpus (spec'd at 2 ≡ 7 partitionings), and the declared
  * `text_wordpiece_pairs` anchor oracles the exact scoring table the
  * first training argmax reads (the `text_bpe_pairs` posture). Training
  * itself is TEST per SURVEY §7.5.7 (driver loop).
  */
object WordPiece {

  val Unk: String =
    org.apache.spark.sql.graftexpr.WordPieceEncodeExpr.Unk
  val Cont: String =
    org.apache.spark.sql.graftexpr.WordPieceEncodeExpr.Cont

  /** Frozen model: the vocabulary (initial alphabet in lexicographic
    * order, then merged pieces in training order) plus the merge list
    * that built it (kept for inspection; encode reads only `vocab`). */
  final case class Model(vocab: Seq[String], merges: Seq[(String, String)])

  /** Initial WordPiece segmentation of a word as a spaced string:
    * "low" → "l ##o ##w" — first code point bare, continuations
    * `##`-prefixed. Built from the SAME per-code-point split idiom as
    * [[Bpe.charSeg]]/the unigram seed (DOTALL so line terminators
    * segment; trim strips only the injected trailing space — words are
    * space-split upstream, so none occur inside), composed with slice +
    * transform instead of a lookbehind because the oracle's RE2 has no
    * lookaround. */
  def charSegWp(word: Column): Column = {
    val chars = split(trim(regexp_replace(word, "(?s)(.)", "$1 ")), " ")
    val contd = transform(
      slice(chars, lit(2), greatest(size(chars) - 1, lit(0))),
      c => concat(lit(Cont), c))
    array_join(concat(slice(chars, 1, 1), contd), " ")
  }

  /** Per-symbol frequency-weighted counts of a segmentation table —
    * the score's denominators. Vocabulary-bounded. */
  private[text] def symStats(seg: DataFrame): DataFrame =
    seg.select(explode(split(col("seg"), " ")).as("sym"), col("freq"))
      .groupBy("sym").agg(sum("freq").cast("long").as("c"))

  /** The WordPiece selection table: adjacent pairs ([[Bpe.pairStats]]
    * verbatim) joined with both symbols' counts and scored
    * n / (cx·cy) — one fixed IEEE tree over exact BIGINTs. The symbol
    * table is vocabulary-bounded, so both joins broadcast. */
  private[text] def pairScores(seg: DataFrame): DataFrame = {
    val syms = symStats(seg)
    Bpe.pairStats(seg)
      .join(broadcast(syms.select(col("sym").as("x"), col("c").as("cx"))),
        "x")
      .join(broadcast(syms.select(col("sym").as("y"), col("c").as("cy"))),
        "y")
      .select(col("x"), col("y"), col("n"), col("cx"), col("cy"),
        (col("n").cast("double")
          / (col("cx").cast("double") * col("cy").cast("double")))
          .as("score"))
  }

  /** One merge: (x, y) → x ++ y-without-## (the continuation prefix
    * belongs to the pair's FIRST symbol boundary, so the merged symbol
    * keeps x's form: "l"+"##o" → "lo", "##o"+"##w" → "##ow"). Same
    * boundary-pinned regex as [[Bpe.mergeExpr]]. */
  private def mergeExprWp(seg: Column, x: String, y: String): Column = {
    val merged = x + y.stripPrefix(Cont)
    val pat = "(?<!\\S)" +
      java.util.regex.Pattern.quote(x + " " + y) + "(?!\\S)"
    regexp_replace(seg, lit(pat),
      lit(java.util.regex.Matcher.quoteReplacement(merged)))
  }

  /** Train a model of ≤ `numMerges` merges; a pair is eligible while its
    * weighted count is ≥ `minCount` (the BPE noise threshold — without
    * it the 1/(cx·cy) numerator makes hapax pairs look maximally
    * likely). */
  def train(docs: DataFrame, numMerges: Int, minCount: Long = 2L): Model = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var vocabT = Bpe.wordFreq(docs)
      .withColumn("seg", charSegWp(col("word")))
      .localCheckpoint()
    // initial alphabet: every bare/## symbol the corpus starts with —
    // alphabet-bounded, the one non-argmax driver collect
    val alphabet = symStats(vocabT).select("sym")
      .orderBy("sym").collect().map(_.getString(0)).toSeq
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    val pieces = mutable.ArrayBuffer.empty[String]
    var done = false
    while (!done && merges.length < numMerges) {
      val top = pairScores(vocabT).filter(col("n") >= minCount)
        .orderBy(desc("score"), asc("x"), asc("y")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (x, y) = (top(0).getString(0), top(0).getString(1))
        merges += ((x, y))
        pieces += (x + y.stripPrefix(Cont))
        vocabT = vocabT
          .withColumn("seg", mergeExprWp(col("seg"), x, y))
          .localCheckpoint()
      }
    }
    Model(alphabet ++ pieces.toSeq, merges.toSeq)
  }

  /** Greedy longest-match encode of a word column — the
    * `wordpiece_encode` kernel (vocabulary as a task-shared reference
    * object; B11.4 #15). */
  def encodeWord(word: Column, model: Model): Column =
    org.apache.spark.sql.graftexpr.WordPieceEncodeExpr
      .column(word, model.vocab)

  /** Encode a corpus: (doc_id, pos, word, subs, n_subs) — the
    * [[Bpe.encode]] shape verbatim (kernel once per DISTINCT word,
    * broadcast fan-back). */
  def encode(docs: DataFrame, model: Model): DataFrame = {
    val occ = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
    val vocab = occ.select("word").distinct()
      .withColumn("subs", encodeWord(col("word"), model))
    occ.join(broadcast(vocab), "word")
      .select(col("doc_id"), col("pos"), col("word"), col("subs"),
        size(col("subs")).as("n_subs"))
  }

  /** Raw documents → WordPiece subword stream → fixed-size training
    * bins: [[Bpe.packEncoded]] REUSED, the third family through the one
    * packing stage. */
  def packCorpus(docs: DataFrame, model: Model,
      binSize: Long = 512L): DataFrame =
    Bpe.packEncoded(docs, encode(docs, model), binSize)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Round-1 selection table as a declared, oracle-checked query: the
    // exact (pair count, symbol counts, likelihood score) table the
    // first training argmax reads over the initial segmentation —
    // top-50 by (score desc, pair lexicographic).
    "text_wordpiece_pairs" -> ((s, d) => {
      val wf = Bpe.wordFreq(Tables.documents(s, d))
        .withColumn("seg", charSegWp(col("word")))
      pairScores(wf)
        .orderBy(desc("score"), asc("x"), asc("y"))
        .limit(50)
    }))

  def oracleSql: Map[String, String] = Map(
    // identical construction: word counts → per-code-point split (the
    // proven idiom) → bare-first/##-continuation symbols via
    // slice+transform (RE2 has no lookbehind) → adjacent pairs and
    // per-symbol counts off the SAME syms table → one double tree
    "text_wordpiece_pairs" ->
      """WITH wf AS (SELECT w AS word, COUNT(*) AS freq FROM
        |  (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |cs AS (SELECT freq, string_split(
        |    trim(regexp_replace(word, '(?s)(.)', '\1 ', 'g')), ' ')
        |    AS chars FROM wf),
        |s AS (SELECT freq, list_concat(list_slice(chars, 1, 1),
        |    list_transform(list_slice(chars, 2, len(chars)),
        |      c -> '##' || c)) AS syms FROM cs),
        |p AS (SELECT freq, unnest(list_transform(range(1, len(syms)),
        |    i -> syms[i] || ' ' || syms[i + 1])) AS pr FROM s),
        |pc AS (SELECT string_split(pr, ' ')[1] AS x,
        |    string_split(pr, ' ')[2] AS y,
        |    CAST(SUM(freq) AS BIGINT) AS n FROM p GROUP BY x, y),
        |sym AS (SELECT sym, CAST(SUM(freq) AS BIGINT) AS c FROM
        |  (SELECT freq, unnest(syms) AS sym FROM s) GROUP BY sym)
        |SELECT pc.x, pc.y, pc.n, cx.c AS cx, cy.c AS cy,
        |  CAST(pc.n AS DOUBLE) / (CAST(cx.c AS DOUBLE)
        |    * CAST(cy.c AS DOUBLE)) AS score
        |FROM pc JOIN sym cx ON cx.sym = pc.x
        |  JOIN sym cy ON cy.sym = pc.y
        |ORDER BY score DESC, x ASC, y ASC LIMIT 50""".stripMargin)
}
