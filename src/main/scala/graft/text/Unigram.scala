package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer — the SECOND dominant public tokenizer
  * family (Kudo 2018, "Subword Regularization: Improving Neural Network
  * Translation Models with Multiple Subword Candidates" — the model
  * behind SentencePiece's unigram mode), beside [[Bpe]]: where BPE is
  * bottom-up greedy merging, the unigram model is top-down — start from
  * a LARGE seed piece inventory, fit piece probabilities by EM, prune to
  * the target vocabulary, and encode each word as its maximum-likelihood
  * segmentation (Viterbi). The two families segment differently, so a
  * pipeline that meters token budgets (B9.33/B9.61) must support both.
  *
  * The [[Bpe]] scale shape is kept EXACTLY: training never touches the
  * corpus after ONE word-count pass — every round operates on the
  * (word, freq) VOCABULARY table, and the piece inventory (the model) is
  * the only thing that ever reaches the driver (seed-size bounded, the
  * frozen-model discipline; never the corpus, never the vocabulary).
  *
  * DELIBERATE DEVIATION, documented: the E-step is VITERBI (hard) EM —
  * each word votes its single best segmentation, weighted by word
  * frequency — not the paper's forward-backward expected counts. Soft
  * EM's fractional counts are floats whose cross-word sum has no
  * canonical order, so the trained model would depend on partitioning —
  * the repo-wide determinism discipline (SURVEY §7.5) forbids that.
  * Hard-EM counts stay BIGINT (order-free sums), so the model is a pure
  * function of the corpus at ANY partitioning (UnigramSpec pins train at
  * 2 ≡ 7 shuffle partitions). Viterbi-EM is the classical hard variant
  * and reaches the same fixed point wherever the lattice posterior is
  * concentrated — UnigramVolume proves exact planted-morphology recovery
  * at 1M docs.
  *
  * Whole-word memorization is bounded by [[MaxPieceLen]] (SentencePiece's
  * `max_sentencepiece_length`): frequent words at or under the cap CAN
  * become single pieces — correct unigram behavior — while longer words
  * must segment.
  *
  * Encode is [[org.apache.spark.sql.graftexpr.UnigramEncodeExpr]] — a
  * codegen'd Viterbi kernel with the piece table as a task-shared
  * reference object — run once per DISTINCT word and broadcast back to
  * occurrences (the [[Bpe.encode]] plan verbatim). Single code points
  * absent from the table score a virtual count of one, so encoding is
  * total and lossless on ANY input (round-trip gated in UnigramSpec).
  */
object Unigram {

  /** Max piece length in code points (SentencePiece's
    * max_sentencepiece_length; 6 covers the sf corpus' morphology while
    * keeping the seed fan-out per word ≤ 6·|word|). */
  val MaxPieceLen = 6

  /** Prune factor per EM round: multis shrink to max(target, 75% of
    * current) — SentencePiece's shrinking_factor, guaranteeing
    * termination while letting counts re-concentrate between cuts. */
  val ShrinkNum = 3
  val ShrinkDen = 4

  /** Frozen model: piece → BIGINT count (training-fixed-point Viterbi
    * counts; probabilities are count/total, derived in the kernel).
    * Single code points are always present (coverage floor). */
  final case class Model(pieces: Seq[(String, Long)]) {
    def size: Int = pieces.length
    def multis: Int =
      pieces.count { case (p, _) => p.codePointCount(0, p.length) > 1 }
  }

  private def tokens: Column = split(col("text"), " ")

  /** Code-point array of a word (the [[Bpe.charSeg]] trick: words are
    * space-split upstream, so space is a safe delimiter; DOTALL so line
    * terminators segment too). */
  private def charsOf(word: Column): Column = {
    val seg = split(regexp_replace(word, "(?s)(.)", "$1 "), " ")
    slice(seg, lit(1), size(seg) - 1)
  }

  /** All substrings of 1..[[MaxPieceLen]] code points of every distinct
    * word, with freq-weighted occurrence counts — the seed candidate
    * table (vocabulary-bounded fan-out: ≤ MaxPieceLen rows per word
    * character). (piece, n, cp_len). Empty words (double-space tokens)
    * are filtered BEFORE the start fan-out: `sequence(1, 0)` would
    * descend, not vanish. */
  private[text] def seedCandidates(wf: DataFrame): DataFrame =
    wf.select(col("freq"), charsOf(col("word")).as("cs"))
      .filter(size(col("cs")) >= 1 && col("cs").getItem(0) =!= "")
      .select(col("freq"), col("cs"),
        explode(sequence(lit(1), size(col("cs")))).as("start"))
      .select(col("freq"), col("cs"), col("start"),
        explode(sequence(lit(1),
          least(lit(MaxPieceLen), size(col("cs")) - col("start") + 1)))
          .as("len"))
      .select(
        array_join(slice(col("cs"), col("start"), col("len")), "")
          .as("piece"),
        col("len"), col("freq"))
      .groupBy("piece", "len").agg(sum("freq").cast("long").as("n"))

  /** Viterbi-count one E-step: every distinct word votes its best
    * segmentation under `model`, weighted by freq. (piece, n) —
    * pieces with no votes get no row. */
  private[text] def viterbiCounts(wf: DataFrame, model: Model): DataFrame =
    wf.select(col("freq"),
        explode(org.apache.spark.sql.graftexpr.UnigramEncodeExpr
          .column(col("word"), model.pieces)).as("piece"))
      .groupBy("piece").agg(sum("freq").cast("long").as("n"))

  /** Train: seed → (E-step, prune) rounds until the multi-char inventory
    * fits `targetMultis` → one final E-step to settle the counts the
    * encoder ships. Every collect is model-bounded (≤ seedSize rows).
    *
    * The returned inventory is ≤ chars + targetMultis: pieces whose
    * Viterbi count hits zero die immediately (they are unreachable under
    * the very model the encoder will use), so the final vocabulary is a
    * budget, not a quota — the SentencePiece posture. Single chars are
    * NEVER pruned (count floor 1): they are the coverage guarantee. */
  def train(docs: DataFrame, targetMultis: Int,
      seedSize: Int = 0, minSeedCount: Long = 2L): Model = {
    require(targetMultis >= 0)
    val seeds = if (seedSize > 0) seedSize else math.max(8 * targetMultis, 64)
    val wf = Bpe.wordFreq(docs).localCheckpoint()

    // seed inventory: every single char (coverage) + the top multi-char
    // candidates by (count desc, piece asc) — deterministic
    val cand = seedCandidates(wf).localCheckpoint()
    val chars = cand.filter(col("len") === 1)
      .select("piece", "n").collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    val multis0 = cand.filter(col("len") > 1 && col("n") >= minSeedCount)
      .orderBy(desc("n"), asc("piece")).limit(seeds)
      .select("piece", "n").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    var model = Model(chars.toSeq ++ multis0.toSeq)
    var nMultis = multis0.length

    var done = nMultis <= targetMultis
    while (!done) {
      val counts = viterbiCounts(wf, model).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val keep = math.max(targetMultis, nMultis * ShrinkNum / ShrinkDen)
      val survivors = model.pieces
        .filter(p => p._1.codePointCount(0, p._1.length) > 1)
        .flatMap { case (p, _) => counts.get(p).filter(_ > 0L).map(p -> _) }
        .sortBy { case (p, n) => (-n, p) }
        .take(keep)
      val charRows = chars.map { case (c, _) =>
        c -> math.max(1L, counts.getOrElse(c, 0L)) }
      model = Model(charRows.toSeq ++ survivors)
      // keep < nMultis whenever nMultis > target, so this terminates
      done = survivors.length <= targetMultis
      nMultis = survivors.length
    }

    // settle: final counts under the final inventory (what encode ships)
    val fin = viterbiCounts(wf, model).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Model(chars.map { case (c, _) =>
        c -> math.max(1L, fin.getOrElse(c, 0L)) }.toSeq ++
      model.pieces
        .filter(p => p._1.codePointCount(0, p._1.length) > 1)
        .flatMap { case (p, _) => fin.get(p).filter(_ > 0L).map(p -> _) }
        .sortBy { case (p, n) => (-n, p) })
  }

  /** Viterbi-encode a word column under a frozen model. */
  def encodeWord(word: Column, model: Model): Column =
    org.apache.spark.sql.graftexpr.UnigramEncodeExpr
      .column(word, model.pieces)

  /** Encode a corpus: (doc_id, pos, word, subs, n_subs) — the
    * [[Bpe.encode]] plan verbatim (kernel once per distinct word,
    * broadcast fan-back to occurrences). */
  def encode(docs: DataFrame, model: Model): DataFrame = {
    val occ = docs
      .select(col("doc_id"), posexplode(tokens).as(Seq("pos", "word")))
    val vocab = occ.select("word").distinct()
      .withColumn("subs", encodeWord(col("word"), model))
    occ.join(broadcast(vocab), "word")
      .select(col("doc_id"), col("pos"), col("word"), col("subs"),
        size(col("subs")).as("n_subs"))
  }

  /** Total encoded symbol count — the cross-family compression metric
    * (UnigramVolume compares it against [[Bpe.totalSymbols]] at equal
    * vocabulary). */
  def totalSymbols(docs: DataFrame, model: Model): Long =
    encode(docs, model).agg(sum("n_subs").cast("long")).head().getLong(0)

  /** Raw documents → subword stream → fixed-size training contexts:
    * [[Bpe.packEncoded]] REUSED verbatim, so the packing endpoint is
    * tokenizer-family-agnostic. */
  def packCorpus(docs: DataFrame, model: Model,
      binSize: Long = 512L): DataFrame =
    Bpe.packEncoded(docs, encode(docs, model), binSize)

  /** The seed-candidate statistics as a declared, oracle-checked query —
    * the [[Bpe.queries]] `text_bpe_pairs` posture: training itself is
    * TEST-gated (float likelihoods, §7.5.7), but the exact integer table
    * the FIRST training step reads is hash-checkable, anchoring the
    * whole family's fan-out (code-point chars, substring windows,
    * freq-weighted counts) against an independent engine. Top-100 by
    * (count desc, piece asc) — piece determines its own length, so the
    * tie-break is total. */
  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] = Map(
    "text_unigram_seed" -> ((s, d) =>
      seedCandidates(Bpe.wordFreq(graft.core.Tables.documents(s, d)))
        .select(col("piece"), col("len").cast("long").as("len"), col("n"))
        .orderBy(desc("n"), asc("piece"))
        .limit(100)))

  def oracleSql: Map[String, String] = Map(
    // identical construction: word counts → per-code-point split (RE2
    // spells the same replacement; trim strips only the injected
    // trailing space — words are space-split upstream, so none occur
    // inside) → substring windows of 1..MaxPieceLen code points →
    // freq-weighted counts
    "text_unigram_seed" ->
      s"""WITH wf AS (SELECT w AS word, COUNT(*) AS freq FROM
        |  (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |cs AS (SELECT freq, string_split(
        |    trim(regexp_replace(word, '(?s)(.)', '\\1 ', 'g')), ' ')
        |    AS chars FROM wf),
        |ok AS (SELECT * FROM cs WHERE len(chars) >= 1 AND chars[1] != ''),
        |st AS (SELECT freq, chars,
        |    unnest(range(1, len(chars) + 1)) AS start FROM ok),
        |pc AS (SELECT freq,
        |    array_to_string(list_slice(chars, start, start + l - 1), '')
        |      AS piece, l
        |  FROM (SELECT freq, chars, start,
        |      unnest(range(1, least($MaxPieceLen, len(chars) - start + 1)
        |        + 1)) AS l
        |    FROM st))
        |SELECT piece, CAST(l AS BIGINT) AS len,
        |  CAST(SUM(freq) AS BIGINT) AS n
        |FROM pc GROUP BY piece, l
        |ORDER BY n DESC, piece ASC LIMIT 100""".stripMargin)
}
