package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Text-analytics operators over the `documents` table — SURVEY.md §2 B9 and
  * the training-data-pipeline checklist: token frequencies, per-language
  * stats, keyword/quality scoring, heuristic language-ID, rolling-hash
  * document fingerprints, exact dedup.
  *
  * All scoring is pure integer/rational arithmetic (counts and single double
  * divisions) so every query here is DuckDB-oracle eligible. At 100 TB the
  * shapes are: per-row narrow transforms (no shuffle), one groupBy on a
  * low-cardinality key (lang/source), and one token-explode aggregation whose
  * map-side partial aggregation bounds the shuffle by vocabulary size, not
  * corpus size.
  */
object TextOps {

  private def tokens: Column = split(col("text"), " ")

  private val keywords = Seq("data", "table", "join", "query", "stream")

  /** Marker-token lists for the heuristic language-ID. Synthetic corpus =
    * shared vocabulary, so the *prediction* is arbitrary — what matters is
    * that the rule is deterministic and identically expressed in the oracle. */
  private val enMarkers = Seq("the", "a", "fast", "slow", "big", "small")
  private val deMarkers = Seq("der", "die", "das", "und", "schnell")
  private val frMarkers = Seq("le", "la", "et", "vite", "grand")

  private def hitCount(markers: Seq[String]): Column =
    size(filter(tokens, t => t.isin(markers.map(lit): _*)))

  private def sqlHits(markers: Seq[String]): String = {
    val in = markers.map(m => s"'$m'").mkString(", ")
    s"len(list_filter(string_split(text, ' '), t -> t IN ($in)))"
  }

  /** PII patterns for `text_pii_mask`, shared with the oracle SQL. Kept to
    * constructs with identical Java-regex/RE2 semantics (character classes,
    * bounded repetition — no lookaround, no \b). */
  private val phonePat = "555-[0-9]{3}-[0-9]{4}"
  private val emailPat = "[a-z0-9.]+@[a-z0-9.]+"

  /** Mixture weights for `sample_mix`, in sixteenths of each language's
    * documents (md5 first hex nibble < budget); languages not listed get
    * [[mixDefault]]. One constants source generates both the Column chain
    * and the oracle CASE so the two cannot drift. */
  private[text] val mixWeights: Seq[(String, Int)] = Seq("en" -> 8,
    "de" -> 4, "fr" -> 2)
  private[text] val mixDefault = 1

  /** Token budget for `sample_budget`: each language's quota is its
    * [[mixWeights]] share in sixteenths of this total. Sized so every
    * language has both selected and excluded documents on the fixture —
    * the interesting regime for a budget filter. */
  private val budgetTokens = 20000L
  private[text] def quotaOf(w: Int): Long = budgetTokens * w / 16

  /** `text_chunk` geometry: windows of ≤ [[chunkWindow]] tokens starting
    * every [[chunkStride]] tokens (overlap = window − stride = 8). */
  private val chunkWindow = 32
  private val chunkStride = 24

  /** `split_assign` projection, one SQL string per output column, valid in
    * BOTH Spark SQL and DuckDB (md5 / substr / instr / CASE agree): bucket
    * = the id's first two md5 hex nibbles as an int in 0..255, split by
    * [[splitTrainLt]]/[[splitValLt]]. Single source for query and oracle. */
  private val splitTrainLt = 204 // 204/256 ≈ 79.7% train
  private val splitValLt = 230   //  26/256 ≈ 10.2% val; rest test
  private def md5Bucket256Sql(idExpr: String): String = {
    val hx = "'0123456789abcdef'"
    val m = s"md5(CAST($idExpr AS STRING))"
    s"(instr($hx, substr($m, 1, 1)) - 1) * 16 + (instr($hx, substr($m, 2, 1)) - 1)"
  }
  /** The chunking projection over any documents-shaped input — shared by
    * the declared `text_chunk` query (which adds the determinism orderBy)
    * and the streaming twin (per-row explode is append-mode legal as-is),
    * so the two can never drift. */
  def chunk(docs: DataFrame): DataFrame = {
    val n = size(tokens).cast("long")
    docs
      .select(col("doc_id"), tokens.as("toks"), n.as("n"))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0L), greatest(col("n") - 1L, lit(0L)),
          lit(chunkStride.toLong))).as("start"))
      .select(col("doc_id"),
        expr(s"start div $chunkStride").as("chunk_id"),
        array_join(slice(col("toks"), (col("start") + 1).cast("int"),
          lit(chunkWindow)), " ").as("chunk_text"),
        least(lit(chunkWindow.toLong), col("n") - col("start"))
          .as("n_tokens"))
  }

  private[text] def splitAssignCols: Seq[String] = {
    val b = md5Bucket256Sql("doc_id")
    Seq("doc_id",
      s"CAST($b AS BIGINT) AS bucket",
      s"CASE WHEN ($b) < $splitTrainLt THEN 'train' " +
        s"WHEN ($b) < $splitValLt THEN 'val' ELSE 'test' END AS split")
  }

  /** `text_collocations` knobs: a pair must appear ≥ [[colloMinCount]]
    * times, and the word2vec discount δ = [[colloDelta]] is subtracted
    * from its count before scoring (suppresses rare-pair noise). */
  private val colloMinCount = 3
  private val colloDelta = 1

  /** Collocation (phrase) mining — the word2vec phrase detector (Mikolov
    * et al. 2013, "Distributed Representations of Words and Phrases",
    * §4): score(w1 w2) = (c(w1w2) − δ) · N / (c(w1) · c(w2)), a PMI-style
    * ratio of observed to independence-expected pair frequency. The
    * numerator and denominator are exact integer products (< 2⁵³ far
    * beyond this corpus), so the score is ONE exactly-rounded division —
    * hash-exact against the oracle (the text_tfidf discipline). Scale
    * shape: the adjacent-pair fan-out is [[LmScore.transitions]]'s
    * lambda-free slice+zip, the pair groupBy is the one corpus-sized
    * shuffle (map-side partial agg), the unigram table is
    * vocabulary-bounded and BROADCAST back twice, N rides a 1-row
    * broadcast — the text_lm_score plan family. */
  def collocations(docs: DataFrame): DataFrame = {
    val pair = LmScore.transitions(docs)
      .groupBy(col("prev").as("w1"), col("cur").as("w2"))
      .agg(count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= colloMinCount)
    val uni = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val n = uni.agg(sum("cu").as("n_tokens"))
    pair
      .join(broadcast(uni.select(col("w").as("w1"), col("cu").as("c_w1"))),
        Seq("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("cu").as("c_w2"))),
        Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c_pair"), col("c_w1"), col("c_w2"),
        (((col("c_pair") - colloDelta) * col("n_tokens")).cast("double") /
          (col("c_w1") * col("c_w2")).cast("double")).as("score"))
  }

  /** `export_shuffle` geometry: output-shard count. At a real export this
    * is O(cluster) — parallelism EQUALS the shard count, which a training
    * export sets to hundreds/thousands of output files; 16 keeps the
    * oracle readable. */
  private val exportShards = 16

  /** `export_shuffle` projection — one SQL string per column, valid in
    * BOTH Spark SQL and DuckDB (single source for query and oracle):
    * shard = md5-bucket % [[exportShards]], pos = rank within the shard
    * by (md5 hex key, doc_id). */
  private[text] def exportShuffleCols: Seq[String] = {
    val b = md5Bucket256Sql("doc_id")
    val key = "md5(CAST(doc_id AS STRING))"
    Seq("doc_id",
      s"CAST(($b) % $exportShards AS BIGINT) AS shard",
      s"$key AS sort_key",
      s"CAST(row_number() OVER (PARTITION BY ($b) % $exportShards " +
        s"ORDER BY $key, doc_id) AS BIGINT) AS pos")
  }

  /** `sample_domain_cap` knob: max documents kept per source domain. */
  private val domainCap = 10

  /** `sample_domain_cap` projection (shared Spark/DuckDB SQL): rank within
    * each source by (md5 hex of doc_id, doc_id) — the deterministic
    * uniform order every sampler here uses — and the query keeps
    * rk ≤ [[domainCap]]. */
  private[text] def domainCapCols: Seq[String] = Seq(
    "doc_id", "source", "lang", "n_chars",
    "CAST(row_number() OVER (PARTITION BY source " +
      "ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS BIGINT) AS rk")

  /** Deterministic subword-token estimate — the budget-meter realism fix
    * (VERDICT r8 what's-missing #2). Whitespace tokens undercount what a
    * subword tokenizer (BPE/unigram) actually bills: long words split into
    * several pieces. A true BPE count needs a learned merge table — not a
    * pure function of the text, so neither engine-friendly nor
    * oracle-able — but the standard public rule of thumb is ~4 characters
    * per subword token, applied PER WORD with a ceiling so every word
    * costs at least one token:
    *
    *   est(text) = Σ_words ceil(len(word) / 4)
    *
    * Pure integer arithmetic, mirrored verbatim in DuckDB, and bracketed
    * by construction: whitespace count ≤ est ≤ character count
    * (TextOpsSpec pins both bounds and the exact arithmetic). */
  def subwordTokenEst(text: Column): Column =
    aggregate(split(text, " "), lit(0L),
      (acc, t) => acc + floor((length(t) + lit(3)) / lit(4)))

  /** The DuckDB spelling of [[subwordTokenEst]] — same per-word ceiling
    * division, same 64-bit sum. */
  private val subwordEstSql: String =
    "CAST(list_sum(list_transform(string_split(text, ' '), " +
      "t -> (length(t) + 3) // 4)) AS BIGINT)"

  /** The `sample_budget` selection as a library function: per-lang running
    * token sum in doc_id order against the mixture-share quota. Prefix
    * selection in a stable order makes membership GROWTH-STABLE for
    * already selected documents (new docs only ever append after the
    * prefix under monotonic ids) — TextOpsSpec pins that property. */
  def budgetSample(docs: DataFrame): DataFrame =
    budgetSampleBy(docs, size(tokens).cast("long"))

  /** [[budgetSample]] metering [[subwordTokenEst]] instead of whitespace
    * tokens — the variant whose quota accounting is honest about what a
    * training mixture actually spends. Same selection mechanics, so the
    * growth-stability property carries over unchanged. */
  def budgetSampleSubword(docs: DataFrame): DataFrame =
    budgetSampleBy(docs, subwordTokenEst(col("text")))

  /** [[budgetSample]] metering the TRAINED tokenizer's OWN bill — the
    * per-doc subword count under `model`'s merge table ([[Bpe.encode]]
    * rolled up per doc) — completing B9.33's realism arc: estimate
    * (len/4) → exact replay. "Fill B tokens" now spends exactly what the
    * tokenizer will bill at training time. Costs are computed once per
    * DISTINCT word and broadcast back onto occurrences (Bpe.encode's
    * vocab-bounded shape), so the meter adds one doc-level rollup +
    * small-side join ahead of the same lang-partitioned prefix window —
    * no new corpus-sized shuffle. Selection mechanics are shared
    * verbatim ([[budgetSelect]]), so growth-stability carries.
    *
    * TEST-gated, not oracled (SURVEY §7.5.7): replaying the merge table
    * needs the boundary-pinned pair replace ((?<!\S)…(?!\S)), and RE2
    * — DuckDB's regex engine — has no lookaround; TextOpsSpec instead
    * pins the fill against an independent driver-side replay of both the
    * tokenizer ([[org.apache.spark.sql.graftexpr.BpeEncodeExpr.encode]])
    * and the quota selection. */
  def budgetSampleBpe(docs: DataFrame, model: Bpe.Model): DataFrame = {
    budgetSelect(meteredBy(docs, perDocBill(Bpe.encode(docs, model))))
  }

  /** The budget fill metered by the BYTE-level BPE ([[ByteBpe]], B9.74)
    * — the bill of the GPT-2/LLaMA-style byte vocabulary, same selection
    * mechanics. The byte family's bill diverges from the char-level
    * BPE's on any corpus with multi-byte characters (a char-level model
    * starts one symbol per code point, the byte model one per UTF-8
    * byte, and merge tables learned over different alphabets compress
    * differently) — TextOpsSpec proves the divergence on the same
    * corpus and model budgets, so "fill B tokens" is priced in the
    * tokenizer the trainer actually runs. */
  def budgetSampleByteBpe(docs: DataFrame, model: Bpe.Model): DataFrame = {
    budgetSelect(meteredBy(docs, perDocBill(ByteBpe.encode(docs, model))))
  }

  /** The budget fill metered by the UNIGRAM-LM tokenizer ([[Unigram]],
    * B9.62) — the second tokenizer family's bill, same selection
    * mechanics (docs with no tokens cost 0, OOV chars still tokenize —
    * the kernel's fallback keeps encode total). A pipeline that meters
    * budgets must bill in the tokenizer the trainer will actually run,
    * and the two families segment differently (TextOpsSpec proves this
    * meter diverges from the BPE bill on the same corpus and model
    * budgets). */
  def budgetSampleUnigram(docs: DataFrame,
      model: Unigram.Model): DataFrame = {
    budgetSelect(meteredBy(docs, perDocBill(Unigram.encode(docs, model))))
  }

  /** The budget fill metered by WORDPIECE ([[WordPiece]], B9.65) — the
    * third family's bill, same selection mechanics. One honest
    * difference from the siblings: WordPiece is lossy on unk words
    * (whole-word `[UNK]`, one token), so an unk-heavy document bills at
    * its [UNK] count, exactly what the trainer would consume — the
    * meter stays bill-what-runs by construction. */
  def budgetSampleWordPiece(docs: DataFrame,
      model: WordPiece.Model): DataFrame = {
    budgetSelect(meteredBy(docs, perDocBill(WordPiece.encode(docs, model))))
  }

  private def budgetSampleBy(docs: DataFrame, meter: Column): DataFrame =
    budgetSelect(docs.select(col("doc_id"), col("lang"),
      meter.as("n_tokens")))

  /** The whitespace meter as a (doc_id, lang, n_tokens) projection —
    * the default unit of the fill family. */
  private def whitespaceMetered(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      size(tokens).cast("long").as("n_tokens"))

  /** Per-doc bill of a tokenizer encode table — the rollup every
    * metered sampler shares. */
  private def perDocBill(enc: DataFrame): DataFrame =
    enc.groupBy("doc_id").agg(sum("n_subs").cast("long").as("n_tokens"))

  /** Attach a per-doc bill to the corpus as the selection meter (docs
    * with no tokens cost 0 — the encode table has no rows for them). */
  private def meteredBy(docs: DataFrame, perDoc: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_tokens"))

  // --------------------------------------------- temperature sampling
  // The multilingual-mixture recipe (Conneau & Lample 2019's XLM; XLM-R
  // and mC4/mT5 α-sampling): sample languages with p_l ∝ c_l^α, α < 1,
  // so low-resource languages are UPWEIGHTED relative to proportional
  // sampling — the standard fix for high-resource languages drowning the
  // mixture. Here the quota table is DERIVED FROM THE CORPUS (per-lang
  // token masses), where sample_budget's mixWeights are hand-set shares.

  /** Token budget for the declared `sample_temperature` fill — sized so
    * every language has both selected and excluded documents at every
    * testdata scale (measured: per-lang masses 3.5k–112k tokens). */
  private[text] val temperatureBudget = 12000L

  /** Temperature-scaled per-language quotas: (lang, c, s, quota) with
    * quota = ⌊B·√c_l / Σ√c⌋. α is FIXED at 1/2 because sqrt is the one
    * fractional power IEEE 754 requires correctly rounded — both engines
    * return the identical double, which is what keeps the quota table
    * oracle-able (general α needs pow, whose last ulp is libm-specific —
    * the TEST-gated path via `temperatureQuotasPow`). The share
    * denominator folds in lang order (lang-count-bounded list, never a
    * SQL SUM), the eval_ndcg discipline. Scale shape: one corpus
    * aggregate to lang granularity; everything after is lang-bounded. */
  def temperatureQuotas(docs: DataFrame, budget: Long): DataFrame =
    quotasFromCounts(docs.groupBy("lang")
      .agg(sum(size(tokens)).cast("long").as("c")), budget)

  /** The α=½ quota arithmetic over an arbitrary per-language mass table
    * (lang, c) — shared by the whitespace pricing above and the
    * tokenizer-metered pricings below: the pricing formula is
    * meter-agnostic, only the mass unit differs. */
  private def quotasFromCounts(counts0: DataFrame,
      budget: Long): DataFrame = {
    val counts = counts0.withColumn("s", sqrt(col("c").cast("double")))
    val total = counts.agg(aggregate(
      transform(array_sort(collect_list(struct(col("lang"), col("s")))),
        x => x.getField("s")),
      lit(0.0), (acc, x) => acc + x).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("lang"), col("c"), col("s"),
        floor(col("s") * lit(budget.toDouble) / col("total"))
          .cast("long").as("quota"))
  }

  /** General-α variant (pow — TEST-gated per §7.5.7, see
    * [[temperatureQuotas]]); α = 0.5 reproduces the declared quotas, the
    * spec-pinned bridge between the two. */
  def temperatureQuotasPow(docs: DataFrame, budget: Long,
      alpha: Double): DataFrame = {
    val counts = docs.groupBy("lang")
      .agg(sum(size(tokens)).cast("long").as("c"))
      .withColumn("s", pow(col("c").cast("double"), lit(alpha)))
    val total = counts.agg(aggregate(
      transform(array_sort(collect_list(struct(col("lang"), col("s")))),
        x => x.getField("s")),
      lit(0.0), (acc, x) => acc + x).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("lang"), col("c"), col("s"),
        floor(col("s") * lit(budget.toDouble) / col("total"))
          .cast("long").as("quota"))
  }

  /** The temperature fill: [[temperatureQuotas]] against the same
    * growth-stable doc_id-prefix selection as [[budgetSample]] — the
    * quota table rides a broadcast (lang-bounded) instead of the
    * mixWeights CASE, so the fill stays one lang-partitioned window +
    * one broadcast join at any corpus size. */
  def temperatureSample(docs: DataFrame, budget: Long): DataFrame =
    temperatureSampleWith(docs, temperatureQuotas(docs, budget))

  /** The fill against an EXPLICIT (lang, quota) table — the frozen-model
    * form ([[temperatureQuotas]] computed once on the release corpus,
    * shards and streams filled against it; the qualityBucketByCuts
    * posture). Languages absent from the quota table select nothing
    * (inner join — an unknown language has no budget, the conservative
    * default). */
  def temperatureSampleWith(docs: DataFrame, quotas: DataFrame): DataFrame =
    temperatureFill(docs.select(col("doc_id"), col("lang"),
      size(tokens).cast("long").as("n_tokens")), quotas)

  /** The quota fill over an arbitrary pre-metered (doc_id, lang,
    * n_tokens) table — the meter-agnostic body shared by the whitespace
    * form above and the tokenizer-metered forms below. */
  private def temperatureFill(metered: DataFrame,
      quotas: DataFrame): DataFrame = {
    val wWin = Window.partitionBy("lang").orderBy("doc_id")
    metered
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wWin))
      .join(broadcast(quotas.select(col("lang"), col("quota"))), Seq("lang"))
      .filter(col("cum_tokens") <= col("quota"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("cum_tokens"), col("quota"))
  }

  // ------------------------------- tokenizer-metered temperature pricing
  // The r14 verdict's observation made operational: `sample_temperature`
  // prices per-language masses with the whitespace meter, but a trainer
  // consumes SUBWORDS — a mixture priced in the wrong unit systematically
  // misallocates budget toward languages whose tokenizer fertility
  // (subwords per whitespace token) is low. These variants price the α=½
  // quotas AND meter the fill in the SAME trained-tokenizer unit the
  // budget-fill family already bills in (budgetSampleBpe & siblings) —
  // frozen-model forms throughout: the model is an argument, so a
  // TokenizerStore-read release model prices shards and streams
  // identically (the qualityBucketByCuts posture). TEST-gated (§7.5.7,
  // like the budget meters: the merge replay needs lookarounds RE2
  // lacks); TextOpsSpec pins quotas + fill against an independent driver
  // replay of the kernel bill and proves the pricing diverges from the
  // whitespace quotas on the same corpus and budget.

  /** α=½ quotas priced in a per-doc bill's unit: mass c_l = the
    * language's total TOKENIZER bill. One doc-level rollup + one
    * lang-level aggregate — the corpus-sized work is the encode the bill
    * came from. */
  def temperatureQuotasMetered(docs: DataFrame, budget: Long,
      perDoc: DataFrame): DataFrame =
    quotasFromCounts(
      meteredBy(docs, perDoc).groupBy("lang")
        .agg(sum("n_tokens").cast("long").as("c")),
      budget)

  def temperatureQuotasBpe(docs: DataFrame, budget: Long,
      model: Bpe.Model): DataFrame =
    temperatureQuotasMetered(docs, budget,
      perDocBill(Bpe.encode(docs, model)))

  def temperatureQuotasByteBpe(docs: DataFrame, budget: Long,
      model: Bpe.Model): DataFrame =
    temperatureQuotasMetered(docs, budget,
      perDocBill(ByteBpe.encode(docs, model)))

  def temperatureQuotasUnigram(docs: DataFrame, budget: Long,
      model: Unigram.Model): DataFrame =
    temperatureQuotasMetered(docs, budget,
      perDocBill(Unigram.encode(docs, model)))

  def temperatureQuotasWordPiece(docs: DataFrame, budget: Long,
      model: WordPiece.Model): DataFrame =
    temperatureQuotasMetered(docs, budget,
      perDocBill(WordPiece.encode(docs, model)))

  /** Per-language tokenizer FERTILITY report — subwords billed per
    * whitespace token (the unit-conversion factor between the
    * whitespace and metered pricings, and the number multilingual
    * tokenizer papers report per language: a high-fertility language
    * pays more subwords per word, which is exactly why
    * [[temperatureQuotasMetered]] exists). One doc-level attach + one
    * lang-bounded aggregate over any family's per-doc bill; the single
    * division runs once per language. TEST-gated like the meters
    * (TextOpsSpec: ≡ a driver replay of the kernel bill, and the byte
    * family's fertility strictly exceeds the char family's on a
    * multi-byte corpus while the whitespace meter pins 1.0). */
  def fertilityReport(docs: DataFrame, perDoc: DataFrame): DataFrame =
    meteredBy(docs, perDoc)
      .join(docs.select(col("doc_id"),
        size(tokens).cast("long").as("ws")), Seq("doc_id"))
      .groupBy("lang").agg(count(lit(1)).as("n_docs"),
        sum("ws").cast("long").as("ws_tokens"),
        sum("n_tokens").cast("long").as("subword_tokens"))
      .select(col("lang"), col("n_docs"), col("ws_tokens"),
        col("subword_tokens"),
        (col("subword_tokens").cast("double") / col("ws_tokens"))
          .as("fertility"))

  def fertilityReportBpe(docs: DataFrame, model: Bpe.Model): DataFrame =
    fertilityReport(docs, perDocBill(Bpe.encode(docs, model)))

  def fertilityReportByteBpe(docs: DataFrame,
      model: Bpe.Model): DataFrame =
    fertilityReport(docs, perDocBill(ByteBpe.encode(docs, model)))

  def fertilityReportUnigram(docs: DataFrame,
      model: Unigram.Model): DataFrame =
    fertilityReport(docs, perDocBill(Unigram.encode(docs, model)))

  def fertilityReportWordPiece(docs: DataFrame,
      model: WordPiece.Model): DataFrame =
    fertilityReport(docs, perDocBill(WordPiece.encode(docs, model)))

  /** Temperature fill PRICED AND METERED in the same tokenizer unit:
    * the per-doc bill is computed once (localCheckpoint — it feeds both
    * the quota subtree and the fill meter; without the checkpoint the
    * encode would run twice inside one plan), quotas derive from it,
    * and the selection spends against them in the identical unit. The
    * frozen-quota production form is
    * `temperatureFillMetered(docs, frozenQuotas, perDoc)`. */
  def temperatureSampleMetered(docs: DataFrame, budget: Long,
      perDoc: DataFrame): DataFrame = {
    val bill = perDoc.localCheckpoint()
    temperatureFill(meteredBy(docs, bill),
      temperatureQuotasMetered(docs, budget, bill))
  }

  def temperatureSampleBpe(docs: DataFrame, budget: Long,
      model: Bpe.Model): DataFrame =
    temperatureSampleMetered(docs, budget,
      perDocBill(Bpe.encode(docs, model)))

  /** The frozen-quota metered fill — shards/streams spend a RELEASE
    * price in the release's unit: `quotas` from a
    * `temperatureQuotas*`-family call on the pricing corpus, `perDoc`
    * from the SAME frozen model over the rows being filled. */
  def temperatureFillMetered(docs: DataFrame, quotas: DataFrame,
      perDoc: DataFrame): DataFrame =
    temperatureFill(meteredBy(docs, perDoc), quotas)

  /** SHARD form of the temperature fill — [[budgetFillShard]]'s carried-
    * tally mechanics against a FROZEN quota table: the release corpus
    * prices the languages once, every arriving shard fills against that
    * price while its quotas last. Same exactness argument: under the
    * monotonic-id contract, per-shard selection with carried per-lang
    * tallies ≡ [[temperatureSampleWith]] (same frozen quotas) over the
    * union of all shards so far, row for row (TextOpsSpec pins it). */
  def temperatureFillShard(shard: DataFrame, statePath: String,
      quotas: DataFrame): DataFrame =
    fillShardWith(shard, statePath, quotas)

  /** The shard form of the METERED temperature fill — the carried-tally
    * mechanics with the tokenizer bill as the meter: `quotas` is the
    * frozen release pricing (a `temperatureQuotas*`-family table),
    * `perDocOf` bills a shard under the SAME frozen model (e.g.
    * `b => perDocBill(Bpe.encode(b, model))` via
    * [[shardBillBpe]]). The tally advances in the metered unit, so
    * per-shard selection ≡ [[temperatureFillMetered]] over the union of
    * all shards so far (TextOpsSpec pins it — same growth-stability
    * argument as [[temperatureFillShard]]: the meter is a pure function
    * of the row under a frozen model). */
  def temperatureFillShardMetered(shard: DataFrame, statePath: String,
      quotas: DataFrame, perDocOf: DataFrame => DataFrame): DataFrame =
    fillShardWith(shard, statePath, quotas,
      b => meteredBy(b, perDocOf(b)))

  /** The per-shard BPE bill as a meter closure for
    * [[temperatureFillShardMetered]] / the streaming twin — works for
    * char-level AND byte-level models (same [[Bpe.Model]] shape; pass
    * `byteLevel = true` for a [[ByteBpe]]-trained model). */
  def shardBillBpe(model: Bpe.Model,
      byteLevel: Boolean = false): DataFrame => DataFrame =
    b => perDocBill(
      if (byteLevel) ByteBpe.encode(b, model) else Bpe.encode(b, model))

  // --------------------------------------------------- multi-epoch fill
  // Upsampling: when α-sampling prices a low-resource language ABOVE its
  // own mass (quota > c_l), the published recipe REPEATS its documents —
  // LLaMA's reported per-source epoch counts, mT5's repeat cap, and
  // Muennighoff et al. 2023's data-constrained scaling (returns diminish
  // sharply past ~4 repeats — the default cap here). The fill emits
  // (doc_id, epoch) rows: ⌊quota/c_l⌋ full passes over every document of
  // the language plus one partial pass filled by the same growth-stable
  // doc_id-prefix rule on the remainder. The fan-out per document is
  // ≤ cap rows by construction — bounded at any corpus size.

  /** Declared-key constants: the budget is `factor`× the corpus's OWN
    * token mass (so it rescales with the corpus and both regimes are
    * exercised at every testdata scale: high-resource languages truncate
    * below one epoch while low-resource ones repeat); epochs cap at 4
    * (the data-constrained-scaling knee). */
  private[text] val epochRepeatFactor = 2L
  private[text] val epochCap = 4L

  /** Per-language epoch pricing: (lang, c, quota, full_epochs, rem) with
    * quota = ⌊√c_l · B / Σ√c⌋ and B = factor·Σc — the
    * [[temperatureQuotas]] arithmetic with the budget derived IN-PLAN
    * from the corpus: Σc is a BIGINT SUM (order-independent, exact), so
    * there is no driver round-trip and no float until the one oracled
    * floor. full_epochs = min(quota div c, cap); rem = quota mod c while
    * the cap is not binding, else 0 (a capped language runs exactly cap
    * full passes and no partial). Everything past the floor is integer. */
  def epochQuotas(docs: DataFrame, factor: Long, cap: Long): DataFrame =
    epochQuotasFromCounts(docs.groupBy("lang")
      .agg(sum(size(tokens)).cast("long").as("c")), factor, cap)

  /** The epoch-pricing arithmetic over an arbitrary per-language mass
    * table (lang, c) — shared by the whitespace pricing above and the
    * tokenizer-metered pricings below (the [[quotasFromCounts]]
    * discipline: the formula is meter-agnostic, only the unit differs). */
  private def epochQuotasFromCounts(counts0: DataFrame, factor: Long,
      cap: Long): DataFrame = {
    val counts = counts0.withColumn("s", sqrt(col("c").cast("double")))
    val total = counts.agg(
      sum(col("c")).cast("long").as("mass"),
      aggregate(
        transform(array_sort(collect_list(struct(col("lang"), col("s")))),
          x => x.getField("s")),
        lit(0.0), (acc, x) => acc + x).as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("quota",
        floor(col("s") * (col("mass") * lit(factor)).cast("double")
          / col("total")).cast("long"))
      .withColumn("full_epochs", least(expr("quota div c"), lit(cap)))
      .withColumn("rem",
        when(col("full_epochs") >= lit(cap), lit(0L))
          .otherwise(col("quota") % col("c")))
      .select("lang", "c", "quota", "full_epochs", "rem")
  }

  /** The declared multi-epoch fill: [[epochQuotas]] at the declared
    * constants, then [[epochSampleWith]]. */
  def epochSample(docs: DataFrame): DataFrame =
    epochSampleWith(docs, epochQuotas(docs, epochRepeatFactor, epochCap))

  /** The fill against an EXPLICIT pricing table (the frozen-model form,
    * [[temperatureSampleWith]]'s posture): one lang-partitioned window
    * for the partial-pass cumsum, one broadcast join for the pricing,
    * then a ≤cap-wide `sequence` explode — no shuffle beyond the window
    * sort, fan-out bounded per row. Unknown languages select nothing
    * (inner join). */
  def epochSampleWith(docs: DataFrame, quotas: DataFrame): DataFrame =
    epochFill(whitespaceMetered(docs), quotas)

  /** The epoch fill over an arbitrary pre-metered (doc_id, lang,
    * n_tokens) table — the meter-agnostic body shared by the whitespace
    * form above and the tokenizer-metered forms below (the
    * [[temperatureFill]] discipline). */
  private def epochFill(metered: DataFrame,
      quotas: DataFrame): DataFrame = {
    val wWin = Window.partitionBy("lang").orderBy("doc_id")
    metered
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wWin))
      .join(broadcast(quotas.select(col("lang"), col("full_epochs"),
        col("rem"))), Seq("lang"))
      .withColumn("n_epochs", col("full_epochs") +
        when(col("cum_tokens") <= col("rem"), lit(1L)).otherwise(lit(0L)))
      .filter(col("n_epochs") >= lit(1L))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        explode(sequence(lit(1L), col("n_epochs"))).as("epoch"))
  }

  /** SHARD form — the two passes decompose cleanly: full epochs are
    * STATELESS (frozen pricing, map-side — every doc of a priced language
    * repeats full_epochs times, no tally needed), and the partial pass IS
    * the carried-tally quota fill ([[fillShardWith]]) on the rem table,
    * emitted at epoch full_epochs+1. Union over shards ≡
    * [[epochSampleWith]] on the union (TextOpsSpec pins it row for row);
    * replay safety is the shared monotonic-id guard. */
  def epochFillShard(shard: DataFrame, statePath: String,
      quotas: DataFrame): DataFrame =
    epochFillShardBy(shard, statePath, quotas, whitespaceMetered)

  /** The shared shard-fill body with the meter as an argument: the
    * full-pass fan-out and the partial-pass carried tally bill in the
    * SAME unit (one `meter` materialization feeds both — for a tokenizer
    * meter the encode runs once per shard, not twice). */
  private def epochFillShardBy(shard: DataFrame, statePath: String,
      quotas: DataFrame, meter: DataFrame => DataFrame): DataFrame = {
    val metered = meter(shard).localCheckpoint()
    val partial = fillShardWith(shard, statePath,
        quotas.filter(col("rem") > 0L)
          .select(col("lang"), col("rem").as("quota")),
        (_: DataFrame) => metered)
      .join(broadcast(quotas.select(col("lang"), col("full_epochs"))),
        Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        (col("full_epochs") + lit(1L)).as("epoch"))
    val full = metered
      .join(broadcast(quotas.filter(col("full_epochs") >= 1L)
        .select(col("lang"), col("full_epochs"))), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        explode(sequence(lit(1L), col("full_epochs"))).as("epoch"))
    full.unionByName(partial)
  }

  // --------------------------------- tokenizer-metered epoch pricing
  // The completion of the metered α-sampling arc (round 15 priced the
  // temperature family in tokenizer subwords; these price the UPSAMPLER
  // in the same unit): a trainer consuming BPE tokens whose repeat
  // counts were computed from whitespace masses over- or under-repeats
  // every language whose tokenizer fertility differs from 1 — the
  // full_epochs integer itself can change, not just the partial-pass
  // boundary. Frozen-model forms throughout; TEST-gated like the other
  // meters (§7.5.7), TextOpsSpec pins quotas + fill against a driver
  // replay of the kernel bill and proves divergence from the whitespace
  // pricing on the testdata corpus.

  /** Epoch pricing in a per-doc bill's unit: mass c_l = the language's
    * total TOKENIZER bill; the budget B = factor·Σc rescales with the
    * corpus IN THE METERED UNIT, so the cap/partial regime split is
    * decided by subword masses end to end. */
  def epochQuotasMetered(docs: DataFrame, factor: Long, cap: Long,
      perDoc: DataFrame): DataFrame =
    epochQuotasFromCounts(
      meteredBy(docs, perDoc).groupBy("lang")
        .agg(sum("n_tokens").cast("long").as("c")),
      factor, cap)

  def epochQuotasBpe(docs: DataFrame, factor: Long, cap: Long,
      model: Bpe.Model): DataFrame =
    epochQuotasMetered(docs, factor, cap,
      perDocBill(Bpe.encode(docs, model)))

  def epochQuotasByteBpe(docs: DataFrame, factor: Long, cap: Long,
      model: Bpe.Model): DataFrame =
    epochQuotasMetered(docs, factor, cap,
      perDocBill(ByteBpe.encode(docs, model)))

  def epochQuotasUnigram(docs: DataFrame, factor: Long, cap: Long,
      model: Unigram.Model): DataFrame =
    epochQuotasMetered(docs, factor, cap,
      perDocBill(Unigram.encode(docs, model)))

  def epochQuotasWordPiece(docs: DataFrame, factor: Long, cap: Long,
      model: WordPiece.Model): DataFrame =
    epochQuotasMetered(docs, factor, cap,
      perDocBill(WordPiece.encode(docs, model)))

  /** Epoch fill priced AND metered in the same tokenizer unit — the
    * [[temperatureSampleMetered]] posture: one bill (localCheckpoint —
    * it feeds the quota subtree and the fill meter), quotas from it,
    * the partial-pass cumsum spent against them in the identical unit. */
  def epochSampleMetered(docs: DataFrame, factor: Long, cap: Long,
      perDoc: DataFrame): DataFrame = {
    val bill = perDoc.localCheckpoint()
    epochFill(meteredBy(docs, bill),
      epochQuotasMetered(docs, factor, cap, bill))
  }

  def epochSampleBpe(docs: DataFrame, factor: Long, cap: Long,
      model: Bpe.Model): DataFrame =
    epochSampleMetered(docs, factor, cap,
      perDocBill(Bpe.encode(docs, model)))

  /** The frozen-pricing metered fill — shards/streams repeat against a
    * RELEASE pricing in the release tokenizer's unit: `quotas` from an
    * `epochQuotas*`-family call on the pricing corpus, `perDoc` from the
    * SAME frozen model over the rows being filled. */
  def epochFillMetered(docs: DataFrame, quotas: DataFrame,
      perDoc: DataFrame): DataFrame =
    epochFill(meteredBy(docs, perDoc), quotas)

  /** SHARD form of the METERED epoch fill — [[epochFillShard]]'s
    * two-pass decomposition with the tokenizer bill as the meter:
    * `quotas` is the frozen release pricing (an `epochQuotas*`-family
    * table), `perDocOf` bills a shard under the SAME frozen model (e.g.
    * [[shardBillBpe]]). Full passes stay stateless map-side fan-out;
    * the partial-pass tally advances in the metered unit, so the union
    * over shards ≡ [[epochFillMetered]] on the union (TextOpsSpec pins
    * it — the growth-stability argument carries because the meter is a
    * pure row function under a frozen model). */
  def epochFillShardMetered(shard: DataFrame, statePath: String,
      quotas: DataFrame, perDocOf: DataFrame => DataFrame): DataFrame =
    epochFillShardBy(shard, statePath, quotas,
      b => meteredBy(b, perDocOf(b)))

  // ------------------------------------------ weighted sampling (WOR)
  // Efraimidis & Spirakis 2006: weighted sampling WITHOUT replacement —
  // draw u ~ U(0,1] per item, rank by u^(1/w) (equivalently ln(u)/w),
  // keep the top k; inclusion probability is exactly proportional-to-
  // size without replacement, and the whole draw is one scan + one
  // top-k (TakeOrdered — no global sort shuffle, re-runnable at any
  // parallelism). Deterministic here because u derives from md5 of the
  // doc_id (16 bits is plenty for a sampler; +1 keeps u > 0 so ln is
  // finite) and ln is the one transcendental this oracle surface has
  // already proven bit-exact cross-engine (text_lm_score).

  /** Declared `sample_weighted` draw size. */
  private[text] val weightedK = 100

  /** The ES score column: ln((b16+1)/65536)/w with w = whitespace token
    * count — longer documents proportionally likelier. */
  private def esScored(docs: DataFrame): DataFrame = {
    val b16 = conv(substring(md5(col("doc_id").cast("string")), 1, 4),
      16, 10).cast("long")
    docs.select(col("doc_id"), col("lang"),
        size(tokens).cast("long").as("n_tokens"))
      .withColumn("score",
        log((b16 + lit(1L)).cast("double") / lit(65536.0))
          / col("n_tokens").cast("double"))
  }

  def weightedSample(docs: DataFrame, k: Int): DataFrame =
    esScored(docs).orderBy(desc("score"), asc("doc_id")).limit(k)

  /** The release draw's admission price: the k-th best score, as a
    * one-row table — the frozen-model form's published constant. */
  def weightedThreshold(docs: DataFrame, k: Int): DataFrame =
    weightedSample(docs, k).agg(min(col("score")).as("threshold"))

  /** The draw against a FROZEN threshold (the qualityBucketByCuts
    * posture): on the pricing corpus this reproduces the top-k exactly
    * (generic score distinctness — TextOpsSpec pins it); on NEW shards
    * it is a stateless map-side filter that admits documents clearing
    * the release's bar — the draw stays exactly as selective as the
    * release, without a global top-k per shard. */
  def weightedSampleWith(docs: DataFrame, threshold: DataFrame): DataFrame =
    esScored(docs).crossJoin(broadcast(threshold))
      .filter(col("score") >= col("threshold"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("score"))

  /** The per-language quota as a CASE column — one constants source
    * ([[mixWeights]]) for the batch fill, the oracle, and the streaming
    * shard fill. */
  private def quotaCol: Column =
    mixWeights.foldRight(lit(quotaOf(mixDefault))) {
      case ((lang, w), els) =>
        when(col("lang") === lang, lit(quotaOf(w))).otherwise(els)
    }

  /** The shared budget selection over pre-metered (doc_id, lang,
    * n_tokens) rows: per-lang running token sum in doc_id order against
    * the mixture-share quota. */
  private def budgetSelect(metered: DataFrame): DataFrame = {
    val wWin = Window.partitionBy("lang").orderBy("doc_id")
    metered
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wWin))
      .withColumn("quota", quotaCol)
      .filter(col("cum_tokens") <= col("quota"))
  }

  /** SHARD form of the budget fill — the streaming twin's body
    * ([[graft.stream.Streaming.streamBudgetFill]]): select an arriving
    * shard's docs into the training mix while each language's quota
    * lasts, carrying the per-lang token tally across shards in a tiny
    * mergeable count table at `statePath` (the [[LmScore]] algebra: one
    * appended row set per shard, readers SUM). Growth-stability is what
    * makes the twin EXACT, not approximate: under the monotonic-id
    * contract the batch fill's per-lang selected prefix only ever
    * extends, so per-shard selection against carried tallies equals
    * [[budgetSample]] over the union of all shards so far, row for row
    * (TextOpsSpec pins it). The tally accumulates ALL processed docs'
    * tokens — selected or not — exactly like the batch cumsum; a
    * replayed shard trips the monotonic guard instead of double-counting
    * the tally. */
  def budgetFillShard(shard: DataFrame, statePath: String): DataFrame =
    fillShardWith(shard, statePath, null)

  /** The shared shard-fill body: `quotas == null` prices languages with
    * the [[mixWeights]] CASE (the budget fill); a non-null (lang, quota)
    * table prices them from a frozen model (the temperature fill — inner
    * join, unknown languages select nothing). */
  private def fillShardWith(shard: DataFrame, statePath: String,
      quotas: DataFrame,
      meter: DataFrame => DataFrame = whitespaceMetered): DataFrame = {
    val spark = shard.sparkSession
    val exists = graft.core.IndexLifecycle.pathExists(spark, statePath)
    val st =
      if (exists) spark.read.parquet(statePath).localCheckpoint()
      else null
    val maxSeen =
      if (exists) st.agg(coalesce(max("max_id"), lit(-1L)))
        .head().getLong(0)
      else -1L
    val bounds = shard.agg(min(col("doc_id").cast("long")),
      max(col("doc_id").cast("long"))).head()
    if (bounds.isNullAt(0)) {
      val metered0 = meter(shard)
      return if (quotas == null) budgetSelect(metered0)
      else temperatureFill(metered0, quotas)
    }
    graft.core.IndexLifecycle.requireMonotonic(bounds.getLong(0), maxSeen,
      "doc_id")
    val metered = meter(shard).localCheckpoint()
    val carried =
      if (exists) st.groupBy("lang").agg(sum("c").cast("long").as("base"))
      else null
    val wWin = Window.partitionBy("lang").orderBy("doc_id")
    val cum0 = metered.withColumn("cum0", sum(col("n_tokens")).over(wWin))
    val based = (if (carried == null) cum0.withColumn("base", lit(0L))
      else cum0.join(broadcast(carried), Seq("lang"), "left")
        .na.fill(0L, Seq("base")))
      .withColumn("cum_tokens", col("cum0") + col("base"))
    val priced =
      if (quotas == null) based.withColumn("quota", quotaCol)
      else based.join(broadcast(quotas.select(col("lang"), col("quota"))),
        Seq("lang"))
    val sel = priced
      .filter(col("cum_tokens") <= col("quota"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("cum_tokens"), col("quota"))
      .localCheckpoint() // materialize BEFORE the tally advances
    metered.groupBy("lang").agg(sum("n_tokens").cast("long").as("c"))
      .withColumn("max_id", lit(bounds.getLong(1)))
      .coalesce(1).write.mode("append").parquet(statePath)
    sel
  }
  private def hexChars(n: Int): Seq[String] =
    "0123456789abcdef".take(n).map(_.toString)
  private def mixSqlArm(w: Int): String =
    s"substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN (${
      hexChars(w).map(c => s"'$c'").mkString(", ")})"

  /** `sample_quality_bucket`'s middle-tercile keep rate, in sixteenths
    * (the md5-nibble draw every sampler here uses): head keeps all,
    * middle keeps 8/16, tail drops — the CCNet keep-head+sampled-middle
    * shape. */
  private val MiddleKeepSixteenths = 8

  /** CCNet-style perplexity bucketing (Wenzek et al. 2019 §4.3): score
    * every document with the corpus-trained LM ([[LmScore.score]] — the
    * oracled bit-exact scorer), split EACH LANGUAGE into head/middle/tail
    * score terciles (ntile over (lm_score DESC, doc_id) — a total order,
    * so the split is deterministic and cross-engine), and keep head fully
    * + middle at the md5-nibble rate. Output one row per scored doc with
    * its bucket and keep verdict — the sampler is an AUDITABLE TABLE, not
    * a filter, so the drop ledger is first-class.
    *
    * Scale shape: the LM scoring is the text_lm_score plan (vocabulary-
    * bounded broadcasts, one corpus rollup); the ntile windows sort only
    * the SLIM (doc_id, lang, score) projection per language. The
    * production/shard form is [[qualityBucketByCuts]] — freeze the
    * corpus's tercile boundary scores once, bucket every future shard
    * map-side against the broadcast cuts (the frozen-LM posture: the
    * release's terciles are the terciles). */
  private[graft] def qualityBuckets(docs: DataFrame): DataFrame = {
    val scored = LmScore.score(docs, LmScore.lmFrom(docs))
      .select(col("doc_id"), col("lm_score"))
    val t3 = ntile(3).over(Window.partitionBy("lang")
      .orderBy(col("lm_score").desc, col("doc_id")))
    val nib = substring(md5(col("doc_id").cast("string")), 1, 1)
    docs.select(col("doc_id"), col("lang"))
      .join(scored, "doc_id")
      .withColumn("t3", t3)
      .select(col("doc_id"), col("lang"), col("lm_score"),
        when(col("t3") === 1, lit("head"))
          .when(col("t3") === 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"),
        (col("t3") === 1 || (col("t3") === 2
          && nib.isin(hexChars(MiddleKeepSixteenths): _*))).as("kept"))
  }

  /** The frozen-cuts tercile boundaries of a scored corpus: per language,
    * the MINIMUM lm_score of the head and middle ntile groups — exactly
    * the values [[qualityBucketByCuts]] needs to reproduce
    * [[qualityBuckets]] on score-distinct data. Lang-count bounded. */
  private[graft] def qualityCuts(docs: DataFrame): DataFrame = {
    val scored = LmScore.score(docs, LmScore.lmFrom(docs))
      .select(col("doc_id"), col("lm_score"))
    val t3 = ntile(3).over(Window.partitionBy("lang")
      .orderBy(col("lm_score").desc, col("doc_id")))
    docs.select(col("doc_id"), col("lang"))
      .join(scored, "doc_id")
      .withColumn("t3", t3)
      .groupBy("lang").agg(
        min(when(col("t3") === 1, col("lm_score"))).as("head_min"),
        min(when(col("t3") === 2, col("lm_score"))).as("middle_min"))
  }

  /** [[qualityCuts]] at 100 TB: the exact form ranks every language's
    * corpus (a per-lang sort of the slim score projection — fine to
    * ~10⁹ rows/lang, a real cost beyond), so the production path is KLL
    * tercile estimation: ONE pass building per-partition per-lang
    * sketches (the [[graft.ops.QuantileSketch]] build shape — this is
    * the repo's sanctioned KLL `mapPartitions` site; NOT a declared
    * query), merged per language (kB payloads), boundaries read at
    * normalized ranks 2/3 and 1/3 of the score distribution. k=200 ⇒
    * ~1.65% single-sided rank error: a doc within ε of a tercile
    * boundary may land one bucket over — the explicit approximation
    * contract, spec-measured (QualityBucketSpec: ≥98% bucket agreement
    * on a 6k-score corpus; lossless below sketch capacity up to the
    * rank-convention at the exact boundary). Input is the SCORED slim
    * projection (doc_id, lang, lm_score). */
  private[graft] def qualityCutsApprox(scoredLang: DataFrame,
      k: Int = 200): DataFrame = {
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    val spark = scoredLang.sparkSession
    import spark.implicits._
    val perPart = scoredLang.select(col("lang"), col("lm_score"))
      .as[(String, Double)]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap
          .empty[String, KllDoublesSketch]
        it.foreach { case (l, s) =>
          m.getOrElseUpdate(l, KllDoublesSketch.newHeapInstance(k))
            .update(s)
        }
        m.iterator.map { case (l, sk) => (l, sk.toByteArray) }
      }.toDF("lang", "sketch")
    val mergeFn = org.apache.spark.sql.functions.udaf(
      new graft.ops.QuantileSketch.KllMerge(k),
      org.apache.spark.sql.Encoders.BINARY)
    perPart.groupBy("lang").agg(mergeFn(col("sketch")).as("sk"))
      .as[(String, Array[Byte])]
      .map { case (l, b) =>
        val sk = KllDoublesSketch.heapify(Memory.wrap(b))
        (l, sk.getQuantile(2.0 / 3), sk.getQuantile(1.0 / 3))
      }.toDF("lang", "head_min", "middle_min")
  }

  /** The SHARD form of [[qualityBuckets]]: bucket a scored shard
    * (doc_id, lang, lm_score) against FROZEN per-language cuts — pure
    * map-side (one broadcast join, no window, no sort), so it runs at
    * shard cost, re-shards freely, and is streaming-legal. Equal to the
    * declared ntile form whenever scores are distinct at the boundaries
    * (ntile splits ties by doc_id; value cuts cannot — the usual
    * quantile-vs-rank boundary caveat, spec-pinned on distinct data). */
  private[graft] def qualityBucketByCuts(scoredLang: DataFrame,
      cuts: DataFrame): DataFrame = {
    val nib = substring(md5(col("doc_id").cast("string")), 1, 1)
    scoredLang.join(broadcast(cuts), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("lm_score"),
        when(col("lm_score") >= col("head_min"), lit("head"))
          .when(col("lm_score") >= col("middle_min"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .withColumn("kept", col("bucket") === "head"
        || (col("bucket") === "middle"
          && nib.isin(hexChars(MiddleKeepSixteenths): _*)))
  }

  /** Line-dedup knobs. The synthetic corpus ships single-line documents,
    * so the declared queries derive line structure deterministically:
    * every ` the ` occurrence becomes a line break (a literal regex with
    * identical leftmost/non-overlap semantics in Java and DuckDB's RE2 —
    * never producing an empty line, since the pattern needs both flanking
    * spaces). A real corpus passes its newlines straight through; the
    * operator is the [[lineDedup]] body either way. A line is BOILERPLATE
    * when it appears in ≥ [[lineMinDf]] distinct documents (the
    * CCNet/RefinedWeb repeated-paragraph rule; Wenzek et al. 2019 §3.1
    * dedup paragraphs seen elsewhere in the crawl, Penedo et al. 2023
    * line-wise filters). */
  private val lineMinDf = 3
  private[text] val lineSepPat = " the "

  /** (doc_id, ord, line) — one row per newline-delimited line of `text`,
    * order-preserving. */
  private[text] def docLines(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("ord", "line")))

  /** The declared queries' deterministic line derivation for the
    * single-line synthetic corpus — see [[lineSepPat]]. */
  private def withDerivedLines(docs: DataFrame): DataFrame =
    docs.withColumn("text", regexp_replace(col("text"), lineSepPat, "\n"))

  /** Boilerplate lines of `docs`: lines appearing in ≥ `minDf` distinct
    * documents, with their doc- and occurrence-frequencies. Scale shape:
    * one explode + one groupBy(line) with map-side partial aggregation —
    * the `dedup_exact` digest-groupBy shape, shuffle bounded by DISTINCT
    * lines, not corpus lines (count-distinct over doc_id dedups map-side
    * on the (line, doc_id) pre-key). At petabyte scale key on
    * xxhash64(line) instead of the raw line to keep shuffle rows slim —
    * the CCNet trick; the raw line is kept here so the report is
    * readable and oracle-comparable. */
  def boilerplateLines(docs: DataFrame, minDf: Long = lineMinDf): DataFrame =
    docLines(docs)
      .groupBy("line")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("n_occ"))
      .filter(col("df") >= minDf)

  /** CCNet-style boilerplate-line removal: drop every line that appears
    * in ≥ `minDf` distinct documents, reassemble each document from its
    * surviving lines in original order. The corpus-level dedup stage
    * BETWEEN exact (whole-doc) and substring (50-gram) dedup: navigation
    * chrome, cookie banners, and license footers repeat across pages
    * without whole docs or long spans repeating.
    *
    * Scale: the boilerplate set is corpus-lines / minDf at worst but in
    * practice vocabulary-shaped and SMALL (it is exactly what repeats),
    * so it broadcasts — the flagging join is map-side, and the only
    * corpus-sized exchanges are the line groupBy and the per-doc
    * reassembly (keyed by doc_id — unskewed, per-doc line counts are
    * document-length-bounded). If the set ever outgrows broadcast, the
    * same frozen-membership probe exists Bloom-prefiltered in
    * [[DecontIndex.probeShardBloom]] — swap the join, keep the contract.
    * Reassembly orders by `ord` INSIDE each doc's collected array (no
    * global sort), and empty documents (all lines boilerplate) yield ''
    * — every doc stays accounted for on the drop ledger. */
  def lineDedup(docs: DataFrame, minDf: Long = lineMinDf): DataFrame =
    cleanAgainstBoilerplate(docs, boilerplateLines(docs, minDf))

  /** The cleaning half of [[lineDedup]] against an ALREADY-MINED
    * boilerplate set (any DataFrame with a `line` column) — the online
    * form: mine the membership set offline over the accumulated corpus,
    * then apply it map-side to arriving documents
    * ([[graft.stream.Streaming.streamLineClean]] replays exactly this
    * body per micro-batch, so batch and stream cannot drift). */
  def cleanAgainstBoilerplate(docs: DataFrame, bp: DataFrame): DataFrame = {
    val lines = docLines(docs)
    val flagged = bp.select(col("line")).distinct()
      .withColumn("bp", lit(true))
    lines.join(broadcast(flagged), Seq("line"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        count(when(col("bp").isNull, 1)).as("n_kept"),
        coalesce(
          array_join(
            transform(
              array_sort(collect_list(when(col("bp").isNull,
                struct(col("ord"), col("line"))))),
              x => x.getField("line")),
            " "),
          lit("")).as("cleaned"))
  }

  /** [[cleanAgainstBoilerplate]] for membership sets BEYOND broadcast
    * (round 16 — the B9.55 scaladoc's promised swap, implemented): a
    * pathological crawl can mine a chrome vocabulary too large for the
    * driver, and then the broadcast flagging join is off the table. The
    * [[DecontIndex.probeShardBloom]] shape applied to lines: a Bloom
    * filter over the boilerplate set (MBs regardless of set size, built
    * by one aggregate over `bp`) kills clean lines MAP-SIDE; only the
    * candidate trickle (true boilerplate occurrences + the fpp rate)
    * pays the exact left-semi verify against `bp` — the boilerplate set
    * SHUFFLES (it is the too-big-for-broadcast side; that is the point),
    * the corpus stream never exchanges on the line key. The verified
    * (doc_id, ord) drop list then rides the SAME per-doc reassembly
    * aggregate as the broadcast form via a union (flag rows carry bp =
    * true; the aggregate drops any ord with a flagged twin) — ONE
    * corpus-sized exchange total, identical to the broadcast form's
    * reassembly shuffle. A Bloom probe never false-negatives and the
    * semi-join is exact, so LineDedupSpec pins this EQUAL to
    * [[cleanAgainstBoilerplate]] row for row — including under a
    * deliberately saturated filter where false candidates flood the
    * verify step. */
  def cleanAgainstBoilerplateBloom(docs: DataFrame, bp: DataFrame,
      estItems: Long = 1000000L, numBits: Long = 1L << 23): DataFrame = {
    val lines = docLines(docs)
    val bpLines = bp.select(col("line")).distinct()
    val candidates = graft.ops.JoinPrefilter.bloomReduce(
      lines, col("line"), bpLines, col("line"), estItems, numBits)
    val flagged = candidates.join(bpLines, Seq("line"), "left_semi")
      .select(col("doc_id"), col("ord"))
    lines.select(col("doc_id"), col("ord"), col("line"),
        lit(false).as("bp"))
      .unionByName(flagged.select(col("doc_id"), col("ord"),
        lit(null).cast("string").as("line"), lit(true).as("bp")))
      .groupBy("doc_id")
      .agg(count(when(!col("bp"), 1)).as("n_lines"),
        collect_set(when(col("bp"), col("ord"))).as("__dropped"),
        sort_array(collect_list(when(!col("bp"),
          struct(col("ord"), col("line"))))).as("__lines"))
      .select(col("doc_id"), col("n_lines"),
        size(filter(col("__lines"),
          x => !array_contains(col("__dropped"), x.getField("ord"))))
          .cast("long").as("n_kept"),
        coalesce(array_join(transform(
            filter(col("__lines"), x =>
              !array_contains(col("__dropped"), x.getField("ord"))),
            x => x.getField("line")), " "), lit("")).as("cleaned"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PII scan + redaction — the compliance pass every training-data
    // pipeline runs before release: count pattern hits per document and
    // emit the masked text. The testdata has NO natural PII anywhere
    // (documents is digit-free word salad, customer is the trimmed TPC-H
    // subset), so the query derives a deterministic PII-bearing field from
    // `events` in BOTH engines — the same fixture-derivation pattern as the
    // fw family. Scale shape: pure narrow map (two codegen'd regex counts +
    // two replaces), no shuffle but the declared ORDER BY; 100 TB cost is
    // one scan.
    "text_pii_mask" -> ((s, d) => {
      val mixed = concat(
        lit("user "), col("user_id").cast("string"),
        lit(" contact 555-"),
        lpad((col("user_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("event_id") % 10000).cast("string"), 4, "0"),
        lit(" email u"), col("user_id").cast("string"),
        lit("@example.com note "), col("event_type"))
      Tables.events(s, d)
        .select(col("event_id"), mixed.as("mixed"))
        .select(col("event_id"),
          regexp_count(col("mixed"), lit(phonePat)).as("n_phone"),
          regexp_count(col("mixed"), lit(emailPat)).as("n_email"),
          regexp_replace(
            regexp_replace(col("mixed"), phonePat, "[PHONE]"),
            emailPat, "[EMAIL]").as("masked"))
        .orderBy("event_id")
    }),

    // Mixture-weighted deterministic sampling — the data-MIXING op: draw
    // each language at its training-mixture rate (en half, de quarter,
    // fr eighth, rest a sixteenth) with membership a pure function of
    // doc_id (md5 nibble vs per-lang budget). Same guarantees as
    // `sample_det`/`hashSplit`: identical across runs, engines,
    // partitionings and corpus growth — a document never flips its fate
    // when the corpus is re-sharded or extended. Map-only filter; at
    // 100 TB it composes with any downstream op, no shuffle of its own.
    "sample_mix" -> ((s, d) => {
      val nib = substring(md5(col("doc_id").cast("string")), 1, 1)
      val keep = mixWeights.foldRight(
          nib.isin(hexChars(mixDefault): _*)) {
        case ((lang, w), els) =>
          when(col("lang") === lang, nib.isin(hexChars(w): _*)).otherwise(els)
      }
      Tables.documents(s, d).filter(keep)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // Token-budget sampler — the other half of data mixing: sample_mix
    // draws each language at a RATE; this fills each language's token
    // QUOTA (its mixture share of a fixed total) and stops, the "assemble
    // a training mix of B tokens" op. Selection is a per-lang running
    // token sum (doc_id order — deterministic, growth-stable for already
    // selected docs) against a broadcast-free literal quota; prefix
    // selection means one lang-partitioned window, no global sort, no
    // second pass. The same constants feed Spark and the oracle CASE.
    "sample_budget" -> ((s, d) =>
      budgetSample(Tables.documents(s, d)).orderBy("doc_id")),

    // The same budget fill metering the subword-token ESTIMATE (see
    // subwordTokenEst): whitespace counting undercharges long words, so a
    // whitespace-metered mix systematically overshoots a real token
    // budget; this variant's cum/quota accounting matches what a subword
    // tokenizer would bill, with the estimate's integer arithmetic
    // mirrored in the oracle. Same map+window shape — one lang-partitioned
    // cumsum, no extra shuffle at any scale.
    "sample_budget_subword" -> ((s, d) =>
      budgetSampleSubword(Tables.documents(s, d)).orderBy("doc_id")),

    // Temperature-scaled (α = 1/2) language sampling — quotas derived
    // from the corpus's own per-lang token masses (p_l ∝ √c_l, the
    // XLM-R/mC4 low-resource upweighting), then the same growth-stable
    // doc_id-prefix fill as sample_budget. sqrt keeps the quota table
    // bit-exact cross-engine; the share denominator folds in lang order.
    "sample_temperature" -> ((s, d) =>
      temperatureSample(Tables.documents(s, d), temperatureBudget)
        .orderBy("doc_id")),

    // Multi-epoch upsampling (LLaMA per-source epochs / mT5 repeat cap /
    // Muennighoff 2023): α=1/2 pricing at budget = 2× the corpus's own
    // mass — low-resource languages repeat (epoch ≥ 2), high-resource
    // ones truncate below one pass; fan-out ≤ 4 rows/doc by the cap.
    "sample_epochs" -> ((s, d) =>
      epochSample(Tables.documents(s, d)).orderBy("doc_id", "epoch")),

    // Efraimidis–Spirakis weighted sampling without replacement, weight
    // = token mass: one scan + one TakeOrdered. The declared output is
    // the SELECTION, not the score — ln differs by one ulp between
    // JVM and libm (measured: doc 388 at sf0.01), which cannot flip
    // membership (score gaps ~1e-4 vs ulp ~1e-19) but would fail a
    // bit-compare of the score column; the score itself is pinned to a
    // driver replay in TextOpsSpec instead.
    "sample_weighted" -> ((s, d) =>
      weightedSample(Tables.documents(s, d), weightedK)
        .select("doc_id", "lang", "n_tokens").orderBy("doc_id")),

    // Repetition-based quality signals (the Gopher/MassiveText rule
    // family): per-document duplicate-token fraction and top-bigram
    // fraction — high values mean boilerplate/degenerate text a curation
    // pass drops. Shapes: the token ratios are map-side; the bigram stage
    // is the text_ngrams lambda-free fan-out keyed by (doc, bigram), so
    // the shuffle is corpus-token-bounded with map-side partials, and the
    // per-doc reduce keys on doc_id — no skew (bigram count per doc is
    // bounded by doc length). Ratios are single divisions of exact counts
    // — bit-identical cross-engine.
    // Round 15 completes the Gopher word-level repetition family (Rae
    // et al. 2021 §A1.1) with the DUPLICATE-TRIGRAM occurrence share
    // beside the existing duplicate-token and top-bigram signals (the
    // line/paragraph members are the text_line_dedup modality). Plan
    // shape — ONE fan-out, ZERO joins: bigrams and trigrams ride the
    // same explode as TAG-PREFIXED gram strings ("2:"/"3:" — tokens
    // can't collide across n since the gram token counts differ), plus
    // a per-doc "0:" sentinel row so docs too short for any gram keep a
    // row (0.0 ratios) instead of vanishing; n_toks/n_distinct ride the
    // aggregation keys (constant per doc), so the whole key is two
    // partial-aggregated shuffles and no doc-level join-back — the
    // first cut's two broadcast join-backs would have been corpus-sized
    // shuffle joins at 100 TB. All integers to one correctly-rounded
    // division per signal — bit-exact cross-engine.
    "text_repetition" -> ((s, d) => {
      val toks = col("toks")
      val base = Tables.documents(s, d)
        .select(col("doc_id"), tokens.as("toks"))
        .select(col("doc_id"), toks, size(toks).as("n_toks"),
          size(array_distinct(toks)).as("n_distinct"))
      val keep = Seq(col("doc_id"), col("n_toks"), col("n_distinct"))
      // lambda-free fan-outs (the text_ngrams idiom: slice + arrays_zip
      // + codegen'd concat AFTER the explode — no interpreted HOF)
      val blen = size(toks) - 1
      val bg = base
        .select(keep :+ slice(toks, lit(1), blen).as("a")
          :+ slice(toks, lit(2), blen).as("b"): _*)
        .select(keep :+ explode(arrays_zip(col("a"), col("b"))).as("p"): _*)
        .select(keep :+ concat(lit("2:"), col("p.a"), lit(" "),
          col("p.b")).as("g"): _*)
      val tlen = greatest(size(toks) - 2, lit(0))
      val tg = base
        .select(keep :+ slice(toks, lit(1), tlen).as("a")
          :+ slice(toks, lit(2), tlen).as("b")
          :+ slice(toks, lit(3), tlen).as("c"): _*)
        .select(keep
          :+ explode(arrays_zip(col("a"), col("b"), col("c"))).as("p"): _*)
        .select(keep :+ concat(lit("3:"), col("p.a"), lit(" "),
          col("p.b"), lit(" "), col("p.c")).as("g"): _*)
      val sentinel = base.select(keep :+ lit("0:").as("g"): _*)
      sentinel.unionByName(bg).unionByName(tg)
        .groupBy("doc_id", "n_toks", "n_distinct", "g")
        .agg(count(lit(1)).as("n"))
        .groupBy("doc_id", "n_toks", "n_distinct")
        .agg(
          max(when(col("g").startsWith("2:"), col("n"))).as("top_n"),
          sum(when(col("g").startsWith("2:"), col("n"))
            .otherwise(lit(0L))).as("n_bg"),
          sum(when(col("g").startsWith("3:") && col("n") >= 2, col("n"))
            .otherwise(lit(0L))).as("dup_tg"),
          sum(when(col("g").startsWith("3:"), col("n"))
            .otherwise(lit(0L))).as("n_tg"))
        .select(col("doc_id"), col("n_toks"),
          (lit(1) - col("n_distinct").cast("double") / col("n_toks"))
            .as("dup_token_ratio"),
          when(col("n_bg") > 0,
            col("top_n").cast("double") / col("n_bg")).otherwise(lit(0.0))
            .as("top_bigram_ratio"),
          when(col("n_tg") > 0,
            col("dup_tg").cast("double") / col("n_tg")).otherwise(lit(0.0))
            .as("dup_trigram_ratio"),
          coalesce(col("top_n").cast("double") / col("n_bg") >= 0.1,
            lit(false)).as("repetitive"))
        .orderBy("doc_id")
    }),

    "text_tokenize_tf" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(tokens).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("tf"))
        .orderBy(desc("tf"), asc("token"))),

    "text_lang_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("source")).as("n_sources"),
          (sum(size(tokens)).cast("double") / count(lit(1))).as("avg_tokens"))
        .orderBy("lang")),

    "text_keyword_score" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          hitCount(keywords).as("kw_hits"),
          size(tokens).as("n_tokens"))
        .withColumn("kw_score",
          col("kw_hits").cast("double") / col("n_tokens"))
        .orderBy("doc_id")),

    "text_langid" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          hitCount(enMarkers).as("en_hits"),
          hitCount(deMarkers).as("de_hits"),
          hitCount(frMarkers).as("fr_hits"))
        .withColumn("predicted",
          when(col("en_hits") >= col("de_hits")
              && col("en_hits") >= col("fr_hits"), "en")
            .when(col("de_hits") >= col("fr_hits"), "de")
            .otherwise("fr"))
        .withColumn("agrees", col("predicted") === col("lang"))
        .orderBy("doc_id")),

    "text_quality_score" -> ((s, d) => {
      val nTok = size(tokens)
      val nDistinct = size(array_distinct(tokens))
      val longTok = size(filter(tokens, t => length(t) > 5))
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          nTok.as("n_tokens"),
          (nDistinct.cast("double") / nTok).as("diversity"),
          (longTok.cast("double") / nTok).as("long_ratio"),
          // chars excluding the single separating spaces
          ((col("n_chars") - (nTok - 1)).cast("double") / nTok)
            .as("avg_token_len"))
        .withColumn("quality",
          col("diversity") * 0.5 + col("long_ratio") * 0.3
            + when(col("n_tokens") >= 20, 0.2).otherwise(0.0))
        .orderBy("doc_id")
    }),

    // Bigram (2-gram) frequency table — the n-gram-LM / contamination-check
    // staple. The bigram fan-out is zip(toks[1..n-1], toks[2..n]) built from
    // slice + arrays_zip — ordinary codegen'd expressions, NO lambda: a
    // higher-order `transform(sequence(...))` formulation measured ~10×
    // slower because HOF lambdas run interpreted and re-evaluate the split
    // per element. A one-token doc yields 0-length slices → empty zip →
    // explode drops it. The explode feeds a partial-aggregated groupBy whose
    // shuffle is bounded by bigram-vocabulary size, not corpus size — same
    // scale shape as text_tokenize_tf.
    "text_ngrams" -> ((s, d) => {
      val toks = col("toks")
      Tables.documents(s, d)
        .select(tokens.as("toks"))
        .select(slice(toks, lit(1), size(toks) - 1).as("a"),
          slice(toks, lit(2), size(toks) - 1).as("b"))
        .select(explode(arrays_zip(col("a"), col("b"))).as("p"))
        .select(concat(col("p.a"), lit(" "), col("p.b")).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 3)
        .orderBy(desc("n"), asc("bigram"))
        .limit(100)
    }),

    // TF-IDF top-3 terms per document — the IR feature-extraction staple.
    // idf is the LOG-FREE variant n_docs/df, chosen because ln() diverges
    // between JVM and libm in the last ulp (the repo's standing rule: no
    // transcendentals in oracle-compared output) while int counts and one
    // double multiply/divide are bit-exact on both engines. Scale shape:
    // the (doc, term) partial-aggregated explode is the only corpus-sized
    // shuffle; the df table is vocabulary-bounded and BROADCAST back, the
    // corpus-level count rides a 1-row broadcast, and the per-doc top-3 is
    // a doc_id-partitioned row_number (WindowGroupLimit prunes to 3 per
    // doc before the sort at scale).
    "text_tfidf" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("doc_id").orderBy(desc("tfidf"), asc("term"))
      tf.join(broadcast(dfT), "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf", col("tf").cast("double")
          * (col("n_docs").cast("double") / col("df").cast("double")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"), col("tf"),
          col("df"), col("tfidf"))
        .orderBy("doc_id", "rnk")
    }),

    // BM25 relevance of every document against a fixed two-term query —
    // retrieval scoring for training-data curation (e.g. "rank the corpus
    // by closeness to a seed topic"). Same log-free idf discipline as
    // text_tfidf: (n−df+0.5)/(df+0.5) keeps the raw odds ratio and drops
    // only ln's monotonic squash, so the whole score is integer counts
    // flowing through a FIXED, oracle-mirrored tree of double ops
    // (bit-exact: IEEE +,·,/ are exactly-rounded and two-term sums are
    // order-free). The term tfs are map-side array filters — no explode,
    // no shuffle; the corpus stats (N, Σdl, df₁, df₂) are ONE aggregate
    // broadcast back; the top-20 is TakeOrderedAndProject.
    "text_bm25" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        size(tokens).as("dl"),
        size(filter(tokens, t => t === lit("table"))).as("tf1"),
        size(filter(tokens, t => t === lit("join"))).as("tf2"))
      val stats = docs.agg(
        count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"),
        count(when(col("tf1") > 0, 1)).as("df1"),
        count(when(col("tf2") > 0, 1)).as("df2"))
      // k1 = 1.2, b = 0.75 (the standard defaults, folded into literals
      // exactly as the oracle spells them)
      def term(tf: Column, dfc: Column): Column = {
        val n = col("n_docs").cast("double")
        val df = dfc.cast("double")
        val avgdl = col("sum_dl").cast("double") / n
        val t = tf.cast("double")
        ((n - df + lit(0.5)) / (df + lit(0.5))) *
          ((t * lit(2.2)) /
            (t + lit(1.2) * (lit(0.25) + lit(0.75)
              * (col("dl").cast("double") / avgdl))))
      }
      docs.crossJoin(broadcast(stats))
        .withColumn("bm25", term(col("tf1"), col("df1"))
          + term(col("tf2"), col("df2")))
        .select(col("doc_id"), col("dl"), col("tf1"), col("tf2"), col("bm25"))
        .orderBy(desc("bm25"), asc("doc_id"))
        .limit(20)
    }),

    // Corpus-trained stupid-backoff bigram LM quality score (Brants et
    // al. 2007 "Large Language Models in Machine Translation" — the
    // CCNet-style "how well does the LM explain this document" quality
    // filter, log-free). The LM is the corpus itself: bigram counts
    // thresholded to cb ≥ 2 ("known" transitions — without the threshold
    // every document trivially explains itself) plus unigram counts. Per
    // doc:  score = Σcb/Σcu(prev) over known transitions  +  0.4 ·
    // Σcu(cur)/(n_unseen·N) over unknown ones (the stupid-backoff α=0.4
    // unigram fallback, aggregated instead of per-transition so the
    // floats never sum). Every per-doc aggregate is an INTEGER sum —
    // exact and summation-order-free — and the doubles appear only in ONE
    // fixed tree of exactly-rounded IEEE ops at the end (the text_tfidf
    // discipline), so the score is bit-exact against the oracle despite
    // SQL SUM's unspecified order. Docs with no transitions (< 2 tokens)
    // have no LM evidence and drop out in both engines. Scale shape:
    // transitions fan out lambda-free (the text_ngrams slice+zip); the
    // bigram/unigram LM tables are vocabulary-bounded and BROADCAST back;
    // the per-doc rollup is the one corpus-sized groupBy; N rides a 1-row
    // broadcast.
    // (body lives in [[LmScore]] — ONE scoring expression shared with
    // the persisted-index probe and the streaming twin, so the oracled
    // path and the deployment paths cannot drift)
    "text_lm_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      LmScore.score(docs, LmScore.lmFrom(docs)).orderBy("doc_id")
    }),

    // The trigram form of the LM score — the FULL stupid-backoff chain
    // (tri-known c3/c2(w1,w2), else 0.4·bigram, else 0.16·unigram; each
    // doc's first transition at the bigram level). Same discipline as
    // text_lm_score: integer per-doc sums per backoff level, one fixed
    // IEEE tree; the wider fan-out carries a NULL w1 ahead of each doc's
    // first transition, and SQL null-join semantics match Spark's
    // exactly (a null context never matches a trigram row).
    "text_lm3_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      LmScore.score3(docs, LmScore.lm3From(docs)).orderBy("doc_id")
    }),

    // DSIR-style importance resampling (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling"): upsample documents
    // that sound like a TARGET domain relative to the raw corpus. Two
    // frozen LMs — target (here the lang='en' slice, the domain
    // exemplar) and raw (the whole corpus) — score every document via
    // the shared [[LmScore.score]] expression; the importance weight is
    // the score ratio CLIPPED at 1 (the published method's hashed-ngram
    // likelihood ratio, re-expressed over the repo's log-free backoff
    // scores so it stays one exactly-rounded division), and acceptance
    // replaces Gumbel sampling with the md5-bucket uniform draw
    // (split_assign's construction): accept iff bucket/256 < weight —
    // DETERMINISTIC, re-shardable, and identically expressed in both
    // engines. Scale shape: two vocabulary-bounded LM trainings, two
    // broadcast-join scoring rollups over the same transition fan-out,
    // one equi-join of the two slim score tables — no new corpus-sized
    // shuffle beyond the lm_score pair.
    "sample_dsir" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // deliberately NOT materializing the shared transition fan-out: the
      // exploded transitions are LARGER than the compressed text they
      // come from (two strings per token), so checkpointing them once and
      // re-reading four times moves more bytes than re-running the
      // narrow map-side fan-out inside each pass (measured at parity at
      // sf0.1; at 100 TB the recompute stays scan-bound while the
      // materialization would write a corpus-sized intermediate). The
      // four passes each prune to (doc_id, text) at the source.
      val raw = LmScore.lmFrom(docs)
      val tgt = LmScore.lmFrom(docs.filter(col("lang") === "en"))
      dsirSelect(docs, raw, tgt).orderBy("doc_id")
    }),

    // CCNet perplexity bucketing — head/middle/tail LM-score terciles per
    // language with the keep-head+sampled-middle policy; the sampler
    // whose production form is the frozen-cuts shard bucketing (see
    // [[qualityBuckets]]/[[qualityBucketByCuts]]).
    "sample_quality_bucket" -> ((s, d) =>
      qualityBuckets(Tables.documents(s, d)).orderBy("doc_id")),

    // Train/eval contamination check — the n-gram-overlap audit every LLM
    // data pipeline runs before trusting an eval: which eval-split
    // documents (source src0) share rare 5-grams with any train-split
    // document, and how many. Scale shape: 5-grams fan out lambda-free
    // (zip of 5 shifted slices, the text_ngrams pattern), travel as
    // xxhash64 digests (8-byte shuffle keys; a digest collision only
    // inflates one count with probability ≈ pairs·2⁻⁶⁴ — the
    // sim_ngram_jaccard argument), and are de-hotted by a df ≤ 16 cap:
    // super-common phrases are dropped BEFORE the cross-split join
    // (standard contamination practice — they signal vocabulary, not
    // leakage), which bounds the per-gram pair fan-out at 16×16 and makes
    // the pair volume track true contamination density, not corpus size.
    // The gram table is aggregated ONCE: a single groupBy(gram) collects
    // the eval- and train-side doc lists together (a self-join
    // formulation re-scanned and re-shuffled the whole gram table per
    // side — measured as two duplicate exchange subtrees in the plan),
    // then cap-bounded list×list explode yields the contaminated pairs.
    "text_contamination" -> ((s, d) => {
      val t = tokens
      val g5 = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          slice(t, lit(1), greatest(size(t) - 4, lit(0))).as("a"),
          slice(t, lit(2), greatest(size(t) - 4, lit(0))).as("b"),
          slice(t, lit(3), greatest(size(t) - 4, lit(0))).as("c"),
          slice(t, lit(4), greatest(size(t) - 4, lit(0))).as("d"),
          slice(t, lit(5), greatest(size(t) - 4, lit(0))).as("e"))
        .select(col("doc_id"), col("source"),
          explode(arrays_zip(col("a"), col("b"), col("c"), col("d"),
            col("e"))).as("p"))
        .select(col("doc_id"), col("source"),
          xxhash64(concat_ws(" ", col("p.a"), col("p.b"), col("p.c"),
            col("p.d"), col("p.e"))).as("gh"))
        .distinct()
      g5.groupBy("gh").agg(
          collect_list(when(col("source") === "src0", col("doc_id")))
            .as("evs"),
          collect_list(when(col("source") =!= "src0", col("doc_id")))
            .as("trs"),
          count(lit(1)).as("df"))
        .filter(col("df") <= 16
          && size(col("evs")) > 0 && size(col("trs")) > 0)
        .select(explode(col("evs")).as("eval_doc"), col("trs"))
        .select(col("eval_doc"), explode(col("trs")).as("train_doc"))
        .groupBy("eval_doc", "train_doc")
        .agg(count(lit(1)).as("n_shared"))
        .orderBy("eval_doc", "train_doc")
    }),

    // Quality-gated corpus filter — scoring composed with a per-language
    // median threshold (the "keep the better half per language" pipeline
    // stage). The median is percentile_disc(0.5): element-SELECTING, so the
    // threshold is a source value verbatim and the >= comparison is exact on
    // both engines (percentile_cont would interpolate in engine-specific
    // arithmetic). The per-lang medians are a tiny dimension — broadcast —
    // so the corpus never shuffles: score, probe, filter, all map-side.
    "text_quality_filter" -> ((s, d) => {
      val nTok = size(tokens)
      val quality = (size(array_distinct(tokens)).cast("double") / nTok) * 0.5 +
        (size(filter(tokens, t => length(t) > 5)).cast("double") / nTok) * 0.3 +
        when(nTok >= 20, 0.2).otherwise(0.0)
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), quality.as("quality"))
      val med = scored.groupBy("lang")
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY quality)")
          .as("med_q"))
      scored.join(broadcast(med), Seq("lang"))
        .filter(col("quality") >= col("med_q"))
        .select("doc_id", "lang", "quality")
        .orderBy("doc_id")
    }),

    // Rolling polynomial hash over the token stream (order-sensitive document
    // fingerprint). DuckDB's list_reduce has no init (acc0 = first element),
    // so the Spark side folds slice(2..n) with element 1 as init — the exact
    // same sequence of (acc*31 + x) % p steps.
    "text_fingerprint" -> ((s, d) => {
      val mapped = transform(tokens,
        t => (length(t) * 131 + ascii(t)).cast("long"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          aggregate(
            slice(mapped, lit(2), greatest(size(mapped) - 1, lit(0))),
            element_at(mapped, 1),
            (acc, x) => (acc * 31 + x) % 1000000007L).as("fingerprint"),
          md5(col("text")).as("content_md5"))
        .orderBy("doc_id")
    }),

    // Token counting two ways (the training-pipeline budget estimator):
    // whitespace tokens and a BPE-ish regex tokenization (alpha runs /
    // digit runs / single non-space symbols), plus a chars-per-token ratio.
    "text_token_count" -> ((s, d) => {
      val reToks = regexp_extract_all(col("text"),
        lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("ws_tokens"),
          size(reToks).as("re_tokens"),
          (col("n_chars").cast("double") / size(reToks))
            .as("chars_per_token"))
        .orderBy("doc_id")
    }),

    // Sequence packing — the context-window packing op of a training-data
    // pipeline: assign documents to ~512-token bins by running token count.
    // Packing is PER SHARD (source), which is both what real pipelines do
    // (pack within a shard, never globally) and what keeps the window
    // partitioned — a global cumsum would serialize the corpus through one
    // task. bin = (cumsum_before_doc) div target: a doc opens a new bin iff
    // the previous docs already filled the current one.
    "text_pack_bins" -> ((s, d) => {
      val target = 512L
      val toks = size(split(col("text"), " ")).cast("long")
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), toks.as("toks"))
        .withColumn("cum", sum(col("toks")).over(w))
        .select(col("source"),
          expr(s"(cum - toks) div $target").as("bin"),
          col("toks"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("bin_tokens"))
        .orderBy("source", "bin")
    }),

    // Exact dedup keyed on an 8-byte digest: grouping on `text` directly
    // ships full documents through the exchange, and the map-side partial
    // aggregation hash table holds whole texts; xxhash64(text) carries the
    // same equality structure in 8 bytes, so at 100 TB the shuffle moves
    // digest + (min, count) partials only. A 64-bit collision between
    // distinct texts would merge two groups — probability ≈ n²·2⁻⁶⁵,
    // negligible even at 10¹¹ documents — and the oracle groups on the raw
    // text, agreeing exactly as long as no collision occurs. (The grouping
    // key is not itself emitted, so both groupings yield identical output.)
    "dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(xxhash64(col("text")))
        .agg(min(col("doc_id")).as("canonical_doc"),
          count(lit(1)).as("n_copies"))
        .select(col("canonical_doc"), col("n_copies"))
        .orderBy("canonical_doc")),

    // Overlapping token-window chunking — the context-window prep op: every
    // document becomes chunks of ≤ chunkWindow tokens starting every
    // chunkStride tokens (overlap = window − stride carries context across
    // chunk boundaries; the tail chunk may be short). Pure per-row explode:
    // no shuffle of its own (the orderBy is output determinism, not the
    // op), so at 100 TB it pipelines inside the scan stage and output
    // volume is input × window/stride. Every token lands in ≥1 chunk and
    // consecutive chunks overlap by exactly window − stride (ChunkSplitSpec
    // pins coverage, overlap, and reconstruction).
    "text_chunk" -> ((s, d) =>
      chunk(Tables.documents(s, d)).orderBy("doc_id", "chunk_id")),

    // Deterministic train/val/test assignment — the md5-bucket form of
    // [[hashSplit]] (xxhash64 is not oracle-portable; the md5 nibble pair
    // is, the `sample_mix` discipline). bucket = first two md5 hex nibbles
    // of the id → 0..255; train < 204 (79.7%), val < 230 (10.2%), test
    // rest (10.2%). Membership is a pure function of doc_id: stable across
    // runs, engines, partitionings, and corpus growth — a document never
    // changes split as the corpus evolves, which is what keeps a held-out
    // eval set contamination-free over a living corpus. Map-only (no
    // shuffle beyond the determinism orderBy). The WHOLE projection is one
    // shared SQL string evaluated by both engines, so the rule cannot
    // drift.
    "split_assign" -> ((s, d) =>
      Tables.documents(s, d).selectExpr(splitAssignCols: _*)
        .orderBy("doc_id")),

    // Collocation / phrase mining (see [[collocations]]) — the
    // tokenizer-prep op that decides which adjacent pairs ("new york")
    // deserve to be one token. Declared with the exact integer-ratio
    // score; ordering on the pair for determinism.
    "text_collocations" -> ((s, d) =>
      collocations(Tables.documents(s, d)).orderBy("w1", "w2")),

    // Deterministic global shuffle for training export — the "shuffle the
    // corpus before the trainer streams it" op. Every doc gets a
    // pseudo-random SHARD (md5 bucket % 16) and a POSITION within it
    // (rank by md5 hex key): together a total order that is a pure
    // function of doc_id — identical across runs, engines, and
    // partitionings, re-derivable for any subset (growth-stable, unlike
    // ORDER BY rand()). Scale shape: ONE hash exchange on shard + a
    // per-shard sort — exactly the shuffle a real export must pay, with
    // parallelism = shard count (set to O(cluster) at 100 TB; the
    // per-shard window never sees more than one shard's rows).
    "export_shuffle" -> ((s, d) =>
      Tables.documents(s, d).selectExpr(exportShuffleCols: _*)
        .orderBy("shard", "pos")),

    // Per-domain cap — the RefinedWeb/Gopher anti-spam rule (Penedo et
    // al. 2023 §3; Rae et al. 2021): no single source domain may
    // contribute more than K documents, the kept K chosen by the
    // deterministic md5 order (not recency or load order — re-shardable
    // and growth-stable: a domain's kept set changes only when docs
    // hashing below its current cut arrive). Scale shape: one
    // domain-keyed exchange; the rank-≤-K filter sits directly above the
    // window, so Catalyst's InferWindowGroupLimit turns it into a
    // per-partition top-K (WindowGroupLimit) — K rows per domain cross
    // the exchange boundary's sort, never a domain's full history.
    "sample_domain_cap" -> ((s, d) =>
      Tables.documents(s, d).selectExpr(domainCapCols: _*)
        .filter(col("rk") <= domainCap)
        .orderBy("source", "rk")),

    // Boilerplate-line report — the lines the corpus repeats (df ≥ 3
    // docs), with doc- and occurrence-frequency. See boilerplateLines
    // for the shape; (df, n_occ, line) is a total order (line unique).
    "text_boilerplate" -> ((s, d) =>
      boilerplateLines(withDerivedLines(Tables.documents(s, d)))
        .orderBy(desc("df"), desc("n_occ"), asc("line"))),

    // Line-level corpus dedup — per-doc cleaned text after dropping the
    // boilerplate lines, plus the kept/total accounting a drop ledger
    // records. See lineDedup for semantics and the 100 TB shape.
    "text_line_dedup" -> ((s, d) =>
      lineDedup(withDerivedLines(Tables.documents(s, d))).orderBy("doc_id")),

    // Unicode NFC normalization — the pre-hash canonicalization step
    // (nfc_normalize codegen expression, B11.4). The ASCII corpus is
    // NFC-invariant (fast path), so the query derives a DECOMPOSED text
    // first (every 'e' → 'e' + U+0301 combining acute) and normalizes
    // THAT: the oracle checks real composition work — DuckDB's utf8proc
    // and java.text.Normalizer must produce byte-identical UAX #15
    // output, and the char counts pin the combining marks actually
    // composing (n_composed < n_decomposed). Map-only: no exchange
    // before the output sort at any scale.
    "text_normalize" -> ((s, d) => {
      val nfd = graft.functions.TextNorm.nfc_normalize(col("nfd"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_replace(col("text"), "e", "e\u0301").as("nfd"))
        .select(col("doc_id"),
          length(col("nfd")).as("n_decomposed"),
          length(nfd).as("n_composed"),
          nfd.as("norm"))
        .orderBy("doc_id")
    })
  )

  /** Deterministic train/holdout split: bucket = xxhash64(id, salt) mod 100,
    * holdout = bucket < pct. Unlike `rand()`/`sampleBy` sampling, membership
    * is a pure function of the id — stable across runs, partitionings, and
    * cluster sizes, and a document KEEPS its split as the corpus grows
    * (crucial for contamination-free eval sets over a living corpus).
    * Changing `salt` draws an independent split. */
  def hashSplit(df: DataFrame, idCol: String, holdoutPct: Int,
      salt: String = "graft"): (DataFrame, DataFrame) = {
    require(holdoutPct >= 0 && holdoutPct <= 100)
    val bucket = pmod(xxhash64(col(idCol), lit(salt)), lit(100))
    (df.filter(bucket >= holdoutPct), df.filter(bucket < holdoutPct))
  }

  /** The DSIR selection body (B9.44) — score ratio clipped at 1, md5-bucket
    * uniform acceptance — shared VERBATIM by the declared `sample_dsir`
    * query (LMs trained in-query) and [[graft.stream.Streaming.streamDsir]]
    * (LMs read frozen from persisted [[LmScore.writeLm]] indexes), so the
    * online and offline selections cannot drift. Output: one row per
    * ACCEPTED document (doc_id, raw_score, target_score, weight, bucket). */
  def dsirSelect(docs: DataFrame, raw: LmScore.Lm,
      tgt: LmScore.Lm): DataFrame = {
    val sr = LmScore.score(docs, raw)
      .select(col("doc_id"), col("lm_score").as("raw_score"))
    val st = LmScore.score(docs, tgt)
      .select(col("doc_id"), col("lm_score").as("target_score"))
    sr.join(st, "doc_id")
      .withColumn("weight",
        when(col("raw_score") === 0.0, lit(1.0))
          .otherwise(least(lit(1.0),
            col("target_score") / col("raw_score"))))
      .withColumn("bucket", expr(md5Bucket256Sql("doc_id")))
      .filter(col("bucket").cast("double") / lit(256.0) < col("weight"))
      .select(col("doc_id"), col("raw_score"), col("target_score"),
        col("weight"), col("bucket"))
  }

  /** The text_lm_score oracle's CTE chain (tokens → transitions → LM
    * tables → per-doc integer sums `d` + corpus total `n`) — ONE source
    * string spliced by both text_lm_score and sample_quality_bucket, so
    * the two oracles cannot drift. */
  private val lmScoreOracleCtes: String =
    """t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |  FROM documents),
      |tr0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      |    i -> toks[i] || ' ' || toks[i + 1])) AS bg FROM t),
      |tr AS (SELECT doc_id, string_split(bg, ' ')[1] AS prev,
      |    string_split(bg, ' ')[2] AS cur FROM tr0),
      |big AS (SELECT prev, cur, COUNT(*) AS cb FROM tr
      |  GROUP BY prev, cur HAVING COUNT(*) >= 2),
      |uni AS (SELECT w, COUNT(*) AS cu FROM
      |  (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY w),
      |n AS (SELECT CAST(SUM(cu) AS BIGINT) AS n_tokens FROM uni),
      |j AS (SELECT tr.doc_id, b.cb, up.cu AS cu_prev, uc.cu AS cu_cur
      |  FROM tr LEFT JOIN big b ON b.prev = tr.prev AND b.cur = tr.cur
      |  JOIN uni up ON up.w = tr.prev
      |  JOIN uni uc ON uc.w = tr.cur),
      |d AS (SELECT doc_id, COUNT(*) AS n_trans, COUNT(cb) AS n_seen,
      |    CAST(COALESCE(SUM(cb), 0) AS BIGINT) AS hit_num,
      |    CAST(COALESCE(SUM(CASE WHEN cb IS NOT NULL THEN cu_prev END),
      |      0) AS BIGINT) AS ctx_den,
      |    COUNT(*) - COUNT(cb) AS n_unseen,
      |    CAST(COALESCE(SUM(CASE WHEN cb IS NULL THEN cu_cur END),
      |      0) AS BIGINT) AS bo_num
      |  FROM j GROUP BY doc_id)""".stripMargin

  /** The one fixed IEEE score tree over `d CROSS JOIN n`'s columns —
    * spliced beside [[lmScoreOracleCtes]]. */
  private val lmScoreOracleExpr: String =
    """(CASE WHEN n_seen = 0 THEN 0.0
      |        ELSE CAST(hit_num AS DOUBLE) / CAST(ctx_den AS DOUBLE) END)
      |  + 0.4 * (CASE WHEN n_unseen = 0 THEN 0.0
      |        ELSE CAST(bo_num AS DOUBLE)
      |          / (CAST(n_unseen AS DOUBLE) * CAST(n_tokens AS DOUBLE))
      |        END)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "text_pii_mask" ->
      s"""WITH e AS (SELECT event_id,
         |  'user ' || CAST(user_id AS VARCHAR) || ' contact 555-' ||
         |  lpad(CAST(user_id % 1000 AS VARCHAR), 3, '0') || '-' ||
         |  lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0') ||
         |  ' email u' || CAST(user_id AS VARCHAR) || '@example.com note ' ||
         |  event_type AS mixed
         |FROM events)
         |SELECT event_id,
         |  len(regexp_extract_all(mixed, '$phonePat')) AS n_phone,
         |  len(regexp_extract_all(mixed, '$emailPat')) AS n_email,
         |  regexp_replace(regexp_replace(mixed, '$phonePat', '[PHONE]', 'g'),
         |    '$emailPat', '[EMAIL]', 'g') AS masked
         |FROM e ORDER BY event_id""".stripMargin,

    "sample_mix" -> {
      val whens = mixWeights.map { case (l, w) =>
        s"WHEN lang = '$l' THEN ${mixSqlArm(w)}"
      }.mkString(" ")
      s"""SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE CASE $whens ELSE ${mixSqlArm(mixDefault)} END
         |ORDER BY doc_id""".stripMargin
    },

    "sample_budget_subword" -> {
      val whens = mixWeights.map { case (l, w) =>
        s"WHEN lang = '$l' THEN ${quotaOf(w)}"
      }.mkString(" ")
      s"""WITH t AS (SELECT doc_id, lang,
         |    $subwordEstSql AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, lang, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_tokens,
         |    CAST(CASE $whens ELSE ${quotaOf(mixDefault)} END AS BIGINT)
         |      AS quota
         |  FROM t)
         |SELECT doc_id, lang, n_tokens, cum_tokens, quota FROM c
         |WHERE cum_tokens <= quota ORDER BY doc_id""".stripMargin
    },

    "sample_budget" -> {
      val whens = mixWeights.map { case (l, w) =>
        s"WHEN lang = '$l' THEN ${quotaOf(w)}"
      }.mkString(" ")
      s"""WITH t AS (SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, lang, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_tokens,
         |    CAST(CASE $whens ELSE ${quotaOf(mixDefault)} END AS BIGINT)
         |      AS quota
         |  FROM t)
         |SELECT doc_id, lang, n_tokens, cum_tokens, quota FROM c
         |WHERE cum_tokens <= quota ORDER BY doc_id""".stripMargin
    },

    // the α=1/2 quota arithmetic mirrored step-for-step: sqrt is
    // correctly rounded on both engines, the denominator folds in lang
    // order via list_reduce ≡ Spark's sorted-struct aggregate fold, and
    // floor((s·B)/total) is the identical IEEE sequence
    "sample_temperature" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |cnt AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS c
         |  FROM t GROUP BY lang),
         |sq AS (SELECT lang, sqrt(CAST(c AS DOUBLE)) AS s FROM cnt),
         |tot AS (SELECT list_reduce(list(s ORDER BY lang ASC),
         |    (acc, x) -> acc + x) AS total FROM sq),
         |q AS (SELECT lang, CAST(floor(s * CAST($temperatureBudget AS
         |    DOUBLE) / total) AS BIGINT) AS quota
         |  FROM sq CROSS JOIN tot),
         |c AS (SELECT doc_id, lang, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_tokens
         |  FROM t)
         |SELECT c.doc_id, c.lang, c.n_tokens, c.cum_tokens, q.quota
         |FROM c JOIN q USING (lang)
         |WHERE cum_tokens <= quota ORDER BY doc_id""".stripMargin,

    // the epoch pricing mirrored step-for-step: the budget is 2·Σc with
    // Σc an exact BIGINT SUM, the one float floor is the sample_temperature
    // IEEE sequence, and everything after (div/mod/least/generate_series)
    // is integer arithmetic on both engines
    "sample_epochs" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |cnt AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS c
         |  FROM t GROUP BY lang),
         |sq AS (SELECT lang, c, sqrt(CAST(c AS DOUBLE)) AS s FROM cnt),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS mass,
         |    list_reduce(list(s ORDER BY lang ASC),
         |      (acc, x) -> acc + x) AS total FROM sq),
         |q AS (SELECT lang, c, CAST(floor(s * CAST(mass * $epochRepeatFactor
         |    AS DOUBLE) / total) AS BIGINT) AS quota
         |  FROM sq CROSS JOIN tot),
         |e AS (SELECT lang, c, quota,
         |    least(quota // c, $epochCap) AS full_epochs,
         |    CASE WHEN quota // c >= $epochCap THEN 0
         |      ELSE quota % c END AS rem
         |  FROM q),
         |cum AS (SELECT doc_id, lang, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_tokens
         |  FROM t),
         |n AS (SELECT doc_id, cum.lang, n_tokens,
         |    full_epochs + CASE WHEN cum_tokens <= rem THEN 1 ELSE 0 END
         |      AS n_epochs
         |  FROM cum JOIN e USING (lang))
         |SELECT doc_id, lang, n_tokens,
         |  CAST(unnest(generate_series(1, n_epochs)) AS BIGINT) AS epoch
         |FROM n WHERE n_epochs >= 1 ORDER BY doc_id, epoch""".stripMargin,

    // the ES draw mirrored: the 16-bit u decodes via the instr hex chain
    // (≡ Spark's conv — same integer), then ln((b+1)/65536)/w; the score
    // ranks the draw but stays OUT of the output (JVM and libm ln differ
    // in the last ulp — membership is ulp-robust, bit-compare is not)
    "sample_weighted" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    md5(CAST(doc_id AS VARCHAR)) AS m
         |  FROM documents),
         |b AS (SELECT doc_id, lang, n_tokens,
         |    CAST((instr('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096
         |      + (instr('0123456789abcdef', substr(m, 2, 1)) - 1) * 256
         |      + (instr('0123456789abcdef', substr(m, 3, 1)) - 1) * 16
         |      + (instr('0123456789abcdef', substr(m, 4, 1)) - 1)
         |      AS BIGINT) AS b16
         |  FROM t),
         |top AS (SELECT doc_id, lang, n_tokens,
         |    ln(CAST(b16 + 1 AS DOUBLE) / 65536.0)
         |      / CAST(n_tokens AS DOUBLE) AS score
         |  FROM b ORDER BY score DESC, doc_id LIMIT $weightedK)
         |SELECT doc_id, lang, n_tokens FROM top ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      """WITH base AS (SELECT doc_id,
        |    string_split(text, ' ') AS toks,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |      AS n_distinct
        |  FROM documents),
        |bg0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i + 1])) AS g
        |  FROM base),
        |bgc AS (SELECT doc_id, g, COUNT(*) AS n FROM bg0 GROUP BY 1, 2),
        |bg AS (SELECT doc_id, MAX(n) AS top_n, SUM(n) AS n_bg
        |  FROM bgc GROUP BY 1),
        |tg0 AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
        |      AS g
        |  FROM base),
        |tgc AS (SELECT doc_id, g, COUNT(*) AS n FROM tg0 GROUP BY 1, 2),
        |tg AS (SELECT doc_id,
        |    SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_tg,
        |    SUM(n) AS n_tg
        |  FROM tgc GROUP BY 1)
        |SELECT base.doc_id, n_toks,
        |  1 - CAST(n_distinct AS DOUBLE) / n_toks AS dup_token_ratio,
        |  COALESCE(CAST(top_n AS DOUBLE) / n_bg, CAST(0 AS DOUBLE))
        |    AS top_bigram_ratio,
        |  COALESCE(CAST(dup_tg AS DOUBLE) / n_tg, CAST(0 AS DOUBLE))
        |    AS dup_trigram_ratio,
        |  COALESCE(CAST(top_n AS DOUBLE) / n_bg >= 0.1, FALSE)
        |    AS repetitive
        |FROM base LEFT JOIN bg ON base.doc_id = bg.doc_id
        |LEFT JOIN tg ON base.doc_id = tg.doc_id
        |ORDER BY base.doc_id""".stripMargin,

    "text_tokenize_tf" ->
      """SELECT token, COUNT(*) AS tf
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY tf DESC, token ASC""".stripMargin,

    "text_lang_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  COUNT(DISTINCT source) AS n_sources,
        |  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "text_keyword_score" ->
      s"""SELECT doc_id,
         |  CAST(${sqlHits(keywords)} AS INTEGER) AS kw_hits,
         |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         |  CAST(${sqlHits(keywords)} AS DOUBLE)
         |    / len(string_split(text, ' ')) AS kw_score
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      s"""SELECT doc_id, lang,
         |  CAST(${sqlHits(enMarkers)} AS INTEGER) AS en_hits,
         |  CAST(${sqlHits(deMarkers)} AS INTEGER) AS de_hits,
         |  CAST(${sqlHits(frMarkers)} AS INTEGER) AS fr_hits,
         |  CASE WHEN ${sqlHits(enMarkers)} >= ${sqlHits(deMarkers)}
         |        AND ${sqlHits(enMarkers)} >= ${sqlHits(frMarkers)} THEN 'en'
         |       WHEN ${sqlHits(deMarkers)} >= ${sqlHits(frMarkers)} THEN 'de'
         |       ELSE 'fr' END AS predicted,
         |  (CASE WHEN ${sqlHits(enMarkers)} >= ${sqlHits(deMarkers)}
         |        AND ${sqlHits(enMarkers)} >= ${sqlHits(frMarkers)} THEN 'en'
         |       WHEN ${sqlHits(deMarkers)} >= ${sqlHits(frMarkers)} THEN 'de'
         |       ELSE 'fr' END) = lang AS agrees
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality_score" ->
      """WITH t AS (SELECT doc_id, n_chars, text,
        |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
        |    CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 5))
        |      AS INTEGER) AS n_long
        |  FROM documents)
        |SELECT doc_id, n_chars, n_tokens,
        |  CAST(n_distinct AS DOUBLE) / n_tokens AS diversity,
        |  CAST(n_long AS DOUBLE) / n_tokens AS long_ratio,
        |  CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_token_len,
        |  (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.5
        |    + (CAST(n_long AS DOUBLE) / n_tokens) * 0.3
        |    + CASE WHEN n_tokens >= 20 THEN 0.2 ELSE 0.0 END AS quality
        |FROM t ORDER BY doc_id""".stripMargin,

    "text_ngrams" ->
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |b AS (SELECT unnest(list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS bigram FROM t)
        |SELECT bigram, COUNT(*) AS n FROM b GROUP BY bigram
        |HAVING COUNT(*) >= 3 ORDER BY n DESC, bigram LIMIT 100""".stripMargin,

    "text_tfidf" ->
      """WITH tf AS (SELECT doc_id, term, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |        FROM documents)
        |  GROUP BY doc_id, term),
        |dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (SELECT t.doc_id, t.term, t.tf, d.df,
        |    CAST(t.tf AS DOUBLE)
        |      * (CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)) AS tfidf
        |  FROM tf t JOIN dft d USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term ASC) AS rnk FROM scored)
        |SELECT doc_id, rnk, term, tf, df, tfidf FROM r
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "text_bm25" ->
      """WITH docs AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INTEGER) AS dl,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t = 'table')) AS INTEGER) AS tf1,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t = 'join')) AS INTEGER) AS tf2
        |  FROM documents),
        |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
        |    COUNT(CASE WHEN tf1 > 0 THEN 1 END) AS df1,
        |    COUNT(CASE WHEN tf2 > 0 THEN 1 END) AS df2 FROM docs)
        |SELECT doc_id, dl, tf1, tf2,
        |  ((CAST(n_docs AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
        |      / (CAST(df1 AS DOUBLE) + 0.5))
        |    * ((CAST(tf1 AS DOUBLE) * 2.2) / (CAST(tf1 AS DOUBLE)
        |        + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |          / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |  + ((CAST(n_docs AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
        |      / (CAST(df2 AS DOUBLE) + 0.5))
        |    * ((CAST(tf2 AS DOUBLE) * 2.2) / (CAST(tf2 AS DOUBLE)
        |        + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |          / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |  AS bm25
        |FROM docs CROSS JOIN stats
        |ORDER BY bm25 DESC, doc_id ASC LIMIT 20""".stripMargin,

    // integer sums per doc, one fixed CASE/division tree at the end —
    // mirrors the Spark expression op-for-op (the bigram fan-out rides a
    // 'prev cur' join string because tokens are space-free by
    // construction, so the re-split is lossless). CTE body + score
    // expression factored (lmScoreOracleCtes/lmScoreOracleExpr) so
    // sample_quality_bucket's oracle SPLICES the same scoring SQL.
    "text_lm_score" ->
      s"""WITH $lmScoreOracleCtes
        |SELECT doc_id, n_trans, n_seen, hit_num, ctx_den, n_unseen, bo_num,
        |  $lmScoreOracleExpr AS lm_score
        |FROM d CROSS JOIN n ORDER BY doc_id""".stripMargin,

    // the lm_score CTE spliced verbatim, then per-language ntile(3) over
    // the same (score DESC, doc_id) total order and the md5-nibble
    // middle draw — every piece an already-proven cross-engine idiom
    "sample_quality_bucket" ->
      s"""WITH $lmScoreOracleCtes,
        |s AS (SELECT doc_id, $lmScoreOracleExpr AS lm_score
        |  FROM d CROSS JOIN n),
        |l AS (SELECT s.doc_id, dd.lang, s.lm_score
        |  FROM s JOIN documents dd ON dd.doc_id = s.doc_id),
        |b AS (SELECT doc_id, lang, lm_score,
        |    ntile(3) OVER (PARTITION BY lang
        |      ORDER BY lm_score DESC, doc_id) AS t3 FROM l)
        |SELECT doc_id, lang, lm_score,
        |  CASE WHEN t3 = 1 THEN 'head' WHEN t3 = 2 THEN 'middle'
        |       ELSE 'tail' END AS bucket,
        |  (t3 = 1 OR (t3 = 2 AND ${mixSqlArm(MiddleKeepSixteenths)}))
        |    AS kept
        |FROM b ORDER BY doc_id""".stripMargin,

    // aligned multi-unnest carries (w1, prev, cur) with w1 NULL ahead of
    // each doc's first transition; LEFT joins at every level mirror the
    // Spark expression, and the three backoff levels aggregate as
    // disjoint integer sums
    "text_lm3_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |tr AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(toks)),
        |      i -> CASE WHEN i = 1 THEN NULL ELSE toks[i - 1] END)) AS w1,
        |    unnest(list_transform(range(1, len(toks)),
        |      i -> toks[i])) AS prev,
        |    unnest(list_transform(range(1, len(toks)),
        |      i -> toks[i + 1])) AS cur FROM t),
        |tri AS (SELECT w1, prev, cur, COUNT(*) AS c3 FROM tr
        |  WHERE w1 IS NOT NULL GROUP BY w1, prev, cur
        |  HAVING COUNT(*) >= 2),
        |big AS (SELECT prev, cur, COUNT(*) AS cb FROM tr
        |  GROUP BY prev, cur HAVING COUNT(*) >= 2),
        |uni AS (SELECT w, COUNT(*) AS cu FROM
        |  (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |n AS (SELECT CAST(SUM(cu) AS BIGINT) AS n_tokens FROM uni),
        |j AS (SELECT tr.doc_id, t3.c3, b2.cb AS c2ctx, b.cb,
        |    up.cu AS cu_prev, uc.cu AS cu_cur
        |  FROM tr
        |  LEFT JOIN tri t3 ON t3.w1 = tr.w1 AND t3.prev = tr.prev
        |    AND t3.cur = tr.cur
        |  LEFT JOIN big b2 ON b2.prev = tr.w1 AND b2.cur = tr.prev
        |  LEFT JOIN big b ON b.prev = tr.prev AND b.cur = tr.cur
        |  LEFT JOIN uni up ON up.w = tr.prev
        |  LEFT JOIN uni uc ON uc.w = tr.cur),
        |d AS (SELECT doc_id, COUNT(*) AS n_trans,
        |    COUNT(c3) AS n_tri,
        |    CAST(COALESCE(SUM(c3), 0) AS BIGINT) AS hit3,
        |    CAST(COALESCE(SUM(CASE WHEN c3 IS NOT NULL THEN c2ctx END),
        |      0) AS BIGINT) AS ctx3,
        |    COUNT(CASE WHEN c3 IS NULL AND cb IS NOT NULL THEN 1 END)
        |      AS n_bi,
        |    CAST(COALESCE(SUM(CASE WHEN c3 IS NULL THEN cb END),
        |      0) AS BIGINT) AS hit2,
        |    CAST(COALESCE(SUM(CASE WHEN c3 IS NULL AND cb IS NOT NULL
        |      THEN cu_prev END), 0) AS BIGINT) AS ctx2,
        |    COUNT(CASE WHEN c3 IS NULL AND cb IS NULL THEN 1 END)
        |      AS n_uni,
        |    CAST(COALESCE(SUM(CASE WHEN c3 IS NULL AND cb IS NULL
        |      THEN cu_cur END), 0) AS BIGINT) AS bo_num
        |  FROM j GROUP BY doc_id)
        |SELECT doc_id, n_trans, n_tri, hit3, ctx3, n_bi, hit2, ctx2,
        |  n_uni, bo_num,
        |  (CASE WHEN n_tri = 0 THEN 0.0
        |        ELSE CAST(hit3 AS DOUBLE) / CAST(ctx3 AS DOUBLE) END)
        |  + 0.4 * (CASE WHEN n_bi = 0 THEN 0.0
        |        ELSE CAST(hit2 AS DOUBLE) / CAST(ctx2 AS DOUBLE) END)
        |  + 0.16000000000000003 * (CASE WHEN n_uni = 0 THEN 0.0
        |        ELSE CAST(bo_num AS DOUBLE)
        |          / (CAST(n_uni AS DOUBLE) * CAST(n_tokens AS DOUBLE))
        |        END) AS lm3_score
        |FROM d CROSS JOIN n ORDER BY doc_id""".stripMargin,

    // the text_lm_score chain instantiated twice (raw LM over documents,
    // target LM over the lang='en' slice), LEFT unigram joins mirroring
    // the Spark expression, ratio-clip weight + the split_assign md5
    // bucket as the deterministic uniform draw
    "sample_dsir" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |tr0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS bg FROM t),
        |tr AS (SELECT doc_id, string_split(bg, ' ')[1] AS prev,
        |    string_split(bg, ' ')[2] AS cur FROM tr0),
        |bigr AS (SELECT prev, cur, COUNT(*) AS cb FROM tr
        |  GROUP BY prev, cur HAVING COUNT(*) >= 2),
        |unir AS (SELECT w, COUNT(*) AS cu FROM
        |  (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |nr AS (SELECT CAST(SUM(cu) AS BIGINT) AS n_tokens FROM unir),
        |te AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE lang = 'en'),
        |tre0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS bg FROM te),
        |tre AS (SELECT string_split(bg, ' ')[1] AS prev,
        |    string_split(bg, ' ')[2] AS cur FROM tre0),
        |bigt AS (SELECT prev, cur, COUNT(*) AS cb FROM tre
        |  GROUP BY prev, cur HAVING COUNT(*) >= 2),
        |unit_ AS (SELECT w, COUNT(*) AS cu FROM
        |  (SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |   WHERE lang = 'en') GROUP BY w),
        |nt AS (SELECT CAST(SUM(cu) AS BIGINT) AS n_tokens FROM unit_),
        |jr AS (SELECT tr.doc_id, b.cb, up.cu AS cu_prev, uc.cu AS cu_cur
        |  FROM tr LEFT JOIN bigr b ON b.prev = tr.prev AND b.cur = tr.cur
        |  LEFT JOIN unir up ON up.w = tr.prev
        |  LEFT JOIN unir uc ON uc.w = tr.cur),
        |dr AS (SELECT doc_id, COUNT(*) AS n_trans, COUNT(cb) AS n_seen,
        |    CAST(COALESCE(SUM(cb), 0) AS BIGINT) AS hit_num,
        |    CAST(COALESCE(SUM(CASE WHEN cb IS NOT NULL THEN cu_prev END),
        |      0) AS BIGINT) AS ctx_den,
        |    COUNT(*) - COUNT(cb) AS n_unseen,
        |    CAST(COALESCE(SUM(CASE WHEN cb IS NULL THEN cu_cur END),
        |      0) AS BIGINT) AS bo_num
        |  FROM jr GROUP BY doc_id),
        |sr AS (SELECT doc_id,
        |  (CASE WHEN n_seen = 0 THEN 0.0
        |        ELSE CAST(hit_num AS DOUBLE) / CAST(ctx_den AS DOUBLE) END)
        |  + 0.4 * (CASE WHEN n_unseen = 0 THEN 0.0
        |        ELSE CAST(bo_num AS DOUBLE)
        |          / (CAST(n_unseen AS DOUBLE) * CAST(n_tokens AS DOUBLE))
        |        END) AS raw_score
        |  FROM dr CROSS JOIN nr),
        |jt AS (SELECT tr.doc_id, b.cb, up.cu AS cu_prev, uc.cu AS cu_cur
        |  FROM tr LEFT JOIN bigt b ON b.prev = tr.prev AND b.cur = tr.cur
        |  LEFT JOIN unit_ up ON up.w = tr.prev
        |  LEFT JOIN unit_ uc ON uc.w = tr.cur),
        |dt AS (SELECT doc_id, COUNT(*) AS n_trans, COUNT(cb) AS n_seen,
        |    CAST(COALESCE(SUM(cb), 0) AS BIGINT) AS hit_num,
        |    CAST(COALESCE(SUM(CASE WHEN cb IS NOT NULL THEN cu_prev END),
        |      0) AS BIGINT) AS ctx_den,
        |    COUNT(*) - COUNT(cb) AS n_unseen,
        |    CAST(COALESCE(SUM(CASE WHEN cb IS NULL THEN cu_cur END),
        |      0) AS BIGINT) AS bo_num
        |  FROM jt GROUP BY doc_id),
        |st AS (SELECT doc_id,
        |  (CASE WHEN n_seen = 0 THEN 0.0
        |        ELSE CAST(hit_num AS DOUBLE) / CAST(ctx_den AS DOUBLE) END)
        |  + 0.4 * (CASE WHEN n_unseen = 0 THEN 0.0
        |        ELSE CAST(bo_num AS DOUBLE)
        |          / (CAST(n_unseen AS DOUBLE) * CAST(n_tokens AS DOUBLE))
        |        END) AS target_score
        |  FROM dt CROSS JOIN nt),
        |wt AS (SELECT sr.doc_id, raw_score, target_score,
        |    CASE WHEN raw_score = 0.0 THEN 1.0
        |         ELSE least(1.0, target_score / raw_score) END AS weight,
        |    ${md5Bucket256Sql("sr.doc_id")} AS bucket
        |  FROM sr JOIN st ON st.doc_id = sr.doc_id)
        |SELECT doc_id, raw_score, target_score, weight, bucket FROM wt
        |WHERE CAST(bucket AS DOUBLE) / 256.0 < weight
        |ORDER BY doc_id""".stripMargin,

    "text_contamination" ->
      """WITH g AS (SELECT DISTINCT doc_id, source, unnest(list_transform(
        |      range(1, len(string_split(text, ' ')) - 3),
        |      i -> string_split(text, ' ')[i] || ' '
        |        || string_split(text, ' ')[i + 1] || ' '
        |        || string_split(text, ' ')[i + 2] || ' '
        |        || string_split(text, ' ')[i + 3] || ' '
        |        || string_split(text, ' ')[i + 4])) AS gram
        |  FROM documents),
        |rare AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= 16),
        |gr AS (SELECT g.* FROM g JOIN rare USING (gram))
        |SELECT e.doc_id AS eval_doc, t.doc_id AS train_doc,
        |  COUNT(*) AS n_shared
        |FROM gr e JOIN gr t ON e.gram = t.gram
        |  AND e.source = 'src0' AND t.source <> 'src0'
        |GROUP BY 1, 2 ORDER BY eval_doc, train_doc""".stripMargin,

    "text_quality_filter" ->
      """WITH t AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)
        |      AS n_distinct,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> length(t) > 5)) AS INTEGER) AS n_long
        |  FROM documents),
        |scored AS (SELECT doc_id, lang,
        |    (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.5
        |      + (CAST(n_long AS DOUBLE) / n_tokens) * 0.3
        |      + CASE WHEN n_tokens >= 20 THEN 0.2 ELSE 0.0 END AS quality
        |  FROM t),
        |med AS (SELECT lang, quantile_disc(quality, 0.5) AS med_q
        |  FROM scored GROUP BY lang)
        |SELECT s.doc_id, s.lang, s.quality
        |FROM scored s JOIN med m ON s.lang = m.lang
        |WHERE s.quality >= m.med_q ORDER BY s.doc_id""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_transform(string_split(text, ' '),
        |      t -> CAST(length(t) * 131 + ascii(t) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint,
        |  md5(text) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
        |    AS INTEGER) AS re_tokens,
        |  CAST(n_chars AS DOUBLE)
        |    / len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
        |    AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT MIN(doc_id) AS canonical_doc, COUNT(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY canonical_doc""".stripMargin,

    "text_pack_bins" ->
      """WITH t AS (SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |c AS (SELECT source, doc_id, toks,
        |    CAST(SUM(toks) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM t)
        |SELECT source, CAST((cum - toks) // 512 AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY source, bin ORDER BY source, bin""".stripMargin,

    "text_chunk" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
         |s AS (SELECT doc_id, toks, n,
         |    unnest(range(0, n, $chunkStride)) AS start FROM t)
         |SELECT doc_id, start // $chunkStride AS chunk_id,
         |  array_to_string(list_slice(toks, start + 1, start + $chunkWindow),
         |    ' ') AS chunk_text,
         |  least($chunkWindow, n - start) AS n_tokens
         |FROM s ORDER BY doc_id, chunk_id""".stripMargin,

    "split_assign" ->
      s"""SELECT ${splitAssignCols.mkString(", ")}
         |FROM documents ORDER BY doc_id""".stripMargin,

    // the text_lm_score bigram CTE chain, reduced to counts; the score's
    // numerator/denominator are exact BIGINT products, so the one
    // division is bit-identical to Spark's
    "text_collocations" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |  FROM documents),
         |tr0 AS (SELECT unnest(list_transform(range(1, len(toks)),
         |    i -> toks[i] || ' ' || toks[i + 1])) AS bg FROM t),
         |tr AS (SELECT string_split(bg, ' ')[1] AS w1,
         |    string_split(bg, ' ')[2] AS w2 FROM tr0),
         |pair AS (SELECT w1, w2, COUNT(*) AS c_pair FROM tr
         |  GROUP BY w1, w2 HAVING COUNT(*) >= $colloMinCount),
         |uni AS (SELECT w, COUNT(*) AS cu FROM
         |  (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  GROUP BY w),
         |n AS (SELECT CAST(SUM(cu) AS BIGINT) AS n_tokens FROM uni)
         |SELECT p.w1, p.w2, p.c_pair, u1.cu AS c_w1, u2.cu AS c_w2,
         |  CAST((p.c_pair - $colloDelta) * n.n_tokens AS DOUBLE) /
         |    CAST(u1.cu * u2.cu AS DOUBLE) AS score
         |FROM pair p
         |JOIN uni u1 ON u1.w = p.w1
         |JOIN uni u2 ON u2.w = p.w2, n
         |ORDER BY p.w1, p.w2""".stripMargin,

    "export_shuffle" ->
      s"""SELECT ${exportShuffleCols.mkString(", ")}
         |FROM documents ORDER BY shard, pos""".stripMargin,

    "sample_domain_cap" ->
      s"""SELECT * FROM (SELECT ${domainCapCols.mkString(", ")}
         |  FROM documents)
         |WHERE rk <= $domainCap ORDER BY source, rk""".stripMargin,

    "text_boilerplate" ->
      s"""WITH seg AS (SELECT doc_id, string_split(regexp_replace(text,
         |    '$lineSepPat', chr(10), 'g'), chr(10)) AS ls FROM documents),
         |lines AS (SELECT doc_id, ls[ord] AS line
         |  FROM seg, LATERAL (SELECT unnest(range(1, len(ls) + 1)) AS ord))
         |SELECT line, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS n_occ
         |FROM lines GROUP BY line HAVING COUNT(DISTINCT doc_id) >= $lineMinDf
         |ORDER BY df DESC, n_occ DESC, line""".stripMargin,

    "text_line_dedup" ->
      s"""WITH seg AS (SELECT doc_id, string_split(regexp_replace(text,
         |    '$lineSepPat', chr(10), 'g'), chr(10)) AS ls FROM documents),
         |lines AS (SELECT doc_id, ord, ls[ord] AS line
         |  FROM seg, LATERAL (SELECT unnest(range(1, len(ls) + 1)) AS ord)),
         |bp AS (SELECT line FROM (SELECT line, COUNT(DISTINCT doc_id) AS df
         |    FROM lines GROUP BY line) WHERE df >= $lineMinDf)
         |SELECT l.doc_id, COUNT(*) AS n_lines,
         |  COUNT(*) FILTER (WHERE b.line IS NULL) AS n_kept,
         |  COALESCE(string_agg(l.line, ' ' ORDER BY l.ord)
         |    FILTER (WHERE b.line IS NULL), '') AS cleaned
         |FROM lines l LEFT JOIN bp b ON l.line = b.line
         |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin,

    "text_normalize" ->
      """WITH t AS (SELECT doc_id,
        |    replace(text, 'e', 'e' || chr(769)) AS nfd FROM documents)
        |SELECT doc_id, CAST(length(nfd) AS INTEGER) AS n_decomposed,
        |  CAST(length(nfc_normalize(nfd)) AS INTEGER) AS n_composed,
        |  nfc_normalize(nfd) AS norm
        |FROM t ORDER BY doc_id""".stripMargin
  )
}
