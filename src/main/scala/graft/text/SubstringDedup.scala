package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Exact substring-level deduplication — SURVEY.md §2 B9.27 (round 8).
  *
  * MinHash ([[graft.sim.MinHash]]) catches near-duplicate *documents*; the
  * published exact-substring result ("Deduplicating Training Data Makes
  * Language Models Better", Lee et al. 2022) removes *copied passages* —
  * ≥k-token runs shared verbatim between otherwise-distinct documents.
  * Their tool builds a corpus-wide suffix array; that is a single-machine
  * shape. With the match length fixed at k the same guarantee reduces to a
  * pure map-reduce pipeline, which is the 100 TB shape:
  *
  *  1. shingle: every k-token window of every doc → (doc_id, pos, digest).
  *     Lambda-free fan-out (k shifted `slice`s + `arrays_zip` +
  *     `posexplode` — the `text_contamination` pattern, TextOps.scala), one
  *     row per token, travelling as an 8-byte xxhash64 digest. A digest
  *     collision only bridges two unrelated grams with probability
  *     ≈ pairs·2⁻⁶⁴ (the standing sim_ngram_jaccard argument).
  *  2. share counts: groupBy(digest) → distinct-doc count, keep >1. Partial
  *     aggregation bounds the exchange by distinct-gram cardinality; unlike
  *     the doc×doc contamination join there is NO pair fan-out anywhere, so
  *     no df cap is needed — a phrase shared by 10⁶ docs costs 10⁶ rows
  *     (linear), not 10¹² pairs.
  *  3. join back on digest: both sides are already hash-partitioned on the
  *     digest from step 2, and only duplicated shingles survive.
  *  4. span merge per doc: shingles at p₁ < p₂ cover contiguously iff
  *     p₂ − p₁ ≤ k, so a doc_id-partitioned window (`lag` + running sum of
  *     breaks) assigns maximal covered runs — gaps-and-islands, no
  *     running-max needed because all spans have equal length k. This
  *     shuffle carries only the duplicated positions, a small fraction of
  *     the corpus in any corpus worth training on.
  *
  * Every step is deterministic integer arithmetic → DuckDB-oracle eligible
  * (the oracle groups the raw gram strings; Spark groups digests — same
  * final spans, the contamination precedent).
  */
object SubstringDedup {

  /** Matches the repo-wide whitespace tokenizer (TextOps.tokens). */
  private def tokens: Column = split(col("text"), " ")

  /** (doc_id, pos, gh): one row per k-token shingle, pos 1-based. */
  def shingles(docs: DataFrame, k: Int): DataFrame = {
    val t = tokens
    val n = size(t)
    val parts = (1 to k).map(i =>
      slice(t, lit(i), greatest(n - (k - 1), lit(0))).as(s"s$i"))
    val gram = concat_ws(" ", (1 to k).map(i => col(s"p.s$i")): _*)
    docs
      .select(col("doc_id") +: parts: _*)
      .select(col("doc_id"),
        posexplode(arrays_zip((1 to k).map(i => col(s"s$i")): _*)).as(Seq("p0", "p")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), xxhash64(gram).as("gh"))
  }

  /** Maximal duplicated-token spans per document:
    * (doc_id, span_start, span_len, n_sharers) where span tokens
    * [span_start, span_start+span_len-1] (1-based) are entirely covered by
    * k-token shingles each appearing verbatim in ≥2 distinct documents, and
    * n_sharers is the distinct-document count of the span's most-shared
    * shingle (self included). */
  def dupSpans(docs: DataFrame, k: Int): DataFrame = {
    val g = shingles(docs, k)
    val nd = g.groupBy("gh")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
    mergeSpans(g.join(nd, "gh"), k)
  }

  /** Gaps-and-islands merge of flagged shingle positions `(doc_id, pos,
    * nd)` into maximal covered spans — shared by the whole-corpus and
    * index-probe paths so their span semantics cannot drift. Equal-length
    * (k) spans cover contiguously iff the position gap is ≤ k, so no
    * running-max is needed. */
  private def mergeSpans(dup: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val lagPos = lag(col("pos"), 1).over(w)
    val brk = when(lagPos.isNull || col("pos") - lagPos > k, 1).otherwise(0)
    dup
      .withColumn("island",
        sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k) - min(col("pos"))).as("span_len"),
        max(col("nd")).as("n_sharers"))
      .select("doc_id", "span_start", "span_len", "n_sharers")
  }

  // ------------------------------------------------------------------
  // incremental form: probe a persisted corpus shingle index
  // ------------------------------------------------------------------

  /** Append one corpus shard's shingles to the persisted index at `path`:
    * ONE row per distinct k-shingle digest with its distinct-doc count —
    * gram-cardinality-sized, never raw positions or text. Under the
    * monotonic-id ingest contract (shards are doc-disjoint, the
    * [[graft.sim.IncrementalDedup]] precedent) summing `nd` across
    * appended rows equals the distinct-doc count over the union, so the
    * index needs no compaction to stay exact — append is the only write. */
  def appendShingleIndex(docs: DataFrame, k: Int, path: String): Unit =
    shingles(docs, k)
      .groupBy("gh").agg(countDistinct(col("doc_id")).as("nd"))
      .write.mode("append").parquet(path)

  /** Retract docs from the gram table (round 12, the
    * [[graft.sim.Curation.retract]] takedown path): append their per-gram
    * distinct-doc counts NEGATED. Probes SUM `nd` per gram, so the
    * subtraction is exact under the disjoint-shard contract the appends
    * already rely on; compaction's merge drops grams whose sum reaches 0.
    * `docs` must be the previously-appended rows being taken down (same
    * text — the negative must mirror the positive gram-for-gram). */
  def retractShingleIndex(docs: DataFrame, k: Int, path: String): Unit =
    shingles(docs, k)
      .groupBy("gh").agg((-countDistinct(col("doc_id"))).as("nd"))
      .write.mode("append").parquet(path)

  /** [[appendShingleIndex]] as a BUCKETED managed table: the index is
    * written `bucketBy(gh)`, so the probe's digest aggregation AND the
    * index side of the probe join consume the bucketing as their hash
    * distribution — at 100 TB the (huge) index never shuffles, only the
    * shard side exchanges to match the bucket count. Same append-only
    * compose-exactly contract as the path form (bucketed appends with an
    * identical bucket spec are legal; summed `nd` stays exact under
    * disjoint shards). */
  def appendShingleIndexBucketed(docs: DataFrame, k: Int, table: String,
      buckets: Int = 64): Unit =
    shingles(docs, k)
      .groupBy("gh").agg(countDistinct(col("doc_id")).as("nd"))
      .write.mode("append").bucketBy(buckets, "gh").sortBy("gh")
      .saveAsTable(table)

  /** [[shardDupSpans]] against the bucketed index table — identical
    * semantics (shared probe body), minus the index-side exchange;
    * SubstringDedupSpec proves result equality with the path form and
    * counts the exchanges the bucketing removes. */
  def shardDupSpansBucketed(shard: DataFrame, k: Int, table: String,
      estShardGrams: Long = 1000000L): DataFrame =
    probeSpans(shard, k, shard.sparkSession.table(table), estShardGrams)

  /** Spans of a NEW SHARD copied verbatim (≥k tokens) from the indexed
    * corpus — the incremental/contamination form of [[dupSpans]], with
    * shard cost ∝ shard: the corpus contributes only its shingle index,
    * which is Bloom-pruned MAP-SIDE to the shard's digests
    * ([[graft.ops.JoinPrefilter.bloomReduce]] — at 100 TB the index is the
    * big side and the shard's digest set is the small one, so the index
    * never shuffles unpruned) before the exact digest join. Emits
    * (doc_id, span_start, span_len, n_sharers) where n_sharers counts
    * CORPUS documents sharing the span's most-shared shingle (the shard
    * doc itself is not in the index, so 1 means one corpus doc has it).
    * Shard-internal duplication is deliberately out of scope here — that
    * is [[dupSpans]] over the shard, the orthogonal axis. */
  def shardDupSpans(shard: DataFrame, k: Int, path: String,
      estShardGrams: Long = 1000000L): DataFrame =
    probeSpans(shard, k, shard.sparkSession.read.parquet(path), estShardGrams)

  private def probeSpans(shard: DataFrame, k: Int, idx: DataFrame,
      estShardGrams: Long): DataFrame = {
    val g = shingles(shard, k)
    val pruned = graft.ops.JoinPrefilter
      .bloomReduce(idx, col("gh"), g, col("gh"), estShardGrams)
      .groupBy("gh").agg(sum(col("nd")).as("nd"))
      // grams fully cancelled by retraction negatives sum to 0 and must
      // not count as shared ([[retractShingleIndex]])
      .filter(col("nd") > 0)
    mergeSpans(g.join(pruned, "gh"), k)
  }

  /** Per-document duplication budget over the WHOLE corpus (every doc gets a
    * row): token count, duplicated-token count, duplicated fraction, and the
    * keep verdict of the standard "drop docs that are mostly copies" filter.
    * The spans aggregate is doc-keyed and joined back to the slim
    * (doc_id, n_tokens) projection — the corpus text never shuffles. */
  def dedupStats(docs: DataFrame, k: Int, maxDupFrac: Double): DataFrame =
    statsOfSpans(docs, dupSpans(docs, k), maxDupFrac)

  /** The budget arithmetic shared by [[dedupStats]] and
    * [[shardDedupStats]] — per-doc duplicated-token sum over `spans`
    * joined back to the slim (doc_id, n_tokens) projection. */
  private def statsOfSpans(docs: DataFrame, spans: DataFrame,
      maxDupFrac: Double): DataFrame = {
    val perDoc = spans
      .groupBy("doc_id")
      .agg(sum(col("span_len")).as("dup_tokens"))
    docs.select(col("doc_id"), size(tokens).as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("dup_tokens", coalesce(col("dup_tokens"), lit(0L)))
      .withColumn("dup_frac",
        col("dup_tokens").cast("double") / col("n_tokens").cast("double"))
      .withColumn("keep", col("dup_frac") < maxDupFrac)
      .select("doc_id", "n_tokens", "dup_tokens", "dup_frac", "keep")
  }

  /** [[dedupStats]] of a NEW SHARD against corpus∪shard, at shard cost —
    * the incremental form [[graft.sim.Curation.ingestShard]]'s substring
    * stage needs: a shard doc's budget must count spans it shares with
    * the indexed corpus AND with other shard docs (the batch stage sees
    * both). Shards are doc-disjoint from the corpus under the
    * monotonic-id contract, so the union's distinct-doc count per gram
    * decomposes exactly: nd(corpus∪shard) = nd_index + nd_shard. The
    * index side is the [[appendShingleIndex]] table, Bloom-pruned
    * map-side to the shard's digests before the join (the
    * [[shardDupSpans]] shape — the corpus never shuffles); the shard-side
    * count is a shard-sized aggregate. EQUALS
    * `dedupStats(corpus ∪ shard, k, f)` restricted to the shard's doc ids
    * (CurationIngestSpec pins it), because [[mergeSpans]] and the budget
    * arithmetic are shared verbatim with the batch path. */
  def shardDedupStats(shard: DataFrame, k: Int, path: String,
      maxDupFrac: Double, estShardGrams: Long = 1000000L): DataFrame = {
    // grams feed three consumers (shard count, index join, span merge):
    // one materialization (cluster: checkpoint)
    val g = shingles(shard, k).localCheckpoint()
    val ndS = g.groupBy("gh").agg(countDistinct(col("doc_id")).as("nd_s"))
    val idx = shard.sparkSession.read.parquet(path)
    val ndC = graft.ops.JoinPrefilter
      .bloomReduce(idx, col("gh"), g, col("gh"), estShardGrams)
      .groupBy("gh").agg(sum(col("nd")).as("nd_c"))
    val nd = ndS.join(ndC, Seq("gh"), "left")
      .select(col("gh"),
        (col("nd_s") + coalesce(col("nd_c"), lit(0L))).as("nd"))
      .filter(col("nd") > 1)
    statsOfSpans(shard, mergeSpans(g.join(nd, "gh"), k), maxDupFrac)
  }

  /** Corpus with every duplicated span's tokens removed (the Lee et al.
    * "remove all copies" variant): docs keep only tokens outside every
    * flagged span, rejoined by single spaces. Declared as
    * `text_substring_mask`. The keep filter is the codegen'd
    * [[org.apache.spark.sql.graftexpr.MaskSpansExpr]] two-pointer sweep —
    * O(tokens + spans) per doc inside the whole-stage span. (Round 8
    * shipped this as a `filter(…, (tok, i) => !exists(spans, …))` HOF
    * pair: interpreted, O(tokens × spans), and it broke the enclosing
    * codegen stage — the r8 verdict's one hot-path wart. The expression
    * mirrors the lambda's semantics exactly, so the declared query's
    * oracle hash is unchanged; ExplainAudit now gates the lambda's
    * absence.) */
  def maskSpans(docs: DataFrame, k: Int): DataFrame = {
    val spansByDoc = dupSpans(docs, k)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_len"))).as("spans"))
    docs.join(spansByDoc, Seq("doc_id"), "left")
      .withColumn("spans", coalesce(col("spans"),
        array().cast("array<struct<span_start:int,span_len:int>>")))
      .withColumn("kept", org.apache.spark.sql.graftexpr.MaskSpansExpr
        .column(tokens, col("spans")))
      .select(col("doc_id"), concat_ws(" ", col("kept")).as("text"))
  }

  // ------------------------------------------------------------------
  // declared queries + oracles
  // ------------------------------------------------------------------

  private val K = 8

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_substring_dedup" -> ((s, d) =>
      dupSpans(Tables.documents(s, d), K)
        .orderBy("doc_id", "span_start")),
    "text_substring_dedup_filter" -> ((s, d) =>
      dedupStats(Tables.documents(s, d), K, 0.5)
        .orderBy("doc_id")),
    "text_substring_mask" -> ((s, d) =>
      maskSpans(Tables.documents(s, d), K)
        .orderBy("doc_id"))
  )

  /** The oracle rebuilds the same pipeline on raw gram STRINGS (DuckDB has
    * no xxhash64); the compared output carries no hashes, so the two
    * formulations agree exactly — the text_contamination precedent. The
    * BODY form is parameterized on the source relation so
    * [[graft.sim.Curation]]'s oracle can run the identical span pipeline
    * over its exact-dedup survivors; callers prepend `WITH`. */
  private[graft] def spanCteBodyOver(src: String): String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t
       |  FROM $src),
       |g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(t) - ${K - 2}),
       |      i -> {'pos': CAST(i AS INTEGER),
       |            'gram': ${(0 until K).map(j => s"t[i + $j]").mkString(" || ' ' || ")}})) AS u
       |    FROM toks)),
       |nd AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM g
       |  GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1),
       |dup AS (SELECT g.doc_id, g.pos, nd.nd FROM g JOIN nd USING (gram)),
       |brks AS (SELECT doc_id, pos, nd,
       |    CASE WHEN lag(pos) OVER w IS NULL
       |      OR pos - lag(pos) OVER w > $K THEN 1 ELSE 0 END AS brk
       |  FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |isl AS (SELECT doc_id, pos, nd,
       |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS island
       |  FROM brks),
       |spans AS (SELECT doc_id, MIN(pos) AS span_start,
       |    CAST(MAX(pos) + $K - MIN(pos) AS INTEGER) AS span_len,
       |    CAST(MAX(nd) AS BIGINT) AS n_sharers
       |  FROM isl GROUP BY doc_id, island)""".stripMargin

  private val spanCte: String = s"WITH ${spanCteBodyOver("documents")}"

  /** The declared shingle length — shared with [[graft.sim.Curation]] so
    * the curation report's substring stage and the standalone
    * `text_substring_dedup*` queries agree on k. */
  private[graft] def declaredK: Int = K

  def oracleSql: Map[String, String] = Map(
    "text_substring_dedup" ->
      s"""$spanCte
         |SELECT doc_id, span_start, span_len, n_sharers
         |FROM spans ORDER BY doc_id, span_start""".stripMargin,

    "text_substring_dedup_filter" ->
      s"""$spanCte,
         |per_doc AS (SELECT doc_id, CAST(SUM(span_len) AS BIGINT)
         |    AS dup_tokens FROM spans GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(len(string_split(d.text, ' ')) AS INTEGER) AS n_tokens,
         |  COALESCE(p.dup_tokens, 0) AS dup_tokens,
         |  CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE)
         |    / CAST(len(string_split(d.text, ' ')) AS DOUBLE) AS dup_frac,
         |  (CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE)
         |    / CAST(len(string_split(d.text, ' ')) AS DOUBLE)) < 0.5 AS keep
         |FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // DuckDB list_filter lambdas are 1-indexed; the span membership test
    // mirrors Spark's (i+1)-based one exactly. list() order is arbitrary
    // but the predicate is an existence check — order-free on both engines.
    "text_substring_mask" ->
      s"""$spanCte,
         |sp AS (SELECT doc_id,
         |    list({'s': span_start, 'l': span_len}) AS spans
         |  FROM spans GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(array_to_string(
         |    list_filter(string_split(d.text, ' '), (t, i) ->
         |      len(list_filter(COALESCE(sp.spans,
         |            CAST([] AS STRUCT(s INTEGER, l INTEGER)[])),
         |          x -> i >= x.s AND i < x.s + x.l)) = 0),
         |    ' '), '') AS text
         |FROM documents d LEFT JOIN sp ON d.doc_id = sp.doc_id
         |ORDER BY d.doc_id""".stripMargin
  )
}
