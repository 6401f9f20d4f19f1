package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Embedding-quality evaluation + contrastive training-set assembly —
  * SURVEY.md §2 B9.45–B9.47.
  *
  * Every curation pipeline that builds or consumes an embedding space needs
  * to MEASURE it: retrieval metrics (MRR / hits@k / precision@k) against
  * labeled relevance, k-NN label accuracy (the standard linear-probe-free
  * embedding quality check), and hard-negative mining (the training-set
  * assembly op for contrastive fine-tuning — Karpukhin et al. 2020's DPR
  * recipe selects, per anchor, the highest-scoring NON-relevant documents).
  *
  * All three share one scored-pairs builder: a deterministic 5% probe
  * sample (vec_id % 20 == 0 — membership a pure function of the id, the
  * hashSplit/split_assign discipline) broadcast against one scan of the
  * remaining corpus, cosine via the ONE shared [[VectorMath.dot]] fold so
  * scores are bit-exact vs the oracle. Scale shape: the probe set is
  * eval-sized (bounded, broadcastable); the corpus is scanned ONCE with a
  * narrow map; per-probe top-k prunes map-side via WindowGroupLimit before
  * the probe-keyed exchange. At 100 TB the same metric reducers run
  * unchanged over [[Pq.probeIndexTopKBatch]]'s output instead of the exact
  * scan — [[retrievalMetrics]] takes ANY (probe_id, probe_label, vec_id,
  * label, rank) table, and EvalSpec pins the ANN-backed composition.
  *
  * Determinism: ranks tie-break by vec_id; MRR avoids float-sum-order
  * hazard entirely — reciprocal ranks are summed as the INTEGER 2520/rank
  * (2520 = lcm(1..10), so every reciprocal at k ≤ 10 is exact), with the
  * single double division at the end (the agg_var_exact discipline).
  */
object Eval {

  import VectorMath.dot

  val ProbeMod = 20 // 1-in-20 deterministic eval sample

  /** Scored (probe × corpus) pairs: probe_id, probe_label, vec_id, label,
    * cosine. Probes ride a broadcast; the corpus is scanned once. */
  def scoredPairs(emb: DataFrame): DataFrame = {
    val normed = emb.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
    val probes = broadcast(normed.filter(col("vec_id") % ProbeMod === 0)
      .select(col("vec_id").as("probe_id"), col("label").as("probe_label"),
        col("v").as("p"), col("norm").as("pnorm")))
    normed.filter(col("vec_id") % ProbeMod =!= 0)
      .crossJoin(probes)
      .select(col("probe_id"), col("probe_label"), col("vec_id"), col("label"),
        (dot(col("v"), col("p")) / (col("norm") * col("pnorm"))).as("cosine"))
  }

  /** Per-probe rank table from scored pairs (rank 1 = nearest; ties by
    * vec_id). The rank ≤ k filter is what lets WindowGroupLimit prune
    * each partition to k rows BEFORE the probe-keyed exchange. */
  def ranked(pairs: DataFrame, k: Int): DataFrame =
    pairs.withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(desc("cosine"), asc("vec_id"))))
      .filter(col("rank") <= k)

  /** One-row retrieval metrics over ANY per-probe rank table with columns
    * (probe_id, probe_label, label, rank) at depth k=10: hit@10, MRR@10
    * (exact-integer reciprocal sums), precision@10. Shared verbatim by the
    * exact oracled query and the ANN-index composition in EvalSpec. */
  def retrievalMetrics(top10: DataFrame): DataFrame = {
    val per = top10.groupBy("probe_id").agg(
      min(when(col("label") === col("probe_label"), col("rank")))
        .as("first_rel"),
      sum(when(col("label") === col("probe_label"), 1L).otherwise(0L))
        .as("rel_in_10"))
    per.agg(
        count(lit(1)).as("n_probes"),
        sum(when(col("first_rel").isNotNull, 1L).otherwise(0L)).cast("long")
          .as("n_hit"),
        // 2520/rank is an exact integer for rank ∈ 1..10 — the reciprocal
        // sum never touches float addition order
        sum(when(col("first_rel").isNotNull,
            (lit(2520.0) / col("first_rel")).cast("long")).otherwise(0L))
          .cast("long").as("rr_scaled"),
        sum("rel_in_10").cast("long").as("n_rel_top10"))
      .select(col("n_probes"), col("n_hit"), col("rr_scaled"),
        col("n_rel_top10"),
        (col("rr_scaled") / (lit(2520.0) * col("n_probes"))).as("mrr"),
        (col("n_rel_top10") / (lit(10.0) * col("n_probes")))
          .as("precision_at_10"))
  }

  // ------------------------------------------------------------- nDCG@10
  // The gain table 1/log2(rank+1) and its prefix sums (ideal DCG at m
  // relevant results) are computed ONCE here and spliced as IDENTICAL
  // double literals into the Spark expression and the DuckDB oracle —
  // Double.toString round-trips, so both engines parse the same bit
  // pattern and the transcendental log never runs at query time on either
  // side (the text_tfidf no-transcendentals discipline). DCG itself is a
  // rank-ORDERED left fold (≤ 10 terms), not a SQL SUM, so summation
  // order is pinned on both engines (the lex_search BM25 fold posture).

  /** gains(r-1) = 1/log2(r+1) for rank r ∈ 1..10. */
  private[sim] val ndcgGains: Seq[Double] =
    (1 to 10).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))

  /** idcgTable(m) = ideal DCG with m relevant results, m ∈ 0..10 (left
    * fold, matching the query-side fold order). */
  private[sim] val idcgTable: Seq[Double] =
    ndcgGains.scanLeft(0.0)(_ + _)

  /** Per-probe nDCG@10 over scored (probe × corpus) pairs with binary
    * label relevance: (probe_id, n_rel, dcg, ndcg), ndcg = 0 where the
    * probe has no relevant corpus vector (idcg would be 0). n_rel counts
    * ALL relevant corpus vectors (the ideal ranking fills its top-10 from
    * the whole corpus, not from the retrieved cut). Scale shape: the
    * top-10 cut prunes map-side in the same WindowGroupLimit window as
    * [[retrievalMetrics]]; the n_rel count is a (probe × label)-bounded
    * partial aggregate; gains enter via one 10-element literal lookup. */
  def ndcgAt10(pairs: DataFrame): DataFrame = {
    val gainArr = typedLit(ndcgGains)
    val idcgArr = typedLit(idcgTable)
    // ONE pass: rank everything (n_rel needs every relevant row anyway, so
    // there is no rank ≤ k cut to prune behind), then a single per-probe
    // aggregate — no join-back, no second scan of the pair fan-out. The
    // when() emits NULL for non-contributing rows and collect_list drops
    // them; least() keeps the literal lookup in bounds at rank > 10.
    val rel = col("label") === col("probe_label")
    pairs
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(desc("cosine"), asc("vec_id"))))
      .groupBy("probe_id")
      .agg(
        sum(when(rel, 1L).otherwise(0L)).as("n_rel"),
        aggregate(
          transform(
            array_sort(collect_list(when(rel && col("rank") <= 10,
              struct(col("rank"),
                element_at(gainArr, least(col("rank"), lit(10)).cast("int"))
                  .as("gain"))))),
            x => x.getField("gain")),
          lit(0.0), (acc, x) => acc + x).as("dcg"))
      .withColumn("idcg",
        element_at(idcgArr, least(col("n_rel"), lit(10L)).cast("int") + 1))
      .select(col("probe_id"), col("n_rel"), col("dcg"),
        when(col("idcg") > 0.0, col("dcg") / col("idcg")).otherwise(lit(0.0))
          .as("ndcg"))
      .orderBy("probe_id")
  }

  /** The rank→gain CASE and the n_rel→ideal-DCG CASE rendered from the
    * SAME literal tables the Spark expression uses — the oracle cannot
    * drift from the query. */
  /** Exact-decimal rendering: `Double.toString`'s shortest form is only
    * guaranteed to round-trip through a CORRECTLY-rounded parser, and
    * DuckDB types 17-significant-digit literals as DECIMAL first (measured:
    * 0.38685280723454163 comes back one ulp off). The full exact decimal
    * expansion of the double (≤ ~55 digits) is longer than DECIMAL's 38-
    * digit ceiling, so DuckDB parses it directly as DOUBLE — and since the
    * string IS the double's exact value, any nearest-parse returns the
    * identical bit pattern. */
  private def exactLit(d: Double): String =
    s"CAST(${new java.math.BigDecimal(d).toPlainString} AS DOUBLE)"

  private def gainCaseSql: String =
    "CASE rank " + ndcgGains.zipWithIndex.map { case (g, i) =>
      s"WHEN ${i + 1} THEN ${exactLit(g)}" }.mkString(" ") + " END"
  private def idcgCaseSql(nRelExpr: String): String =
    s"CASE least($nRelExpr, 10) " + idcgTable.zipWithIndex.map {
      case (v, m) => s"WHEN $m THEN ${exactLit(v)}" }.mkString(" ") + " END"

  /** k-NN label prediction per probe: majority vote over the top-5
    * neighbors' labels (ties: larger vote count, then smaller label — the
    * agg_mode discipline). One row per probe with the correctness bit. */
  def knnPredictions(pairs: DataFrame): DataFrame = {
    val votes = ranked(pairs, 5)
      .groupBy("probe_id", "probe_label", "label")
      .agg(count(lit(1)).as("votes"))
    votes.withColumn("vr", row_number().over(
        Window.partitionBy("probe_id").orderBy(desc("votes"), asc("label"))))
      .filter(col("vr") === 1)
      .select(col("probe_id"), col("probe_label").as("true_label"),
        col("label").as("pred_label"), col("votes"),
        (col("label") === col("probe_label")).cast("int").as("correct"))
  }

  /** Contrastive triples per anchor: the top-1 positive (nearest
    * same-label vector) paired with the top-3 hard negatives (nearest
    * DIFFERENT-label vectors — the ones a contrastive loss learns most
    * from). Anchors with no in-corpus positive drop (inner join). */
  def hardNegatives(pairs: DataFrame): DataFrame = {
    val posW = Window.partitionBy("probe_id")
      .orderBy(desc("cosine"), asc("vec_id"))
    val pos = pairs.filter(col("label") === col("probe_label"))
      .withColumn("r", row_number().over(posW)).filter(col("r") === 1)
      .select(col("probe_id"), col("vec_id").as("pos_id"),
        col("cosine").as("pos_cosine"))
    val neg = pairs.filter(col("label") =!= col("probe_label"))
      .withColumn("neg_rank", row_number().over(posW))
      .filter(col("neg_rank") <= 3)
      .select(col("probe_id"), col("vec_id").as("neg_id"),
        col("cosine").as("neg_cosine"), col("neg_rank"))
    pos.join(neg, "probe_id")
      .select(col("probe_id").as("anchor_id"), col("pos_id"),
        col("pos_cosine"), col("neg_id"), col("neg_cosine"), col("neg_rank"))
  }

  /** Reciprocal-rank fusion (Cormack et al. SIGIR 2009) of two ranked
    * lists (id, rank ≥ 1): Σ 1/(c0 + rank), a doc absent from one list
    * contributing nothing for it — the standard sparse+dense hybrid
    * combiner, score-scale-free by construction. With exactly two systems
    * the float sum is ONE addition of two exactly-rounded divisions —
    * order-free, hash-exact. Ranks must come from a totally ordered
    * (score desc, id) top-k CUT — rank AFTER the limit, so the window
    * input is k rows, never the corpus. */
  def rrfFuse(a: DataFrame, b: DataFrame, c0: Int = 60): DataFrame =
    a.select(col("id"), col("rank").cast("long").as("r_a"))
      .join(b.select(col("id"), col("rank").cast("long").as("r_b")),
        Seq("id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(c0) + col("r_a")).cast("double"), lit(0.0))
          + coalesce(lit(1.0) / (lit(c0) + col("r_b")).cast("double"),
            lit(0.0)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Hybrid retrieval (SURVEY B9.50): the lexical BM25 leg over
    // `documents` ([[graft.text.LexIndex.searchCorpus]] — the lex_search
    // fold verbatim, terms "table"+"join") and the dense cosine leg over
    // `embeddings` (the sim_cosine_topk shape, probe vec_id 0; doc_id ≡
    // vec_id row-for-row in the testdata), each CUT to its top-50 by
    // TakeOrdered and only then ranked — row_number over ≤ 50 rows, never
    // a global window over the corpus — then RRF-fused. The serving twin
    // (index-served lexical leg + PQ-served dense leg through the same
    // rrfFuse) is pinned in LexIndexSpec.
    "sim_hybrid_rrf" -> ((s, d) => {
      val lexTop = graft.text.LexIndex
        .searchCorpus(Tables.documents(s, d), Seq("table", "join"), 50)
      val lexR = lexTop.withColumn("rank", row_number().over(
          Window.orderBy(desc("score"), asc("doc_id"))))
        .select(col("doc_id").as("id"), col("rank"))
      val normed = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("norm", sqrt(dot(col("v"), col("v"))))
      val probe = broadcast(normed.filter(col("vec_id") === 0)
        .select(col("v").as("p"), col("norm").as("pnorm")))
      val denseTop = normed.filter(col("vec_id") =!= 0)
        .crossJoin(probe)
        .select(col("vec_id"),
          (dot(col("v"), col("p")) / (col("norm") * col("pnorm")))
            .as("cosine"))
        .orderBy(desc("cosine"), asc("vec_id")).limit(50)
      val denseR = denseTop.withColumn("rank", row_number().over(
          Window.orderBy(desc("cosine"), asc("vec_id"))))
        .select(col("vec_id").as("id"), col("rank"))
      rrfFuse(lexR, denseR)
        .select(col("id").as("doc_id"), col("r_a").as("r_lex"),
          col("r_b").as("r_dense"), col("rrf"))
        .orderBy(desc("rrf"), asc("doc_id")).limit(20)
    }),

    // Retrieval quality of the embedding space: for each eval probe, rank
    // the corpus by exact cosine and score label-relevance at depth 10.
    "eval_retrieval" -> ((s, d) =>
      retrievalMetrics(ranked(scoredPairs(Tables.embeddings(s, d)), 10))),

    // Embedding quality as k-NN label accuracy: per-probe majority vote
    // over the 5 nearest corpus labels vs the probe's own label.
    "eval_knn_accuracy" -> ((s, d) =>
      knnPredictions(scoredPairs(Tables.embeddings(s, d)))
        .orderBy("probe_id")),

    // Contrastive training triples: anchor + nearest positive + the 3
    // hardest negatives, by exact cosine.
    "mine_hard_negatives" -> ((s, d) =>
      hardNegatives(scoredPairs(Tables.embeddings(s, d)))
        .orderBy("anchor_id", "neg_rank")),

    // Graded-position retrieval quality: per-probe nDCG@10 with binary
    // label relevance — the standard ranking metric MRR/precision cannot
    // see (it rewards EVERY relevant position, discounted by depth).
    "eval_ndcg" -> ((s, d) =>
      ndcgAt10(scoredPairs(Tables.embeddings(s, d))))
  )

  // Shared oracle CTE chain — the sim_knn_graph dot-product fold with the
  // probe/corpus split on vec_id % 20.
  private val pairsCte =
    """WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |normed AS (SELECT vec_id, label, v,
      |    sqrt(list_reduce(list_transform(list_zip(v, v), z -> z[1] * z[2]),
      |      (acc, x) -> acc + x)) AS norm FROM emb),
      |pairs AS (
      |  SELECT p.vec_id AS probe_id, p.label AS probe_label,
      |    c.vec_id AS vec_id, c.label AS label,
      |    list_reduce(list_transform(list_zip(c.v, p.v), z -> z[1] * z[2]),
      |      (acc, x) -> acc + x) / (c.norm * p.norm) AS cosine
      |  FROM normed c CROSS JOIN normed p
      |  WHERE p.vec_id % 20 = 0 AND c.vec_id % 20 <> 0)""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "sim_hybrid_rrf" ->
      """WITH d2 AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |docs AS (SELECT doc_id, len(ts) AS dl, ts FROM d2),
        |tf AS (SELECT doc_id, dl, term, count(*) AS tf
        |       FROM (SELECT doc_id, dl, unnest(ts) AS term FROM docs)
        |       WHERE term IN ('table', 'join') GROUP BY 1, 2, 3),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM docs),
        |contrib AS (
        |  SELECT tf.doc_id, tf.term,
        |    ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
        |      / (CAST(df AS DOUBLE) + 0.5))
        |    * ((CAST(tf AS DOUBLE) * 2.2)
        |       / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
        |          * (CAST(dl AS DOUBLE)
        |             / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS w
        |  FROM tf JOIN dft USING (term) CROSS JOIN st),
        |lexscored AS (
        |  SELECT doc_id,
        |    list_reduce(list(w ORDER BY term ASC), (acc, x) -> acc + x) AS score
        |  FROM contrib GROUP BY doc_id),
        |lextop AS (SELECT doc_id, score FROM lexscored
        |  ORDER BY score DESC, doc_id ASC LIMIT 50),
        |lexr AS (SELECT doc_id AS id, CAST(row_number() OVER
        |    (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS r_lex FROM lextop),
        |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |normed AS (SELECT vec_id, v,
        |    sqrt(list_reduce(list_transform(list_zip(v, v), z -> z[1] * z[2]),
        |      (acc, x) -> acc + x)) AS norm FROM emb),
        |probe AS (SELECT v AS p, norm AS pnorm FROM normed WHERE vec_id = 0),
        |dscored AS (
        |  SELECT vec_id,
        |    list_reduce(list_transform(list_zip(v, p), z -> z[1] * z[2]),
        |      (acc, x) -> acc + x) / (norm * pnorm) AS cosine
        |  FROM normed CROSS JOIN probe WHERE vec_id <> 0),
        |dtop AS (SELECT vec_id, cosine FROM dscored
        |  ORDER BY cosine DESC, vec_id ASC LIMIT 50),
        |dr AS (SELECT vec_id AS id, CAST(row_number() OVER
        |    (ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS r_dense FROM dtop)
        |SELECT COALESCE(l.id, d.id) AS doc_id, r_lex, r_dense,
        |  COALESCE(1.0 / CAST(60 + r_lex AS DOUBLE), 0.0)
        |  + COALESCE(1.0 / CAST(60 + r_dense AS DOUBLE), 0.0) AS rrf
        |FROM lexr l FULL OUTER JOIN dr d ON l.id = d.id
        |ORDER BY rrf DESC, doc_id ASC LIMIT 20""".stripMargin,

    "eval_retrieval" -> (pairsCte +
      """,
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY probe_id
        |    ORDER BY cosine DESC, vec_id ASC) AS rank FROM pairs),
        |per AS (SELECT probe_id,
        |    min(CASE WHEN label = probe_label THEN rank END) AS first_rel,
        |    CAST(sum(CASE WHEN label = probe_label THEN 1 ELSE 0 END)
        |      AS BIGINT) AS rel_in_10
        |  FROM ranked WHERE rank <= 10 GROUP BY probe_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_probes,
        |  CAST(sum(CASE WHEN first_rel IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hit,
        |  CAST(sum(CASE WHEN first_rel IS NOT NULL
        |    THEN CAST(2520.0 / first_rel AS BIGINT) ELSE 0 END)
        |    AS BIGINT) AS rr_scaled,
        |  CAST(sum(rel_in_10) AS BIGINT) AS n_rel_top10,
        |  CAST(sum(CASE WHEN first_rel IS NOT NULL
        |    THEN CAST(2520.0 / first_rel AS BIGINT) ELSE 0 END) AS BIGINT)
        |    / (2520.0 * count(*)) AS mrr,
        |  CAST(sum(rel_in_10) AS BIGINT) / (10.0 * count(*))
        |    AS precision_at_10
        |FROM per""".stripMargin),

    "eval_knn_accuracy" -> (pairsCte +
      """,
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY probe_id
        |    ORDER BY cosine DESC, vec_id ASC) AS rank FROM pairs),
        |votes AS (SELECT probe_id, probe_label, label,
        |    CAST(count(*) AS BIGINT) AS votes
        |  FROM ranked WHERE rank <= 5 GROUP BY probe_id, probe_label, label),
        |pred AS (SELECT *, row_number() OVER (PARTITION BY probe_id
        |    ORDER BY votes DESC, label ASC) AS vr FROM votes)
        |SELECT probe_id, probe_label AS true_label, label AS pred_label,
        |  votes, CAST(CASE WHEN label = probe_label THEN 1 ELSE 0 END
        |    AS INTEGER) AS correct
        |FROM pred WHERE vr = 1 ORDER BY probe_id""".stripMargin),

    "mine_hard_negatives" -> (pairsCte +
      """,
        |pos AS (SELECT probe_id, vec_id AS pos_id, cosine AS pos_cosine FROM
        |  (SELECT *, row_number() OVER (PARTITION BY probe_id
        |     ORDER BY cosine DESC, vec_id ASC) AS r
        |   FROM pairs WHERE label = probe_label) WHERE r = 1),
        |neg AS (SELECT probe_id, vec_id AS neg_id, cosine AS neg_cosine,
        |    r AS neg_rank FROM
        |  (SELECT *, row_number() OVER (PARTITION BY probe_id
        |     ORDER BY cosine DESC, vec_id ASC) AS r
        |   FROM pairs WHERE label <> probe_label) WHERE r <= 3)
        |SELECT p.probe_id AS anchor_id, pos_id, pos_cosine, neg_id,
        |  neg_cosine, neg_rank
        |FROM pos p JOIN neg n ON p.probe_id = n.probe_id
        |ORDER BY anchor_id, neg_rank""".stripMargin),

    // gains and ideal-DCG prefix sums are the SAME double literals the
    // Spark expression carries (rendered from one table — cannot drift);
    // DCG is a rank-ordered list_reduce fold ≡ Spark's aggregate fold
    "eval_ndcg" -> (pairsCte +
      s""",
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY probe_id
        |    ORDER BY cosine DESC, vec_id ASC) AS rank FROM pairs),
        |rel AS (SELECT probe_id, rank, $gainCaseSql AS gain
        |  FROM ranked WHERE rank <= 10 AND label = probe_label),
        |dcgt AS (SELECT probe_id,
        |    list_reduce(list(gain ORDER BY rank ASC), (acc, x) -> acc + x)
        |      AS dcg
        |  FROM rel GROUP BY probe_id),
        |nrel AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS n_rel
        |  FROM pairs WHERE label = probe_label GROUP BY probe_id),
        |probes AS (SELECT DISTINCT probe_id FROM pairs),
        |j AS (SELECT p.probe_id, COALESCE(n.n_rel, 0) AS n_rel,
        |    COALESCE(d.dcg, 0.0) AS dcg
        |  FROM probes p LEFT JOIN nrel n ON p.probe_id = n.probe_id
        |  LEFT JOIN dcgt d ON p.probe_id = d.probe_id)
        |SELECT probe_id, n_rel, dcg,
        |  CASE WHEN ${idcgCaseSql("n_rel")} > 0.0
        |    THEN dcg / ${idcgCaseSql("n_rel")} ELSE 0.0 END AS ndcg
        |FROM j ORDER BY probe_id""".stripMargin)
  )
}
