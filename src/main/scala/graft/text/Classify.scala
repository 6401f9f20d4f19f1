package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seed-set text classification — the supervised curation primitive
  * behind "score every crawl doc against labeled domain/quality seed
  * corpora" (the role fastText linear filters play in CCNet/RefinedWeb
  * pipelines), re-expressed relationally as CENTROID (Rocchio)
  * classification (Han & Karypis 2000): a class's model is its token
  * count vector, and a document's affinity to class s is
  *
  *   score(d, s) = Σ_w tf(d, w) · c(w, s)  /  (len(d) · N_s)
  *
  * — the dot product of the doc's tf vector with the class centroid,
  * normalized by doc length and class mass. Predicted = argmax_s with a
  * deterministic tie-break (score desc, class name asc).
  *
  * Chosen over multiplicative Naive Bayes DELIBERATELY: NB needs per-word
  * log-probability sums, and a float sum's order is unspecified in SQL —
  * the repo's oracle-exactness discipline (the [[LmScore]] comment)
  * demands integer per-doc aggregates with ONE fixed IEEE tree at the
  * end. Here the numerator Σ tf·c is an exact BIGINT sum and the
  * denominator is one BIGINT product, so the score is a single
  * exactly-rounded division — bit-identical cross-engine. (At true 100 TB
  * the integer products stay ≤ 2⁵³ because tf and len are doc-bounded;
  * the class-mass factor is the one to watch — swap to per-class scaled
  * centroids if N_s outgrows 2⁵³/len.)
  *
  * Scale shape: one corpus-sized tf groupBy; the class-count table is
  * VOCABULARY × CLASSES bounded and broadcast back onto the tf rows (the
  * text_lm_score plan family — the corpus never shuffles for the model
  * join); the per-(doc, class) rollup keys on doc_id — no skew.
  * BOUNDED-VOCABULARY ASSUMPTION (the LmScore posture): the broadcast
  * holds while the vocabulary does — a web-scale open vocabulary
  * outgrows it, and the production hedge is the HASHED-FEATURE form
  * below ([[modelHashed]]), whose model is [[FeatureBuckets]] × classes
  * rows — a CONSTANT — at any vocabulary. The
  * frozen-model form ([[model]] + [[classifyWith]]) is the production
  * path: train once on the seed sets, broadcast the centroids, classify
  * every arriving shard map-side + one rollup; OOV words carry no class
  * evidence, so the centroid join is INNER and OOV tf rows drop before
  * the rollup — exactly the oracle's join shape.
  */
object Classify {

  /** Frozen classifier: per-(class, word) counts and per-class mass —
    * both class-and-vocabulary bounded, never corpus-sized. */
  final case class Model(classCounts: DataFrame, classMass: DataFrame)

  private def tokens: Column = split(col("text"), " ")

  private def tf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))

  private def docLen(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), size(tokens).cast("long").as("n"))

  /** Train on labeled docs (doc_id, text + `labelCol`): the centroids
    * are plain token counts per class. */
  def model(docs: DataFrame, labelCol: String = "source"): Model =
    modelFromTf(tf(docs), docs, labelCol)

  /** All (doc_id, src, score) affinities of `docs` under `m`. */
  def scores(docs: DataFrame, m: Model): DataFrame =
    tf(docs)
      .join(broadcast(m.classCounts), Seq("w")) // OOV rows drop here
      .groupBy("doc_id", "src")
      .agg(sum(col("tf") * col("cw")).cast("long").as("num"))
      .join(docLen(docs), "doc_id")
      .join(broadcast(m.classMass), "src")
      .select(col("doc_id"), col("src"),
        (col("num").cast("double") /
          (col("n") * col("ns")).cast("double")).as("score"))

  /** Winner per doc: (doc_id, predicted, score), ties broken by class
    * name — deterministic in both engines. */
  def classifyWith(docs: DataFrame, m: Model): DataFrame = {
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("score"), asc("src"))
    scores(docs, m)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("src").as("predicted"), col("score"))
  }

  /** [[model]] from an already-materialized tf table (so a self-training
    * caller shares ONE token fan-out between training and scoring). */
  private def modelFromTf(tfT: DataFrame, docs: DataFrame,
      labelCol: String): Model = {
    val cls = tfT
      .join(docs.select(col("doc_id"), col(labelCol).as("src")), "doc_id")
      .groupBy("src", "w").agg(sum("tf").cast("long").as("cw"))
    val mass = cls.groupBy("src").agg(sum("cw").cast("long").as("ns"))
    Model(cls, mass)
  }

  /** Self-trained corpus classification — the declared form: train on
    * the corpus's own `source` labels, classify every doc. ONE token
    * fan-out for the whole query (round 16, measured −39% at sf0.1 —
    * the [[classifyHashedCorpus]] discipline back-ported): the
    * checkpointed (doc_id, w, tf) table feeds training, scoring and the
    * length normalizer (Σ tf per doc ≡ size(tokens) — the same integer,
    * so the score's one exactly-rounded division is unchanged). */
  def classifyCorpus(docs: DataFrame): DataFrame = {
    val tfT = tf(docs).localCheckpoint()
    val m = modelFromTf(tfT, docs, "source")
    val len = tfT.groupBy("doc_id").agg(sum("tf").cast("long").as("n"))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("src"))
    tfT.join(broadcast(m.classCounts), Seq("w")) // OOV rows drop here
      .groupBy("doc_id", "src")
      .agg(sum(col("tf") * col("cw")).cast("long").as("num"))
      .join(len, "doc_id")
      .join(broadcast(m.classMass), "src")
      .select(col("doc_id"), col("src"),
        (col("num").cast("double") /
          (col("n") * col("ns")).cast("double")).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("src").as("predicted"), col("score"))
  }

  // --------------------------------------------------------------------
  // Hashed-feature form (round 14, VERDICT r13 #5) — the actual fastText
  // recipe (Joulin et al. 2016): features are unigrams AND adjacent
  // bigrams, hashed into a FIXED bucket space. Two things the unigram
  // centroid cannot give:
  //   1. the model is BUCKETS × CLASSES bounded (2²⁰ rows max) no matter
  //      how large the web-scale vocabulary grows — the broadcast bound
  //      is a constant, not a corpus property (the unigram form's hedge);
  //   2. word-order sensitivity — two classes with identical bags of
  //      words but different adjacencies separate on bigram evidence
  //      (ClassifySpec plants exactly that corpus).
  // Counts stay BIGINT and the score stays ONE exactly-rounded division,
  // so the hashed form is oracle-able — the hash is md5 nibble
  // arithmetic (the split_assign recipe), NOT xxhash64, because DuckDB
  // must mirror it byte-for-byte. Collisions are the documented fastText
  // trade: both engines collide identically, so exactness is unaffected.

  /** Fixed feature-bucket space: 16 bits (65,536 buckets). */
  val FeatureBuckets = 1 << 16

  /** SQL for the feature bucket of string expression `e` — first four
    * md5 hex nibbles as an int in [0, [[FeatureBuckets]]); valid in BOTH
    * Spark SQL and DuckDB (md5 / substr / instr agree). Since round 17
    * this renders the ORACLE side only — the Spark side computes the
    * same integer as `conv(substr(md5(e), 1, 4), 16, 10)` (one md5/
    * substring instead of four nibble chains; DuckDB has no conv()).
    * Equality is witnessed per-feature in OptProbe's classify
    * experiment: 0 mismatches over every sf0.1 feature — both parse the
    * SAME first 16 bits of the same md5 hex string. */
  private[text] def featureBucketSql(e: String): String = {
    val hx = "'0123456789abcdef'"
    def nib(i: Int) = s"(instr($hx, substr(md5($e), $i, 1)) - 1)"
    s"(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)})"
  }

  /** The Spark-side twin of [[featureBucketSql]]: one md5 + one substr
    * + one base-16 parse (round 17 — Spark's subexpression elimination
    * does NOT collapse the four md5 references, measured ~0.2 s of
    * text_classify_bigram at sf0.1). */
  private def featureBucket(e: Column): Column =
    conv(substring(md5(e), 1, 4), 16, 10).cast("long")

  /** (doc_id, fb) hashed feature rows: one per token (unigram) plus one
    * per adjacent pair (bigram) — the fastText feature set. The bigram
    * fan-out is the lambda-free slice+zip shape ([[LmScore.transitions]]
    * verbatim). */
  private def featureRows(docs: DataFrame): DataFrame = {
    val uni = docs.select(col("doc_id"), explode(tokens).as("feat"))
    val big = LmScore.transitions(docs)
      .select(col("doc_id"), concat_ws(" ", col("prev"), col("cur")).as("feat"))
    uni.unionByName(big)
      .select(col("doc_id"), featureBucket(col("feat")).as("fb"))
  }

  private def featureTf(docs: DataFrame): DataFrame =
    featureRows(docs).groupBy("doc_id", "fb")
      .agg(count(lit(1)).as("tf"))

  /** Per-doc total feature count (n tokens + n−1 bigrams) — the hashed
    * form's length normalizer. Derived from the TF TABLE (Σ tf ≡ the
    * occurrence count), so every consumer of one tf table shares one
    * feature fan-out and the two counts cannot drift. */
  private def featureLenFromTf(tf: DataFrame): DataFrame =
    tf.groupBy("doc_id").agg(sum("tf").cast("long").as("n"))

  private def modelHashedFromTf(tf: DataFrame, docs: DataFrame,
      labelCol: String): Model = {
    val cls = tf
      .join(docs.select(col("doc_id"), col(labelCol).as("src")), "doc_id")
      .groupBy("src", "fb").agg(sum("tf").cast("long").as("cw"))
    val mass = cls.groupBy("src").agg(sum("cw").cast("long").as("ns"))
    Model(cls, mass)
  }

  /** Train hashed-feature centroids: per-(class, bucket) BIGINT counts
    * and per-class mass — both ≤ [[FeatureBuckets]] × classes rows,
    * broadcast-safe at ANY vocabulary. */
  def modelHashed(docs: DataFrame, labelCol: String = "source"): Model =
    modelHashedFromTf(featureTf(docs), docs, labelCol)

  private def scoresHashedFromTf(tf: DataFrame, m: Model): DataFrame =
    tf.join(broadcast(m.classCounts), Seq("fb")) // unseen buckets drop here
      .groupBy("doc_id", "src")
      .agg(sum(col("tf") * col("cw")).cast("long").as("num"))
      .join(featureLenFromTf(tf), "doc_id")
      .join(broadcast(m.classMass), "src")
      .select(col("doc_id"), col("src"),
        (col("num").cast("double") /
          (col("n") * col("ns")).cast("double")).as("score"))

  /** All (doc_id, src, score) affinities under a hashed model — the
    * [[scores]] plan shape verbatim (broadcast model, doc-keyed rollup,
    * one exactly-rounded division). The feature fan-out (explode + md5
    * per feature — the corpus-sized map) runs ONCE: the compact
    * (doc_id, fb, tf) table is localCheckpointed and feeds both the
    * affinity rollup and the length normalizer. Local-scale
    * cost-neutral (measured parity at sf0.1 — the checkpoint sync
    * offsets the saved recompute on a small corpus); the call flips the
    * other way from sample_dsir's recompute-wins note because here the
    * materialized table is the GROUPED tf — smaller than the exploded
    * features it replaces — where dsir would have materialized a
    * larger-than-input transition fan-out. */
  def scoresHashed(docs: DataFrame, m: Model): DataFrame =
    scoresHashedFromTf(featureTf(docs).localCheckpoint(), m)

  /** Winner per doc under a hashed model, [[classifyWith]] tie-break. */
  def classifyHashedWith(docs: DataFrame, m: Model): DataFrame =
    hashedWinner(scoresHashed(docs, m))

  private def hashedWinner(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("score"), asc("src"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("src").as("predicted"), col("score"))
  }

  /** Self-trained hashed-feature classification — the declared form.
    * ONE feature fan-out for the whole query: the checkpointed tf table
    * feeds training, scoring, and the length normalizer. */
  def classifyHashedCorpus(docs: DataFrame): DataFrame = {
    val tf = featureTf(docs).localCheckpoint()
    hashedWinner(scoresHashedFromTf(tf,
      modelHashedFromTf(tf, docs, "source")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_classify" -> ((s, d) =>
      classifyCorpus(graft.core.Tables.documents(s, d)).orderBy("doc_id")),
    "text_classify_bigram" -> ((s, d) =>
      classifyHashedCorpus(graft.core.Tables.documents(s, d))
        .orderBy("doc_id"))
  )

  def oracleSql: Map[String, String] = Map(
    // identical construction: tf -> class centroids -> integer affinity
    // numerator -> one division -> deterministic argmax. All aggregates
    // are BIGINT sums; the only float op is the final division of two
    // exactly-representable integers.
    "text_classify" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM tok GROUP BY doc_id, w),
        |len AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM tok GROUP BY doc_id),
        |cls AS (SELECT d.source AS src, t.w, CAST(SUM(t.tf) AS BIGINT) AS cw
        |  FROM tf t JOIN documents d USING (doc_id) GROUP BY d.source, t.w),
        |ntot AS (SELECT src, CAST(SUM(cw) AS BIGINT) AS ns
        |  FROM cls GROUP BY src),
        |sc AS (SELECT t.doc_id, c.src, CAST(SUM(t.tf * c.cw) AS BIGINT) AS num
        |  FROM tf t JOIN cls c ON t.w = c.w GROUP BY t.doc_id, c.src),
        |r AS (SELECT sc.doc_id, sc.src,
        |    CAST(sc.num AS DOUBLE) / CAST(len.n * ntot.ns AS DOUBLE) AS score
        |  FROM sc JOIN len USING (doc_id) JOIN ntot USING (src)),
        |p AS (SELECT doc_id, src, score, ROW_NUMBER() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, src ASC) AS rn FROM r)
        |SELECT doc_id, src AS predicted, score FROM p WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    // hashed-feature twin: unigram + adjacent-bigram features through
    // the SAME md5 nibble bucket (the featureBucketSql helper is spliced
    // into both engines' SQL, so the hash cannot drift), then the
    // identical BIGINT-numerator / one-division / argmax chain
    "text_classify_bigram" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
        |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        |  FROM documents),
        |feat AS (
        |  SELECT doc_id, w AS feat FROM tok
        |  UNION ALL
        |  SELECT a.doc_id, a.w || ' ' || b.w AS feat
        |  FROM tok a JOIN tok b
        |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |fbt AS (SELECT doc_id,
        |    CAST(${featureBucketSql("feat")} AS BIGINT) AS fb FROM feat),
        |tf AS (SELECT doc_id, fb, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM fbt GROUP BY doc_id, fb),
        |len AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM fbt GROUP BY doc_id),
        |cls AS (SELECT d.source AS src, t.fb, CAST(SUM(t.tf) AS BIGINT) AS cw
        |  FROM tf t JOIN documents d USING (doc_id) GROUP BY d.source, t.fb),
        |ntot AS (SELECT src, CAST(SUM(cw) AS BIGINT) AS ns
        |  FROM cls GROUP BY src),
        |sc AS (SELECT t.doc_id, c.src, CAST(SUM(t.tf * c.cw) AS BIGINT) AS num
        |  FROM tf t JOIN cls c ON t.fb = c.fb GROUP BY t.doc_id, c.src),
        |r AS (SELECT sc.doc_id, sc.src,
        |    CAST(sc.num AS DOUBLE) / CAST(len.n * ntot.ns AS DOUBLE) AS score
        |  FROM sc JOIN len USING (doc_id) JOIN ntot USING (src)),
        |p AS (SELECT doc_id, src, score, ROW_NUMBER() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, src ASC) AS rn FROM r)
        |SELECT doc_id, src AS predicted, score FROM p WHERE rn = 1
        |ORDER BY doc_id""".stripMargin
  )
}
