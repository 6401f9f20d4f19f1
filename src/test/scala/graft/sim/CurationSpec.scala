package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.SubstringDedup

/** The end-to-end curation pipeline (round 10): composition equality with
  * applying the four stages sequentially, ledger arithmetic, and the pin of
  * the stage-ordering rationale (exact before substring). */
class CurationSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val offExact = 100000L
  private val offSubstr = 200000L
  private val offSem = 300000L
  private val offNear = 400000L

  /** Corpus with a planted drop for every stage:
    *  - exact: byte-identical copies of doc_id % 7 == 0 at +offExact;
    *  - substring: a new doc that is the verbatim 40% prefix of each
    *    doc_id % 11 == 5 (fully span-covered → dropped; the source keeps
    *    dup_frac ≈ 0.4 < 0.5 and survives);
    *  - near-dup: doc_id % 13 == 2 re-issued with one appended novel token
    *    (token-Jaccard n/(n+1) ≥ 0.8, same source/length bucket);
    *  - semantic: two brand-new docs with mutually-unique short texts
    *    (< shingle k, Jaccard 0.6) whose PLANTED vectors are scaled copies
    *    of each other (cosine 1) — they sail through stages 1–3 and
    *    exactly one survives stage 4. */
  private def fixture(): (DataFrame, DataFrame) = {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").localCheckpoint()
    val exactCopies = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + offExact).as("doc_id"), col("source"),
        col("text"))
    val prefixDocs = docs.filter(col("doc_id") % 11 === 5)
      .select((col("doc_id") + offSubstr).as("doc_id"), col("source"),
        concat_ws(" ", slice(split(col("text"), " "), lit(1),
          floor(size(split(col("text"), " ")) * 0.4).cast("int")))
          .as("text"))
      // the planted prefix needs >= k tokens to shingle at all, and the
      // SOURCE must be long enough that 40% stays under the 0.5 budget
      .filter(size(split(col("text"), " ")) >= SubstringDedup.declaredK + 2)
    val nearDups = docs.filter(col("doc_id") % 13 === 2)
      .select((col("doc_id") + offNear).as("doc_id"), col("source"),
        concat(col("text"), lit(" zzznovel")).as("text"))
    import spark.implicits._
    val semDocs = Seq(
      (offSem + 1, "sem_src", "alpha beta gamma one"),
      (offSem + 2, "sem_src", "delta epsilon zeta two"),
      // survives every stage and has NO vector — pins the semantic
      // stage's pass-through of docs it cannot judge
      (offSem + 9, "sem_src", "eta theta iota three"))
      .toDF("doc_id", "source", "text")
    val all = docs.union(exactCopies).union(prefixDocs).union(nearDups)
      .union(semDocs).localCheckpoint()

    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val semVecs = emb.filter(col("vec_id") === 17)
      .select(lit(offSem + 1).as("vec_id"), col("embedding"))
      .union(emb.filter(col("vec_id") === 17)
        .select(lit(offSem + 2).as("vec_id"),
          transform(col("embedding"), x => x * 0.5).as("embedding")))
    (all, emb.union(semVecs).localCheckpoint())
  }

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("curate equals applying the four stages sequentially") {
    val (docs, emb) = fixture()

    // sequential reference, stage by stage. Stage 1 is re-derived
    // DRIVER-SIDE from raw rows (independent of the engine's digest
    // grouping); stages 2-4 apply the public per-stage functions one at a
    // time — the composition (survivor chaining, ledger, payload fetch) is
    // what curate() adds and what this test isolates.
    val keep1 = docs.select("doc_id", "text").collect()
      .groupBy(_.getString(1)).values.map(_.map(_.getLong(0)).min).toSet
    val d1 = docs.filter(col("doc_id").isInCollection(keep1)).localCheckpoint()
    val keep2 = ids(SubstringDedup
      .dedupStats(d1, SubstringDedup.declaredK, 0.5).filter(col("keep")))
    val d2 = docs.filter(col("doc_id").isInCollection(keep2)).localCheckpoint()
    val drop3 = Dedup.clusters(Similarity.tokenJaccardPairsOf(d2),
        "doc_a", "doc_b")
      .filter(!col("keep")).select(col("member").as("doc_id"))
    val keep3 = keep2 -- ids(drop3)
    val d3vecs = emb
      .select(col("vec_id"), col("embedding").cast("array<double>")
        .as("embedding"))
      .filter(col("vec_id").isInCollection(keep3)).localCheckpoint()
    val keptVec = SemDedup.semDedupCorpus(d3vecs, 0.99, 16, iters = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val vecIds = d3vecs.select("vec_id").collect().map(_.getLong(0)).toSet
    val keep4 = keep3 -- (vecIds -- keptVec)

    val res = Curation.curate(docs, Some(emb),
      nearDupPairs = Similarity.tokenJaccardPairsOf(_))
    assert(ids(res.kept) === keep4,
      s"kept mismatch: missed=${keep4.diff(ids(res.kept)).size} " +
        s"extra=${ids(res.kept).diff(keep4).size}")

    // ledger rows mirror the sequential counts exactly
    val led = res.ledger.collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val n0 = docs.count()
    assert(led("exact") === ((n0, n0 - keep1.size, keep1.size.toLong)))
    assert(led("substring") ===
      ((keep1.size.toLong, (keep1.size - keep2.size).toLong, keep2.size.toLong)))
    assert(led("near_dup") ===
      ((keep2.size.toLong, (keep2.size - keep3.size).toLong, keep3.size.toLong)))
    assert(led("semantic") ===
      ((keep3.size.toLong, (keep3.size - keep4.size).toLong, keep4.size.toLong)))

    // fixture strength: every stage dropped at least one doc, and at least
    // one vectorless survivor proves the semantic stage passes through
    // docs it cannot judge
    assert(led.values.forall(_._2 > 0), s"every stage must drop: $led")
    assert(keep4.exists(id => !vecIds.contains(id)))

    // the kept DataFrame is the schema-preserving filter of the input
    assert(res.kept.schema === docs.schema)
  }

  test("stage order is semantic: substring-first would drop BOTH exact copies") {
    val (docs, _) = fixture()
    // restricted to one planted identical pair: running the substring
    // budget WITHOUT exact dedup first sees each copy 100% span-covered by
    // the other and drops both — the documented reason curate() runs the
    // exact stage first.
    val srcId = docs.filter(col("doc_id") % 7 === 0
        && size(split(col("text"), " ")) >= SubstringDedup.declaredK)
      .select(min("doc_id")).head().getLong(0)
    val pair = docs.filter(col("doc_id") === srcId
      || col("doc_id") === srcId + offExact)
    assert(pair.count() === 2)
    val verdict = SubstringDedup.dedupStats(pair, SubstringDedup.declaredK, 0.5)
    assert(verdict.filter(col("keep")).count() === 0,
      "both byte-identical copies fail the substring budget")
    // with the exact stage first, the curated corpus keeps exactly one
    val kept = Curation.curate(pair, None,
      nearDupPairs = Similarity.tokenJaccardPairsOf(_)).kept
    assert(ids(kept) === Set(srcId))
  }

  test("curation report row is consistent with the ledger") {
    val (docs, emb) = fixture()
    val rep = Curation.report(docs, Some(emb),
      nearDupPairs = Similarity.tokenJaccardPairsOf(_)).head()
    val n = docs.count()
    assert(rep.getAs[Long]("n_docs") === n)
    val dropped = rep.getAs[Long]("exact_dropped") +
      rep.getAs[Long]("substring_dropped") +
      rep.getAs[Long]("neardup_dropped") + rep.getAs[Long]("semantic_dropped")
    assert(rep.getAs[Long]("n_kept") === n - dropped)
    assert(rep.getAs[Double]("kept_frac") === (n - dropped).toDouble / n)
    assert(rep.getAs[Long]("semantic_dropped") > 0)
  }
}
