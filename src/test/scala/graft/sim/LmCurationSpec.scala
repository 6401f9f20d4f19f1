package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.LmScore

/** The LM quality gate inside the curation loop ([[Curation.Quality]] /
  * `writeIndexes(lmQuality)` / `ingestShard(lmMinScore)`): stage-0
  * composition equals prefilter-then-curate, no-evidence docs pass,
  * rejected junk influences no index, survivors fold into the release LM,
  * and retraction subtracts LM mass exactly (negated count rows) with
  * compaction making the subtraction physical. */
class LmCurationSpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val Thr = 0.001

  private lazy val base = graft.core.Tables.documents(spark, sfDir)
    .select("doc_id", "source", "text").localCheckpoint()

  /** Junk doc: tokens unique to it → every transition unseen, backoff
    * mass ≈ 0.4/N ≪ Thr (or exactly 0 against a frozen LM that never saw
    * them). */
  private def junk(id: Long): (Long, String, String) =
    (id, "plant", (0 until 12).map(j => s"zq${id}x$j").mkString(" "))

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("batch stage-0 composition: curate with the quality gate ≡ " +
      "prefilter-then-curate, with the ledger led by a correct quality row") {
    val docs = base.unionByName(
      Seq(junk(900001L), junk(900002L)).toDF("doc_id", "source", "text"))
      .localCheckpoint()
    val lm = LmScore.lmFrom(docs)
    val gated = Curation.curate(docs, None,
      quality = Some(Curation.Quality(lm, Thr)))
    // the reference composition: drop low scorers FIRST, then plain curate
    val scored = LmScore.score(docs, lm)
      .filter(col("lm_score") < Thr).select("doc_id")
    val pre = docs.join(scored, Seq("doc_id"), "left_anti").localCheckpoint()
    assert(ids(scored) === Set(900001L, 900002L),
      "exactly the planted junk falls below the threshold")
    val plain = Curation.curate(pre, None)
    assert(ids(gated.kept) === ids(plain.kept))
    val ledger = gated.ledger.collect()
    assert(ledger(0).getString(1) === "quality")
    assert(ledger(0).getLong(2) === docs.count())
    assert(ledger(0).getLong(3) === 2L, "two junk docs dropped at stage 0")
    // the downstream rows equal the plain run's, stage ids shifted by one
    val tail = ledger.drop(1).map(r =>
      (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val plainRows = plain.ledger.collect().map(r =>
      (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(tail === plainRows)
  }

  test("no-evidence docs (< 2 tokens) PASS the quality gate — the " +
      "semantic stage's vectorless-doc convention") {
    val docs = Seq((1L, "src", "solo"), (2L, "src", "alpha beta alpha beta"))
      .toDF("doc_id", "source", "text").localCheckpoint()
    val lm = LmScore.lmFrom(docs)
    val r = Curation.curate(docs, None,
      quality = Some(Curation.Quality(lm, 10.0))) // impossibly high bar
    // doc 2 has transitions and cannot reach 10.0 → drops; doc 1 has no
    // evidence → passes
    assert(ids(r.kept) === Set(1L))
  }

  test("ingest with the release LM: junk drops at stage 0 and touches " +
      "NO index; survivors fold into the LM; gated ingest ≡ " +
      "prefilter-then-ingest on a twin") {
    val release = base.filter(col("doc_id") < 400).localCheckpoint()
    val dirA = java.nio.file.Files
      .createTempDirectory("graft_lmcur_a").toString
    val dirB = java.nio.file.Files
      .createTempDirectory("graft_lmcur_b").toString
    Curation.writeIndexes(release, None, dirA, lmQuality = true)
    Curation.writeIndexes(release, None, dirB)

    // the kept plant: the release's 8 most common tokens in a fresh
    // arrangement — novel text (no exact/near-dup/substring hit, and no
    // repeated shingles, which the substring stage would rightly flag)
    // whose quality mass rides those tokens' high counts (known bigrams
    // or high-cu backoff, either clears Thr; precondition-asserted)
    val topToks = release.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().orderBy(desc("count"), asc("w"))
      .limit(8).collect().map(_.getString(0)).toSeq
    val keptText = topToks.mkString(" ")
    val copyText = release.orderBy("doc_id").select("text")
      .head().getString(0)
    val lmPre = LmScore.readLm(spark, s"$dirA/lm")
    val preScore = LmScore.score(
        Seq((0L, keptText)).toDF("doc_id", "text"), lmPre)
      .head().getAs[Double]("lm_score")
    assert(preScore >= Thr, s"precondition: kept plant scores $preScore")

    val shard = Seq(
      (900001L, "plant", junk(900001L)._3), // quality drop
      (900002L, "plant", copyText),         // exact drop
      (900003L, "plant", keptText))         // kept
      .toDF("doc_id", "source", "text")
    val r = Curation.ingestShard(shard, None, dirA, lmMinScore = Some(Thr))
    assert(ids(r.kept) === Set(900003L))
    val ledger = r.ledger.collect()
    assert(ledger(0).getString(1) === "quality")
    assert(ledger(0).getLong(3) === 1L, "junk drops at stage 0")
    assert(ledger(1).getString(1) === "exact")
    assert(ledger(1).getLong(3) === 1L, "the copy drops at exact")

    // junk influenced NOTHING: its digest is absent from the exact index
    val junkDigest = Seq(junk(900001L)._3).toDF("text")
      .select(xxhash64(col("text"))).head().getLong(0)
    val exactIdx = spark.read.parquet(
      graft.core.Versioned.resolveRoot(spark, s"$dirA/exact"))
    assert(exactIdx.filter(col("th") === junkDigest).isEmpty)

    // the survivor's counts folded in: the top token's unigram count
    // grew by EXACTLY its one occurrence in the kept plant (the junk and
    // the copy contributed nothing)
    val cu = (lm: LmScore.Lm) => lm.uni
      .filter(col("w") === topToks.head)
      .select("cu").head().getLong(0)
    assert(cu(LmScore.readLm(spark, s"$dirA/lm")) === cu(lmPre) + 1L)

    // twin equivalence: prefilter by the SAME frozen LM, ingest plain
    val pre2 = shard.join(
      LmScore.score(shard, lmPre).filter(col("lm_score") < Thr)
        .select("doc_id"), Seq("doc_id"), "left_anti")
    val rB = Curation.ingestShard(pre2, None, dirB)
    assert(ids(r.kept) === ids(rB.kept))
  }

  test("retraction subtracts LM mass EXACTLY (negated counts): a doc's " +
      "bigrams vanish from future quality verdicts, and compaction " +
      "drops the zeroed rows physically") {
    val x = (350L, "src",
      "xr1 xr2 fa fb fc fd xr1 xr2 ga gb gc gd")
    val release = base.filter(col("doc_id") < 300)
      .unionByName(Seq(x).toDF("doc_id", "source", "text"))
      .localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lmcur_r").toString
    Curation.writeIndexes(release, None, dir, lmQuality = true)
    val probe = Seq((0L, "xr1 xr2")).toDF("doc_id", "text")
    def score(): Double =
      LmScore.score(probe, LmScore.readLm(spark, s"$dir/lm"))
        .head().getAs[Double]("lm_score")
    assert(score() === 1.0,
      "pre-retract: (xr1, xr2) appears twice, always as the whole of " +
        "xr1's contexts → known mass 2/2")
    Curation.retract(Seq(x).toDF("doc_id", "source", "text"), None, dir)
    assert(score() === 0.0,
      "post-retract: xr1/xr2 are OOV — the negated rows cancel exactly")
    val bigrams = s"${graft.core.Versioned.resolveRoot(spark, s"$dir/lm")}" +
      "/bigrams"
    assert(spark.read.parquet(bigrams)
      .groupBy("prev", "cur").agg(sum("n").as("n"))
      .filter(col("n") === 0L).count() > 0,
      "the zeroed rows exist logically before compaction")
    Curation.compactRelease(spark, dir)
    assert(score() === 0.0, "compaction is invisible to the score")
    val bigrams2 = s"${graft.core.Versioned.resolveRoot(spark, s"$dir/lm")}" +
      "/bigrams"
    val post = spark.read.parquet(bigrams2)
    assert(post.filter(col("n") === 0L).isEmpty &&
      post.filter(col("prev") === "xr1").isEmpty,
      "compaction made the subtraction physical")
  }
}
