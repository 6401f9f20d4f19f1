package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.Classify

/** The seed-set class filter inside the curation loop
  * ([[Curation.ClassFilter]], stage 0d): composition equals
  * prefilter-then-curate with the ledger led by a correct class_filter
  * row in the 0a/0b/0c/0d order, no-evidence (all-OOV) docs pass, and
  * the ingest form drops off-domain docs before any index sees them.
  * The model is EXTERNAL — trained on labeled seed corpora, never
  * folded — the [[Curation.Decont]] posture. */
class ClassifyCurationSpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val base = graft.core.Tables.documents(spark, sfDir)
    .select("doc_id", "source", "text").localCheckpoint()

  // seed corpora: "good" = the real corpus's own vocabulary; "spam" = a
  // disjoint junk vocabulary. An off-domain doc is all-spam words.
  private lazy val seeds = {
    val good = base.limit(50)
      .select(col("doc_id"), lit("good").as("source"), col("text"))
    val spam = (0L until 50L).map(i =>
      (800000L + i, "spam",
        (0 until 15).map(j => s"buy${(i * 7 + j) % 40}now").mkString(" ")))
      .toDF("doc_id", "source", "text")
    good.unionByName(spam).localCheckpoint()
  }
  private lazy val model = Classify.model(seeds)

  private def spamDoc(id: Long): (Long, String, String) =
    (id, "plant", (0 until 12).map(j => s"buy${(id + j) % 40}now")
      .mkString(" "))

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("batch stage-0d composition: curate with the class filter ≡ " +
      "prefilter-then-curate, ledger led by the class_filter row") {
    val docs = base.unionByName(
      Seq(spamDoc(900001L), spamDoc(900002L)).toDF("doc_id", "source", "text"))
      .localCheckpoint()
    val cf = Curation.ClassFilter(model, Set("good"))
    val gated = Curation.curate(docs, None, classFilter = Some(cf))
    val drops = Classify.classifyWith(docs, model)
      .filter(col("predicted") =!= "good").select("doc_id")
    assert(ids(drops) === Set(900001L, 900002L),
      "exactly the planted spam classifies off-domain")
    val plain = Curation.curate(
      docs.join(drops, Seq("doc_id"), "left_anti").localCheckpoint(), None)
    assert(ids(gated.kept) === ids(plain.kept))
    val ledger = gated.ledger.collect()
    assert(ledger(0).getString(1) === "class_filter")
    assert(ledger(0).getLong(3) === 2L)
    val tail = ledger.drop(1).map(r =>
      (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val plainRows = plain.ledger.collect().map(r =>
      (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(tail === plainRows)
  }

  test("all-OOV docs carry no class evidence and PASS the filter") {
    val docs = Seq((1L, "src", "zzq1 zzq2 zzq3"),
        (2L, "src", spamDoc(2L)._3))
      .toDF("doc_id", "source", "text").localCheckpoint()
    val r = Curation.curate(docs, None,
      classFilter = Some(Curation.ClassFilter(model, Set("good"))))
    assert(ids(r.kept) === Set(1L),
      "no-evidence doc passes; classifiable spam drops")
  }

  test("ingest with the class filter: spam drops at 0d before any index " +
      "sees it; gated ingest ≡ prefilter-then-ingest on a twin") {
    val release = base.filter(col("doc_id") < 400).localCheckpoint()
    val dirA = java.nio.file.Files
      .createTempDirectory("graft_clscur_a").toString
    val dirB = java.nio.file.Files
      .createTempDirectory("graft_clscur_b").toString
    Curation.writeIndexes(release, None, dirA)
    Curation.writeIndexes(release, None, dirB)
    val shard = base.filter(col("doc_id") >= 400 && col("doc_id") < 430)
      .select((col("doc_id") + 600000L).as("doc_id"), col("source"),
        col("text"))
      .unionByName(Seq(spamDoc(900100L)).toDF("doc_id", "source", "text"))
      .localCheckpoint()
    val cf = Curation.ClassFilter(model, Set("good"))
    val gated = Curation.ingestShard(shard, None, dirA,
      classFilter = Some(cf))
    val pre = shard.join(classDropsOf(shard), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val plain = Curation.ingestShard(pre, None, dirB)
    assert(ids(gated.kept) === ids(plain.kept))
    assert(!ids(gated.kept).contains(900100L))
    // the spam doc influenced no index: both exact digests sets agree
    val ea = spark.read.parquet(
      s"${graft.core.Versioned.resolveRoot(spark, s"$dirA/exact")}")
    assert(ea.filter(col("doc_id") === 900100L).count() === 0L,
      "a 0d-dropped doc must never fold into the release")
    val ledger = gated.ledger.collect()
    assert(ledger(0).getString(1) === "class_filter")
    assert(ledger(0).getLong(3) === 1L)
  }

  private def classDropsOf(docs: DataFrame): DataFrame =
    Classify.classifyWith(docs, model)
      .filter(col("predicted") =!= "good").select("doc_id")
}
