package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.DecontIndex

/** The benchmark-decontamination gate inside the curation loop
  * ([[Curation.Decont]] / `curate(decont)` / `ingestShard(decont)`):
  * the gate composes as a pure pre-filter (gated curation ≡
  * prefilter-then-curate — per-doc membership commutes with every dedup
  * stage), the ledger leads with a correct decont row, the ingest loop
  * drops flagged shard docs before any index sees them, and a benchmark
  * RETRACTION (rotating an eval out of the battery) is visible to the
  * very next ingest against the same release. */
class DecontCurationSpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private def btok(b: Int, p: Int) = s"qz${b}x$p"

  /** Benchmark doc b: 12 distinctive tokens. */
  private def benchDoc(b: Long): (Long, String) =
    (b, (0 until 12).map(p => btok(b.toInt, p)).mkString(" "))

  /** Doc carrying one exactly copied 5-token window of benchmark b. */
  private def contaminated(id: Long, b: Int): (Long, String, String) =
    (id, "plant", s"u${id}a u${id}b " +
      (3 to 7).map(p => btok(b, p)).mkString(" ") + s" u${id}c u${id}d")

  private def clean(id: Long): (Long, String, String) =
    (id, "plant", (0 until 9).map(j => s"v${id}x$j").mkString(" "))

  private lazy val bdir: String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_decont_gate").toString
    DecontIndex.writeIndex((0L to 2L).map(benchDoc).toDF("doc_id", "text"),
      d)
    d
  }

  private lazy val base = graft.core.Tables.documents(spark, sfDir)
    .select("doc_id", "source", "text").localCheckpoint()

  test("batch: curate with the decont gate ≡ prefilter-then-curate, " +
      "ledger led by a correct decont row") {
    val docs = base.unionByName(
      Seq(contaminated(900001L, 0), contaminated(900002L, 1),
        clean(900003L)).toDF("doc_id", "source", "text"))
      .localCheckpoint()
    val flagged = DecontIndex.probeShardBloom(docs, bdir).select("doc_id")
    assert(ids(flagged) === Set(900001L, 900002L),
      "exactly the planted copies flag against the benchmark index")
    val gated = Curation.curate(docs, None,
      decont = Some(Curation.Decont(bdir)))
    val plain = Curation.curate(
      docs.join(flagged, Seq("doc_id"), "left_anti").localCheckpoint(),
      None)
    assert(ids(gated.kept) === ids(plain.kept))
    assert(ids(gated.kept).contains(900003L))
    val row = gated.ledger.collect()(0)
    assert(row.getString(1) === "decont")
    assert(row.getLong(3) === 2L)
  }

  test("ingest: decont-gated shard ≡ the pre-filtered shard on a twin " +
      "release, the flagged doc reaches NO index, and a benchmark " +
      "retraction frees the next shard") {
    val release = Curation.curate(base, None).kept.localCheckpoint()
    def freshRelease(): String = {
      val d = java.nio.file.Files
        .createTempDirectory("graft_decont_rel").toString
      Curation.writeIndexes(release, None, d)
      d
    }
    val dir1 = freshRelease(); val dir2 = freshRelease()
    val shard = Seq(contaminated(900011L, 2), clean(900012L))
      .toDF("doc_id", "source", "text").localCheckpoint()

    val r1 = Curation.ingestShard(shard, None, dir1,
      decont = Some(Curation.Decont(bdir)))
    val pre = shard.join(
      DecontIndex.probeShardBloom(shard, bdir).select("doc_id"),
      Seq("doc_id"), "left_anti").localCheckpoint()
    val r2 = Curation.ingestShard(pre, None, dir2)
    assert(ids(r1.kept) === ids(r2.kept))
    assert(ids(r1.kept) === Set(900012L))
    val led = r1.ledger.collect()
    assert(led(0).getString(1) === "decont" && led(0).getLong(3) === 1L)
    // the flagged doc influenced no release index: its digest is absent
    assert(spark.read.parquet(
        graft.core.Versioned.resolveRoot(spark, s"$dir1/exact"))
      .filter(col("doc_id") === 900011L).isEmpty)

    // rotate benchmark 2 OUT of the battery on a COPY of the index (bdir
    // is shared by the other test) — an identical later doc is now kept
    val bdir2 = java.nio.file.Files
      .createTempDirectory("graft_decont_gate2").toString
    DecontIndex.writeIndex((0L to 2L).map(benchDoc).toDF("doc_id", "text"),
      bdir2)
    DecontIndex.retract(spark, bdir2, Seq(2L))
    val shard2 = Seq(contaminated(900021L, 2))
      .toDF("doc_id", "source", "text").localCheckpoint()
    val r3 = Curation.ingestShard(shard2, None, dir1,
      decont = Some(Curation.Decont(bdir2)))
    assert(ids(r3.kept) === Set(900021L))
  }
}
