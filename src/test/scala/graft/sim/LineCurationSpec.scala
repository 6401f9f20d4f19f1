package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.LineIndex

/** The boilerplate-line stage inside the curation loop
  * ([[Curation.LineClean]] / `curate(lineClean)` /
  * `ingestShard(lineClean)`): the only TEXT-TRANSFORM stage, and it must
  * run BEFORE dedup — two docs identical up to nav chrome become exact
  * duplicates only once the chrome is gone. Pins: gated curation ≡
  * clean-then-curate (ids AND released text), the ledger's line_clean
  * row, fully-boilerplate docs dropping on the ledger, the ingest twin,
  * and the release holding CLEANED digests so a chrome-differing copy in
  * a LATER shard deduplicates against it. */
class LineCurationSpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet
  private def texts(df: DataFrame): Map[Long, String] =
    df.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  /** External line index: "nav bar" and "footer co" reach df=4. */
  private lazy val ldir: String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_line_gate").toString
    LineIndex.writeIndex((0L until 4L).map(i =>
        (i, s"nav bar\nuniq a$i\nfooter co\nuniq b$i"))
      .toDF("doc_id", "text"), d)
    d
  }

  private lazy val base = graft.core.Tables.documents(spark, sfDir)
    .select("doc_id", "source", "text").localCheckpoint()

  /** The manual composition twin: clean, drop emptied docs, rewrite. */
  private def preClean(docs: DataFrame): DataFrame = {
    val cleaned = LineIndex.probeShard(docs, ldir, 3)
      .filter(col("n_kept") > 0)
    docs.drop("text")
      .join(cleaned.select(col("doc_id"), col("cleaned").as("text")),
        Seq("doc_id"))
      .localCheckpoint()
  }

  test("batch: curate(lineClean) ≡ clean-then-curate in ids AND released " +
      "text; chrome-differing twins collapse; emptied docs on the ledger") {
    val docs = base.unionByName(Seq(
        (900021L, "plant", "alpha text one\nnav bar\nbeta text two"),
        (900022L, "plant", "alpha text one\nfooter co\nbeta text two"),
        (900023L, "plant", "nav bar\nfooter co"))
      .toDF("doc_id", "source", "text"))
      .localCheckpoint()
    val gated = Curation.curate(docs, None,
      lineClean = Some(Curation.LineClean(ldir)))
    val plain = Curation.curate(preClean(docs), None)
    assert(ids(gated.kept) === ids(plain.kept))
    assert(texts(gated.kept) === texts(plain.kept))
    // the chrome-differing pair became exact dups: min id wins
    assert(texts(gated.kept).get(900021L)
      === Some("alpha text one beta text two"))
    assert(!ids(gated.kept).contains(900022L))
    // without the stage, both chrome variants leak into the release
    val ungated = Curation.curate(docs, None)
    assert(ids(ungated.kept).contains(900021L)
      && ids(ungated.kept).contains(900022L))
    // ledger: line_clean leads (no quality/decont), dropping exactly the
    // fully-boilerplate doc
    val row = gated.ledger.collect()(0)
    assert(row.getString(1) === "line_clean")
    assert(row.getLong(3) === 1L)
    assert(!ids(gated.kept).contains(900023L))
  }

  test("ingest: lineClean-gated shard ≡ pre-cleaned shard on a twin " +
      "release, and the release holds CLEANED digests — a later shard's " +
      "chrome-differing copy deduplicates against it") {
    val release = Curation.curate(base, None).kept.localCheckpoint()
    def freshRelease(): String = {
      val d = java.nio.file.Files
        .createTempDirectory("graft_line_rel").toString
      Curation.writeIndexes(release, None, d)
      d
    }
    val dir1 = freshRelease(); val dir2 = freshRelease()
    val shard = Seq(
        (900031L, "plant", "gamma text one\nnav bar\ndelta text two"),
        (900032L, "plant", "gamma text one\nfooter co\ndelta text two"),
        (900033L, "plant", "epsilon wholly unique text"))
      .toDF("doc_id", "source", "text").localCheckpoint()

    val r1 = Curation.ingestShard(shard, None, dir1,
      lineClean = Some(Curation.LineClean(ldir)))
    val r2 = Curation.ingestShard(preClean(shard), None, dir2)
    assert(ids(r1.kept) === ids(r2.kept))
    assert(texts(r1.kept) === texts(r2.kept))
    // within-shard: the chrome twins collapsed to the min id, cleaned
    assert(texts(r1.kept).get(900031L)
      === Some("gamma text one delta text two"))
    assert(!ids(r1.kept).contains(900032L))
    assert(ids(r1.kept).contains(900033L))

    // later shard: SAME content under fresh chrome — the release's
    // cleaned digest catches it as an exact duplicate
    val shard2 = Seq(
        (900041L, "plant", "gamma text one\nfooter co\ndelta text two"))
      .toDF("doc_id", "source", "text").localCheckpoint()
    val r3 = Curation.ingestShard(shard2, None, dir1,
      lineClean = Some(Curation.LineClean(ldir)))
    assert(ids(r3.kept).isEmpty,
      "a chrome-differing copy of released content must not re-enter")
    val exact = r3.ledger.collect().find(_.getString(1) == "exact").get
    assert(exact.getLong(3) === 1L)
  }
}
