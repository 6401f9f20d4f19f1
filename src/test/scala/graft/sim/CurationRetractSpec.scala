package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The release-retraction contract (round 12, [[Curation.retract]] — the
  * takedown path): after retracting a published doc,
  *
  *  - a NEW shard doc identical to it (byte-exact, vector-exact, or
  *    span-sharing) is KEPT — the release no longer publishes the
  *    retracted content, so nothing is being duplicated;
  *  - non-retracted docs keep their influence (controls drop exactly as
  *    before);
  *  - the manifest reports the tombstone count;
  *  - [[Curation.compactRelease]] makes the retraction PHYSICAL (the
  *    rows leave every index version) and clears the tombstones — and
  *    the retracted docs STAY retracted afterwards.
  *
  * Exercised per stage: exact (digest tombstone), substring (negative
  * gram rows), minhash (band-row tombstone), semantic (assigned-row
  * tombstone).
  */
class CurationRetractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def doc(id: Long, seed: String, n: Int = 30): (Long, String, String) =
    (id, "src", (1 to n).map(i => s"$seed$i").mkString(" "))

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("retract: tombstoned docs stop influencing every stage's verdicts; " +
      "compaction makes it physical and clears the tombstones") {
    import spark.implicits._
    val e0 = graft.core.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").localCheckpoint()
    def vecAs(newId: Long, srcId: Long): DataFrame =
      e0.filter(col("vec_id") === srcId)
        .select(lit(newId).as("vec_id"), col("embedding"))

    val release = Seq(doc(1, "a"), doc(2, "b"), doc(3, "c"))
      .toDF("doc_id", "source", "text").localCheckpoint()
    val relText = release.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    def prefixPlus(src: Long, k: Int, seed: String): String =
      (relText(src).split(" ").take(k) ++
        (1 to (30 - k)).map(i => s"$seed$i")).mkString(" ")

    val dir = java.nio.file.Files
      .createTempDirectory("graft_retract").toString
    val embRel = e0.filter(col("vec_id").isin(1, 2, 3))
    Curation.writeIndexes(release, Some(embRel), dir)

    // ---- shard A: pre-retraction controls — every stage drops its plant
    val shardA = Seq(
        (100L, "src", relText(1)),          // exact copy of doc1 → drops
        doc(101, "fa"),                     // fresh text, doc1's VECTOR → semantic drop
        doc(102, "fb"),                     // fully novel → kept
        (103L, "src", prefixPlus(3, 15, "na"))) // 15/30 of doc3 → substring drop
      .toDF("doc_id", "source", "text").localCheckpoint()
    val embA = vecAs(101, 1).union(vecAs(102, 50)).union(embRel)
    val resA = Curation.ingestShard(shardA, Some(embA), dir)
    assert(ids(resA.kept) === Set(102L),
      "pre-retraction: exact/semantic/substring plants must all drop")

    // ---- retract doc1 (exact/minhash/semantic probes) + doc3 (substring)
    Curation.retract(release.filter(col("doc_id").isin(1, 3)), None, dir)
    val mf1 = Curation.manifest(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mf1("tombstones") === 2L, s"manifest must report tombstones: $mf1")
    // idempotency: replaying the retraction must not double-subtract
    Curation.retract(release.filter(col("doc_id").isin(1, 3)), None, dir)
    assert(Curation.manifest(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap.apply("tombstones")
      === 2L, "replayed retraction must be a no-op")

    // ---- shard B: identical content is now KEPT; controls still drop
    val shardB = Seq(
        (200L, "src", relText(1)),          // copy of retracted doc1 → KEPT
        doc(201, "fc"),                     // fresh text, doc1's vector → KEPT
        (202L, "src", relText(2)),          // copy of live doc2 → drops
        (205L, "src", prefixPlus(3, 10, "nb")), // 10/30 of retracted doc3 → KEPT
        doc(206, "fd"))                     // fresh text, doc2's vector → drops
      .toDF("doc_id", "source", "text").localCheckpoint()
    val embB = vecAs(201, 1).union(vecAs(206, 2)).union(embRel)
    val resB = Curation.ingestShard(shardB, Some(embB), dir)
    assert(ids(resB.kept) === Set(200L, 201L, 205L),
      "post-retraction: doc1/doc3 content keeps, doc2 content still drops")

    // ---- compaction: retraction becomes physical, tombstones clear
    def pub(path: String): String =
      graft.core.Versioned.resolveRoot(spark, path)
    assert(spark.read.parquet(pub(s"$dir/exact"))
      .filter(col("doc_id").isin(1, 3)).count() === 2L,
      "before compaction the tombstoned digests are still physical")
    Curation.compactRelease(spark, dir)
    assert(spark.read.parquet(pub(s"$dir/exact"))
      .filter(col("doc_id").isin(1, 3)).count() === 0L,
      "compaction must drop the tombstoned digests")
    assert(spark.read.parquet(s"${pub(s"$dir/minhash")}/bands")
      .filter(col("id").isin(1, 3)).count() === 0L,
      "compaction must drop the tombstoned band rows")
    assert(spark.read.parquet(s"${pub(s"$dir/minhash")}/toks")
      .filter(col("id").isin(1, 3)).count() === 0L,
      "compaction must drop the tombstoned verify payloads too")
    assert(spark.read
      .parquet(s"${SemDedup.resolveRoot(spark, s"$dir/semantic")}/assigned")
      .filter(col("vec_id").isin(1, 3)).count() === 0L,
      "compaction must drop the tombstoned vectors")
    assert(spark.read.parquet(pub(s"$dir/substring"))
      .filter(col("nd") <= 0).count() === 0L,
      "compaction must merge away fully-retracted grams")
    val mf2 = Curation.manifest(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!mf2.contains("tombstones"),
      s"compaction must clear the tombstone set: $mf2")

    // ---- shard D: retraction persists after compaction — doc3's full
    // text returns under a fresh id and is KEPT (it shares only b205's
    // folded 10-token prefix, under budget); doc2's copy still drops
    val shardD = Seq(
        (401L, "src", relText(3)),
        (402L, "src", relText(2)))
      .toDF("doc_id", "source", "text").localCheckpoint()
    val embD = vecAs(401, 51).union(embRel)
    val resD = Curation.ingestShard(shardD, Some(embD), dir)
    assert(ids(resD.kept) === Set(401L),
      "after compaction the retracted doc3's content is still ingestible; " +
        "the live doc2's copy still drops")
  }
}
