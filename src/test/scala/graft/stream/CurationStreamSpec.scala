package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sim.Curation

/** B10.15 — the full curation ingest loop as a stream
  * ([[Streaming.streamCurationIngest]]): each micro-batch curated against
  * the persisted release index and folded in, via `ingestShard` verbatim.
  *
  * The spec drives two micro-batches through the stream against index copy
  * A while running the same two shards through sequential `ingestShard`
  * calls against index copy B, and asserts per-batch kept sets and ledgers
  * identical — plus the cross-batch property that makes the loop a LOOP:
  * batch 2 plants an exact copy, a near-dup, and a semantic cosine twin of
  * documents batch 1 folded in, and all three drop against the
  * stream-appended index. A third probe shard at the end pins end-state
  * equivalence of the two index copies.
  */
class CurationStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed ingest ≡ sequential ingestShard; batch-1 fold-ins drop " +
      "batch-2 copies across all modalities") {
    import spark.implicits._
    val all = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").localCheckpoint()
    val embBase = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    // novel direction for the planted vectors (CurationIngestSpec's
    // brute-force precondition covers reverse(17) being < 0.99 against
    // every real vector); 300002's vector folds in at batch 1 and its
    // scaled copy (cosine exactly 1) arrives at batch 2
    val novel = embBase.filter(col("vec_id") === 17L)
      .select(lit(300002L).as("vec_id"), reverse(col("embedding")).as("embedding"))
    val twin = embBase.filter(col("vec_id") === 17L)
      .select(lit(300012L).as("vec_id"),
        transform(reverse(col("embedding")), x => x * 0.5f).as("embedding"))
    val emb = embBase.union(novel).union(twin).localCheckpoint()

    val release = Curation
      .curate(all.filter(col("doc_id") < 250), Some(emb)).kept
      .localCheckpoint()
    val dirS = java.nio.file.Files
      .createTempDirectory("graft_stream_ingest").toString
    val dirT = java.nio.file.Files
      .createTempDirectory("graft_stream_ingest_twin").toString
    Curation.writeIndexes(release, Some(emb), dirS)
    Curation.writeIndexes(release, Some(emb), dirT)

    val relText0 = release.orderBy("doc_id").select("text").head.getString(0)
    val b1 = Seq(
      (300001L, "plant", relText0),                  // exact copy of release
      (300002L, "plant", "ba bb bc bd be bf bg bh"), // kept, carries the novel vector
      (300003L, "plant", "ca cb cc cd ce cf"))       // kept
    val b2 = Seq(
      (300010L, "plant", "ba bb bc bd be bf bg bh"), // exact copy of b1 fold-in
      (300011L, "plant", "ca cb cc cd ce cf cg"),    // near-dup (J=6/7) of b1 fold-in
      (300012L, "plant", "da db dc dd de df"),       // semantic twin of 300002's vector
      (300013L, "plant", "ea eb ec ed ee ef"))       // fresh → kept

    type Ledger = Seq[(String, Long, Long, Long)]
    def ledgerOf(df: org.apache.spark.sql.DataFrame): Ledger =
      df.collect().map(r =>
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val sunk = scala.collection.mutable.ArrayBuffer[(Long, Set[Long], Ledger)]()
    val stream = MemoryStream[(Long, String, String)](91, spark, None)
    val q = Streaming.streamCurationIngest(
        stream.toDF().toDF("doc_id", "source", "text"), Some(emb), dirS,
        (kept, ledger, id) => sunk += ((id,
          kept.select("doc_id").collect().map(_.getLong(0)).toSet,
          ledgerOf(ledger))))
      .start()
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    assert(sunk.size === 2, s"expected 2 non-empty micro-batches: $sunk")

    // sequential twin over the same shards against index copy B
    def shard(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "source", "text")
    val t1 = Curation.ingestShard(shard(b1), Some(emb), dirT)
    val k1 = t1.kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val l1 = ledgerOf(t1.ledger)
    val t2 = Curation.ingestShard(shard(b2), Some(emb), dirT)
    val k2 = t2.kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val l2 = ledgerOf(t2.ledger)
    assert(sunk(0)._2 === k1 && sunk(0)._3 === l1)
    assert(sunk(1)._2 === k2 && sunk(1)._3 === l2)

    // the planted cross-batch verdicts, by name
    assert(sunk(0)._2 === Set(300002L, 300003L))
    assert(!sunk(1)._2.contains(300010L), "exact copy of a batch-1 fold-in")
    assert(!sunk(1)._2.contains(300011L), "near-dup of a batch-1 fold-in")
    assert(!sunk(1)._2.contains(300012L),
      "cosine twin of a vector batch 1 appended to the semantic index")
    assert(sunk(1)._2.contains(300013L), "fresh doc survives")

    // end-state equivalence: a third shard probes identically against the
    // stream-built and sequentially-built indexes
    val b3 = Seq(
      (300020L, "plant", "ea eb ec ed ee ef"),  // copy of a batch-2 fold-in
      (300021L, "plant", "fa fb fc fd fe ff"))  // fresh
    val s3 = Curation.ingestShard(shard(b3), Some(emb), dirS)
      .kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val t3 = Curation.ingestShard(shard(b3), Some(emb), dirT)
      .kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s3 === t3)
    assert(s3 === Set(300021L))
  }

  test("streamed retraction ≡ one batch retract; a replayed takedown " +
      "batch is a no-op; the retracted content re-ingests identically") {
    import spark.implicits._
    def doc(id: Long, seed: String, n: Int = 30): (Long, String, String) =
      (id, "src", (1 to n).map(i => s"$seed$i").mkString(" "))
    val release = Seq(doc(1, "a"), doc(2, "b"), doc(3, "c"))
      .toDF("doc_id", "source", "text").localCheckpoint()
    val relText = release.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val dirS = java.nio.file.Files
      .createTempDirectory("graft_stream_retract").toString
    val dirT = java.nio.file.Files
      .createTempDirectory("graft_stream_retract_twin").toString
    Curation.writeIndexes(release, None, dirS)
    Curation.writeIndexes(release, None, dirT)

    // two takedown micro-batches against index S: doc1, then doc3 PLUS a
    // REPLAY of doc1 (foreachBatch is at-least-once; retraction must
    // absorb the replay instead of double-subtracting gram counts)
    val stream = MemoryStream[(Long, String, String)](92, spark, None)
    val q = Streaming.streamRetract(
      stream.toDF().toDF("doc_id", "source", "text"), dirS).start()
    stream.addData(Seq((1L, "src", relText(1))))
    q.processAllAvailable()
    stream.addData(Seq((3L, "src", relText(3)), (1L, "src", relText(1))))
    q.processAllAvailable()
    q.stop()

    // batch twin: ONE retract of both docs against index T
    Curation.retract(release.filter(col("doc_id").isin(1, 3)), None, dirT)

    def mf(dir: String) = Curation.manifest(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mf(dirS)("tombstones") === 2L,
      s"replayed takedown must not re-tombstone: ${mf(dirS)}")
    assert(mf(dirT)("tombstones") === 2L)

    // verdict equivalence: the same probe shard against the stream- and
    // batch-retracted indexes — retracted content keeps, live drops
    val shard = Seq(
        (100L, "src", relText(1)),  // copy of stream-retracted doc1 → KEPT
        (101L, "src", relText(2)))  // copy of live doc2 → drops
      .toDF("doc_id", "source", "text").localCheckpoint()
    def kept(dir: String) = Curation.ingestShard(shard, None, dir)
      .kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val kS = kept(dirS)
    assert(kS === kept(dirT))
    assert(kS === Set(100L))
  }
}
