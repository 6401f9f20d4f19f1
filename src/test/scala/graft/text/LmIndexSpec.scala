package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.stream.Streaming

/** The persisted LM quality index ([[LmScore]]): index round-trip equals
  * the in-memory LM, shard append equals rebuild-over-union (counts are
  * mergeable), read-time thresholding promotes bigrams that cross the
  * known cut only across shards, OOV probes score with zero backoff mass
  * instead of vanishing, versioned compaction preserves scores while
  * shrinking files, and the streaming twin replays the batch scorer. */
class LmIndexSpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val docs = graft.core.Tables.documents(spark, sfDir)
    .select("doc_id", "text").localCheckpoint()

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_lm_$tag").toString

  private def scoresOf(df: DataFrame): Map[Long, Seq[Any]] =
    df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap

  test("index round-trip: writeLm + readLm scores exactly like the " +
      "in-memory self-trained LM (the declared query's path)") {
    val dir = tmp("rt")
    LmScore.writeLm(docs, dir)
    val viaIndex = scoresOf(LmScore.score(docs, LmScore.readLm(spark, dir)))
    val inMem = scoresOf(LmScore.score(docs, LmScore.lmFrom(docs)))
    assert(viaIndex === inMem)
  }

  test("append ≡ rebuild-over-union: counts are mergeable, so folding " +
      "shard B into index(A) scores like an index built on A ∪ B") {
    val a = docs.filter(col("doc_id") < 250)
    val b = docs.filter(col("doc_id") >= 250)
    val incr = tmp("incr"); val full = tmp("full")
    LmScore.writeLm(a, incr)
    LmScore.appendLm(b, incr)
    LmScore.writeLm(docs, full)
    val si = scoresOf(LmScore.score(docs, LmScore.readLm(spark, incr)))
    val sf = scoresOf(LmScore.score(docs, LmScore.readLm(spark, full)))
    assert(si === sf)
  }

  test("read-time thresholding: a bigram seen once per shard becomes a " +
      "KNOWN transition only after the append (write-time thresholding " +
      "would lose it forever)") {
    val dir = tmp("thresh")
    val a = Seq((1L, "qa qb")).toDF("doc_id", "text")
    val b = Seq((2L, "qa qb")).toDF("doc_id", "text")
    val probe = Seq((9L, "qa qb")).toDF("doc_id", "text")
    LmScore.writeLm(a, dir)
    val before = LmScore.score(probe, LmScore.readLm(spark, dir)).collect()(0)
    assert(before.getAs[Long]("n_seen") === 0)
    assert(before.getAs[Long]("n_unseen") === 1)
    // backoff only: 0.4 * cu(qb)/(1 * N) = 0.4 * 1/2
    assert(before.getAs[Double]("lm_score") === 0.4 * (1.0 / 2.0))
    LmScore.appendLm(b, dir)
    val after = LmScore.score(probe, LmScore.readLm(spark, dir)).collect()(0)
    assert(after.getAs[Long]("n_seen") === 1)
    assert(after.getAs[Long]("n_unseen") === 0)
    // known mass: Σcb/Σcu(prev) = 2/2
    assert(after.getAs[Double]("lm_score") === 1.0)
  }

  test("OOV probe words: transitions stay counted with zero backoff " +
      "mass — an all-OOV doc scores 0.0 instead of vanishing") {
    val dir = tmp("oov")
    LmScore.writeLm(Seq((1L, "qa qb qa qb")).toDF("doc_id", "text"), dir)
    val probe = Seq((9L, "zz yy xx")).toDF("doc_id", "text")
    val r = LmScore.score(probe, LmScore.readLm(spark, dir)).collect()
    assert(r.length === 1, "the OOV doc must not vanish")
    assert(r(0).getAs[Long]("n_trans") === 2)
    assert(r(0).getAs[Long]("n_unseen") === 2)
    assert(r(0).getAs[Long]("bo_num") === 0L)
    assert(r(0).getAs[Double]("lm_score") === 0.0)
  }

  test("compaction: one row per n-gram in a NEW version behind the " +
      "atomic pointer — fewer files, identical scores, old version " +
      "still fully readable") {
    val dir = tmp("compact")
    val shards = Seq(0L, 100L, 200L, 300L, 400L).map(lo =>
      docs.filter(col("doc_id") >= lo && col("doc_id") < lo + 100))
    LmScore.writeLm(shards.head, dir)
    shards.tail.foreach(LmScore.appendLm(_, dir))
    val before = scoresOf(LmScore.score(docs, LmScore.readLm(spark, dir)))
    val oldRoot = graft.core.Versioned.resolveRoot(spark, dir)
    def files(root: String): Int = {
      val p = new org.apache.hadoop.fs.Path(s"$root/bigrams")
      p.getFileSystem(spark.sessionState.newHadoopConf())
        .listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    }
    val nOld = files(oldRoot)
    LmScore.compactLm(spark, dir)
    val newRoot = graft.core.Versioned.resolveRoot(spark, dir)
    assert(newRoot !== oldRoot, "compaction must publish a NEW version")
    assert(files(newRoot) < nOld,
      s"expected fewer files after compaction: $nOld -> ${files(newRoot)}")
    assert(scoresOf(LmScore.score(docs, LmScore.readLm(spark, dir)))
      === before, "scores must be invariant under compaction")
    // crash-safety half: the superseded version is untouched debris
    assert(spark.read.parquet(s"$oldRoot/bigrams").count() > 0)
  }

  test("streaming twin: two micro-batches score exactly like the batch " +
      "scorer, and an append between batches takes effect at the next " +
      "batch boundary") {
    val dir = tmp("stream")
    val base = docs.filter(col("doc_id") < 400)
    LmScore.writeLm(base, dir)
    val b1 = Seq((9001L, "qq ww qq ww"), (9002L, "aa bb cc"))
    val b2 = Seq((9003L, "qq ww qq"), (9004L, "dd ee ff"))
    val fold = Seq((9100L, "qq ww qq ww qq ww")).toDF("doc_id", "text")

    val sunk = scala.collection.mutable.ArrayBuffer[(Long, Map[Long, Seq[Any]])]()
    val stream = MemoryStream[(Long, String)](92, spark, None)
    val q = Streaming.streamLmScore(
        stream.toDF().toDF("doc_id", "text"), dir,
        (scores, id) => sunk += ((id, scoresOf(scores))))
      .start()
    stream.addData(b1); q.processAllAvailable()
    // fold a shard in between batches — the live re-read must see it
    LmScore.appendLm(fold, dir)
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    assert(sunk.size === 2)

    val lmAtB1 = LmScore.readLm(spark, dir) // post-append view… rebuild b1's
    val lmBefore = LmScore.lmFrom(base) // == readLm before the append
    assert(sunk(0)._2 ===
      scoresOf(LmScore.score(b1.toDF("doc_id", "text"), lmBefore)))
    assert(sunk(1)._2 ===
      scoresOf(LmScore.score(b2.toDF("doc_id", "text"), lmAtB1)))
    // and the append actually mattered for batch 2: "qq ww" is known
    // only through the folded shard
    assert(sunk(1)._2(9003L).head === 2L) // n_trans
    val b2row = LmScore.score(b2.toDF("doc_id", "text"), lmBefore)
      .filter(col("doc_id") === 9003L).collect()(0)
    assert(b2row.getAs[Long]("n_seen") === 0, "precondition: unseen pre-fold")
    assert(sunk(1)._2(9003L)(1) === 2L, "post-fold: both transitions known")
  }

  test("streamDsir: micro-batches select exactly what the batch " +
      "dsirSelect does against the frozen LM indexes, and a target-LM " +
      "append between batches shifts batch-2 selection") {
    val rawDir = tmp("dsir_raw"); val tgtDir = tmp("dsir_tgt")
    LmScore.writeLm(docs, rawDir) // raw model: the whole corpus
    LmScore.writeLm(docs.filter(col("doc_id") < 100), tgtDir) // target slice
    val slice = (lo: Long, hi: Long) =>
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .as[(Long, String)].collect().toSeq
    val b1 = slice(400, 450); val b2 = slice(450, 500)

    val sunk = scala.collection.mutable.ArrayBuffer[(Long, Set[Long])]()
    val stream = MemoryStream[(Long, String)](93, spark, None)
    val q = Streaming.streamDsir(
        stream.toDF().toDF("doc_id", "text"), rawDir, tgtDir,
        (sel, id) => sunk += ((id,
          sel.select("doc_id").collect().map(_.getLong(0)).toSet)))
      .start()
    stream.addData(b1); q.processAllAvailable()
    // fold more exemplar docs into the TARGET LM between batches — the
    // per-batch pointer re-read must see it for batch 2
    LmScore.appendLm(docs.filter(col("doc_id") >= 100
      && col("doc_id") < 200), tgtDir)
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    assert(sunk.size === 2)

    def batchSelect(rows: Seq[(Long, String)], tgt: LmScore.Lm): Set[Long] =
      TextOps.dsirSelect(rows.toDF("doc_id", "text"),
          LmScore.readLm(spark, rawDir), tgt)
        .select("doc_id").collect().map(_.getLong(0)).toSet

    val tgtBefore = LmScore.lmFrom(docs.filter(col("doc_id") < 100))
    assert(sunk(0)._2 === batchSelect(b1, tgtBefore))
    assert(sunk(1)._2 === batchSelect(b2, LmScore.readLm(spark, tgtDir)))
    // informative: the gate actually selects a strict, non-empty subset
    assert(sunk(0)._2.nonEmpty && sunk(0)._2.size < b1.size)
  }
}
