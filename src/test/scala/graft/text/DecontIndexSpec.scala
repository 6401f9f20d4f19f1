package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted benchmark-decontamination index ([[DecontIndex]]): the
  * index-served probe EQUALS the corpus recompute (the declared
  * `decont_probe` semantics), appends ≡ rebuild under the monotonic-id
  * guard, retraction keeps grams another live benchmark still owns and
  * is idempotent, versioned compaction preserves verdicts while
  * shrinking files and physically dropping tombstones, an empty
  * benchmark set refuses to publish, and the streaming twin flags
  * batches exactly like the batch probe.
  */
class DecontIndexSpec extends SparkSpec {

  import spark.implicits._

  private def w(i: Int) = s"w$i"
  private def words(from: Int, n: Int): String =
    (from until from + n).map(w).mkString(" ")

  // Benchmark docs 0..9: doc b = tokens w(100b)..w(100b+9) — 6 grams
  // each, ranges disjoint EXCEPT bench 9, which opens with bench 8's
  // first five tokens (so the gram "w800..w804" lives in BOTH).
  private def benchDoc(b: Long): (Long, String) =
    if (b == 9L) (9L, words(800, 5) + " " + words(995, 5))
    else (b, words(b.toInt * 100, 10))
  private lazy val bench: Seq[(Long, String)] = (0L to 9L).map(benchDoc)

  // Train docs:
  //  100 clean (disjoint token range)
  //  101 contaminated ONLY via bench 3 (copies w300..w304)
  //  102 contaminated via the gram bench 8 and 9 SHARE (w800..w804)
  //  103 too short for any gram (3 tokens) — no evidence, drops out
  private lazy val train: Seq[(Long, String)] = Seq(
    (100L, words(5000, 12)),
    (101L, words(6000, 4) + " " + words(300, 5) + " " + words(6100, 3)),
    (102L, words(7000, 2) + " " + words(800, 5) + " " + words(7100, 4)),
    (103L, words(8000, 3)))

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_decont_$tag").toString

  private def collected(d: DataFrame): Seq[(Long, Long, Long, Boolean)] =
    d.select("doc_id", "n_grams", "n_hit", "contaminated")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq.sortBy(_._1)

  test("probeShard over the published index == probeCorpus recompute " +
      "(the declared decont_probe semantics), with the planted verdicts") {
    val dir = tmp("eq")
    DecontIndex.writeIndex(df(bench), dir)
    val probed = collected(DecontIndex.probeShard(df(train), dir))
    val corpus = df(bench).withColumn("source", lit("src0"))
      .unionByName(df(train).withColumn("source", lit("trainset")))
    assert(probed === collected(DecontIndex.probeCorpus(corpus)))
    // planted ground truth: 101 and 102 flagged (5 copied tokens = 1
    // shared gram), 100 clean, 103 absent (no grams at all)
    assert(probed === Seq(
      (100L, 8L, 0L, false),
      (101L, 8L, 1L, true),
      (102L, 7L, 1L, true)))
  }

  test("append == rebuild: index(bench A) + append(bench B) serves the " +
      "same verdicts as index(A ++ B); a replayed shard trips the guard") {
    val (a, b) = bench.partition(_._1 <= 5L)
    val incr = tmp("incr"); val full = tmp("full")
    DecontIndex.writeIndex(df(a), incr)
    // mid-ingest: only bench 3's grams exist yet, so 102 is still clean
    assert(collected(DecontIndex.probeShard(df(train), incr))
      .map(t => (t._1, t._4)) ===
      Seq((100L, false), (101L, true), (102L, false)))
    DecontIndex.appendIndex(df(b), incr)
    DecontIndex.writeIndex(df(a ++ b), full)
    assert(collected(DecontIndex.probeShard(df(train), incr))
      === collected(DecontIndex.probeShard(df(train), full)))
    val guard = intercept[IllegalArgumentException] {
      DecontIndex.appendIndex(df(b), incr)
    }
    assert(guard.getMessage.contains("monotonic-id"))
  }

  test("retract: sole-owner grams stop flagging, a gram another live " +
      "benchmark owns keeps flagging, a replay changes nothing") {
    val dir = tmp("retract")
    DecontIndex.writeIndex(df(bench), dir)
    // retract bench 8: 102's hit gram is ALSO in live bench 9 -> flagged
    DecontIndex.retract(spark, dir, Seq(8L))
    assert(collected(DecontIndex.probeShard(df(train), dir))
      .map(t => (t._1, t._4)) ===
      Seq((100L, false), (101L, true), (102L, true)))
    // retract bench 3 and 9: both planted hits lose their last owner
    DecontIndex.retract(spark, dir, Seq(3L, 9L))
    val after = collected(DecontIndex.probeShard(df(train), dir))
    assert(after.map(t => (t._1, t._4)) ===
      Seq((100L, false), (101L, false), (102L, false)))
    // idempotent replay
    DecontIndex.retract(spark, dir, Seq(3L, 9L, 8L))
    assert(collected(DecontIndex.probeShard(df(train), dir)) === after)
    // verdicts equal a rebuild WITHOUT the retracted benchmarks
    val rebuilt = tmp("rebuilt")
    DecontIndex.writeIndex(
      df(bench.filterNot(r => Set(3L, 8L, 9L)(r._1))), rebuilt)
    assert(collected(DecontIndex.probeShard(df(train), rebuilt)) === after)
  }

  private def gramFiles(dir: String): Seq[java.io.File] = {
    val root = graft.core.Versioned.resolveRoot(spark, dir)
    val d = new java.io.File(s"$root/grams")
    Option(d.listFiles()).getOrElse(Array.empty).toSeq
      .filter(_.getName.startsWith("pg="))
      .flatMap(p => p.listFiles().toSeq)
      .filter(_.getName.endsWith(".parquet"))
  }

  test("compaction: files shrink to one per partition, tombstoned rows " +
      "are physically gone, verdicts and the high-water guard survive") {
    val dir = tmp("compact")
    val shards = bench.grouped(3).toSeq
    DecontIndex.writeIndex(df(shards.head), dir)
    shards.tail.foreach(sh => DecontIndex.appendIndex(df(sh), dir))
    DecontIndex.retract(spark, dir, Seq(3L))
    val before = collected(DecontIndex.probeShard(df(train), dir))
    val filesBefore = gramFiles(dir)
    DecontIndex.compactIndex(spark, dir)
    val filesAfter = gramFiles(dir)
    assert(collected(DecontIndex.probeShard(df(train), dir)) === before)
    assert(filesAfter.size < filesBefore.size)
    assert(filesAfter.groupBy(_.getParentFile.getName)
      .values.forall(_.size == 1))
    // tombstoned benchmark physically absent from the new version
    val root = graft.core.Versioned.resolveRoot(spark, dir)
    assert(spark.read.parquet(s"$root/grams")
      .filter(col("bench_id") === 3L).isEmpty)
    // the guard still holds across the republish
    val guard = intercept[IllegalArgumentException] {
      DecontIndex.appendIndex(df(bench.take(1)), dir)
    }
    assert(guard.getMessage.contains("monotonic-id"))
  }

  private def flagged(d: DataFrame): Seq[(Long, Long)] =
    d.select("doc_id", "n_hit").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)

  test("bloom-prefiltered probe == the exact probe's contaminated slice, " +
      "also under a deliberately saturated filter and after retraction") {
    val dir = tmp("bloom")
    DecontIndex.writeIndex(df(bench), dir)
    def exactSlice: Seq[(Long, Long)] =
      flagged(DecontIndex.probeShard(df(train), dir)
        .filter(col("contaminated")))
    assert(exactSlice === Seq((101L, 1L), (102L, 1L)))
    assert(flagged(DecontIndex.probeShardBloom(df(train), dir))
      === exactSlice)
    // 64-bit filter over ~60 grams: virtually every probe is a false
    // candidate, so the exact semi-join must do ALL the rejection work
    assert(flagged(DecontIndex.probeShardBloom(df(train), dir,
      estItems = 4L, numBits = 64L)) === exactSlice)
    DecontIndex.retract(spark, dir, Seq(3L))
    assert(exactSlice === Seq((102L, 1L)))
    assert(flagged(DecontIndex.probeShardBloom(df(train), dir))
      === exactSlice)
  }

  test("an empty benchmark set refuses to publish") {
    val e = intercept[IllegalArgumentException] {
      DecontIndex.writeIndex(df(Nil), tmp("empty"))
    }
    assert(e.getMessage.contains("EMPTY"))
  }

  test("streaming twin: per-batch flags == the batch probe, and a " +
      "mid-stream benchmark append shows up at the next batch") {
    val dir = tmp("stream")
    DecontIndex.writeIndex(df(bench.filter(_._1 <= 5L)), dir)
    val got = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Long, Boolean)]
    val stream = MemoryStream[(Long, String)](96, spark, None)
    val q = graft.stream.Streaming.streamDecontFlags(
        stream.toDF().toDF("doc_id", "text"), dir,
        (flags, _) => got ++= collected(flags))
      .start()
    stream.addData(train.take(2)); q.processAllAvailable()
    // bench 9 not yet indexed -> 102 clean in THIS batch; then rotate
    // the benchmark set and the next batch sees it
    stream.addData(train.drop(2)); q.processAllAvailable()
    assert(got.toSeq.sortBy(_._1) ===
      collected(DecontIndex.probeShard(df(train), dir)))
    DecontIndex.appendIndex(df(bench.filter(_._1 > 5L)), dir)
    stream.addData(Seq(train(2))); q.processAllAvailable()
    q.stop()
    assert(got.last === (102L, 7L, 1L, true))
  }
}
