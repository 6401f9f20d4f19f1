package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted boilerplate line-frequency index ([[LineIndex]]) — every
  * lifecycle leg of the house index template, pinned against the batch
  * operator it serves:
  * round-trip ≡ [[TextOps.boilerplateLines]]; append ≡ rebuild-over-union
  * (+ a replayed shard trips the guard); exact-subtraction retraction ≡
  * rebuild-without (+ replay no-op); compaction is a set identity that
  * physically drops zeroed rows; empty publish refused; and the streaming
  * probe-then-fold twin equals the sequential batch loop with cross-batch
  * boilerplate emerging.
  */
class LineIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"line_idx_$tag").toString

  // lines repeat across docs: "footer" df=4, "nav" df=3, "twice" df=2
  private def shard1 = Seq(
    (0L, "u0 a\nfooter\nu0 b"),
    (1L, "footer\nnav\nu1 a"),
    (2L, "u2 a\ntwice\nnav\nfooter"),
    (3L, "nav\nfooter")
  ).toDF("doc_id", "text")

  private def shard2 = Seq(
    (10L, "u10 a\ntwice\nfooter"),
    (11L, "late\nu11 a"),
    (12L, "late\nnav"),
    (13L, "late\nu13 a")
  ).toDF("doc_id", "text")

  private def setOf(dir: String, minDf: Long = 3): Map[String, Long] =
    LineIndex.boilerplateSet(spark, dir, minDf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def refSet(docs: DataFrame, minDf: Long = 3): Map[String, Long] =
    TextOps.boilerplateLines(docs, minDf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("round-trip: the served set IS the batch mine") {
    val dir = tmp("rt")
    LineIndex.writeIndex(shard1, dir)
    assert(setOf(dir) === refSet(shard1))
    assert(setOf(dir) === Map("footer" -> 4L, "nav" -> 3L))
    // the probe replays the batch cleaning body verbatim
    val probed = LineIndex.probeShard(shard1, dir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val batch = TextOps.lineDedup(shard1)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(probed === batch)
  }

  test("append equals rebuild over the union; a replayed shard trips " +
      "the guard") {
    val dir = tmp("ap"); val twin = tmp("ap_twin")
    LineIndex.writeIndex(shard1, dir)
    LineIndex.appendIndex(shard2, dir)
    LineIndex.writeIndex(shard1.union(shard2), twin)
    assert(setOf(dir) === setOf(twin))
    assert(setOf(dir).contains("late"))
    // cross-shard accumulation: "twice" has df=1 in EACH shard — only the
    // summed partials reach 2
    assert(setOf(dir, minDf = 2).get("twice") === Some(2L))
    val e = intercept[IllegalArgumentException] {
      LineIndex.appendIndex(shard2, dir)
    }
    assert(e.getMessage.contains("monotonic-id"))
  }

  test("retraction: exact subtraction equals rebuild-without; replay is " +
      "a no-op; the high-water mark stays burned") {
    val dir = tmp("rt2"); val twin = tmp("rt2_twin")
    LineIndex.writeIndex(shard1, dir)
    LineIndex.appendIndex(shard2, dir)
    // take down docs 10 and 12: "twice" drops to df=2 (out), "late" to
    // df=2 (out), "footer" to df=4 (stays), "nav" to df=3 (stays)
    val takedown = shard2.filter(col("doc_id").isin(10L, 12L))
    LineIndex.retract(takedown, dir)
    LineIndex.writeIndex(
      shard1.union(shard2.filter(!col("doc_id").isin(10L, 12L))), twin)
    assert(setOf(dir) === setOf(twin))
    assert(!setOf(dir).contains("twice") && !setOf(dir).contains("late"))
    // replayed takedown subtracts nothing twice
    LineIndex.retract(takedown, dir)
    assert(setOf(dir) === setOf(twin))
    // the mark never rewinds: re-adding content under an old id fails
    val e = intercept[IllegalArgumentException] {
      LineIndex.appendIndex(Seq((11L, "x")).toDF("doc_id", "text"), dir)
    }
    assert(e.getMessage.contains("monotonic-id"))
  }

  test("compaction: set identical, zeroed rows physically dropped, one " +
      "file per partition, guard and takedown idempotence survive") {
    val dir = tmp("cp")
    LineIndex.writeIndex(shard1, dir)
    LineIndex.appendIndex(shard2, dir)
    val takedown = shard2.filter(col("doc_id").isin(10L, 12L))
    LineIndex.retract(takedown, dir)
    val before = setOf(dir)
    val negRows = { // retraction wrote negative partials
      val root = graft.core.Versioned.resolveRoot(spark, dir)
      spark.read.parquet(s"$root/lines").filter(col("n") < 0).count()
    }
    assert(negRows > 0L)
    LineIndex.compactIndex(spark, dir)
    assert(setOf(dir) === before)
    val root = graft.core.Versioned.resolveRoot(spark, dir)
    val rows = spark.read.parquet(s"$root/lines")
    assert(rows.filter(col("n") <= 0).isEmpty, "zeroed rows must drop")
    // one parquet data file per pb partition
    val files = new java.io.File(root, "lines").listFiles()
      .filter(_.getName.startsWith("pb="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(files.nonEmpty && files.forall(_ === 1))
    // lifecycle survives the republish
    intercept[IllegalArgumentException] {
      LineIndex.appendIndex(shard2, dir)
    }
    LineIndex.retract(takedown, dir) // replay after compaction: no-op
    assert(setOf(dir) === before)
  }

  test("an empty corpus refuses to publish") {
    val dir = tmp("em")
    val e = intercept[IllegalArgumentException] {
      LineIndex.writeIndex(shard1.filter(lit(false)), dir)
    }
    assert(e.getMessage.contains("EMPTY"))
    assert(!graft.core.Versioned.isVersioned(spark, dir))
  }

  test("streaming twin: probe-then-fold per batch equals the sequential " +
      "loop, and cross-batch boilerplate emerges") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = tmp("st"); val twin = tmp("st_twin")
    LineIndex.writeIndex(shard1, dir)
    LineIndex.writeIndex(shard1, twin)
    val b1 = Seq((10L, "u10 a\ntwice\nfooter"), (11L, "late\nu11 a"))
    // "twice": df=1 in shard1, +1 folded from b1 — it reaches minDf=2
    // only because b1's counts accumulated, so b1 keeps it and b2 drops it
    val b2 = Seq((12L, "twice\nnav"), (13L, "late\nu13 a"))
    val minDf = 2L
    def collectSet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val sunk = scala.collection.mutable
      .ArrayBuffer[Set[(Long, Long, Long, String)]]()
    val stream = MemoryStream[(Long, String)](98, spark, None)
    val q = graft.stream.Streaming.streamLineIngest(
        stream.toDF().toDF("doc_id", "text"), dir,
        (df, _) => sunk += collectSet(df), minDf)
      .start()
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    // sequential batch loop on the twin index
    val s1 = collectSet(LineIndex.probeShard(b1.toDF("doc_id", "text"),
      twin, minDf))
    LineIndex.appendIndex(b1.toDF("doc_id", "text"), twin)
    val s2 = collectSet(LineIndex.probeShard(b2.toDF("doc_id", "text"),
      twin, minDf))
    LineIndex.appendIndex(b2.toDF("doc_id", "text"), twin)
    assert(sunk.size === 2)
    assert(sunk(0) === s1)
    assert(sunk(1) === s2)
    // end state: both indexes serve the same set
    assert(setOf(dir, minDf) === setOf(twin, minDf))
    // cross-batch emergence actually happened: "twice" was kept in b1's
    // cleaning but dropped in b2's
    assert(sunk(0).exists(r => r._1 == 10L && r._4.contains("twice")))
    assert(sunk(1).forall(r => !r._4.contains("twice")))
  }
}
