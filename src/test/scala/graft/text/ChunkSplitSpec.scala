package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Properties of the two round-11 pipeline ops:
  *
  *  - `text_chunk` — overlapping token-window chunking. The oracle pins the
  *    exact rows; this spec pins the WINDOW GEOMETRY the rows must encode
  *    (total coverage, overlap width, lossless reconstruction), which a
  *    hash match alone would also re-pin only against itself.
  *  - `split_assign` — deterministic train/val/test assignment. Exact
  *    fractions on the fixture, purity in doc_id (repartition- and
  *    growth-stability), and agreement with the declared bucket rule.
  */
class ChunkSplitSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def chunks = TextOps.queries("text_chunk")(spark, sfDir)

  test("text_chunk: every token covered, stride geometry, short tail only at the end") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
    val byDoc = chunks.groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        max(col("chunk_id")).as("last_id"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col("n_tokens")).as("min_tokens"))
      .join(docs, "doc_id")
    // starts are 0, S, …, last < n  ⇒  n_chunks = ceil(n / S) and chunk_ids
    // are exactly 0..n_chunks-1 (max = count − 1)
    val geom = byDoc.filter(
      col("n_chunks") =!= ceil(col("n") / lit(24.0)).cast("long") ||
        col("last_id") =!= col("n_chunks") - 1)
    assert(geom.count() === 0, "chunk count/ids must follow the stride")
    // coverage: Σ n_tokens = n + overlap·(n_chunks−1) − trailing shortfall…
    // simpler exact form: every chunk but the last has ≥ stride tokens and
    // the per-doc token sum ≥ n (full coverage: windows start at every
    // stride offset below n, so the union of [start, start+len) is [0, n))
    val bad = byDoc.filter(col("sum_tokens") < col("n"))
    assert(bad.count() === 0, "chunks must cover every token")
    // reconstruction: taking the first `stride` tokens of each chunk (all
    // of the last) and concatenating in chunk_id order rebuilds the text
    val parts = chunks.select(col("doc_id"), col("chunk_id"), col("chunk_text"))
      .collect().groupBy(_.getLong(0))
    val texts = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((docId, rows) <- parts) {
      val ordered = rows.sortBy(_.getLong(1))
      val rebuiltText = ordered.map { r =>
        val toks = r.getString(2).split(" ", -1)
        if (r.getLong(1) == ordered.last.getLong(1)) toks
        else toks.take(24)
      }.flatten.mkString(" ")
      assert(rebuiltText === texts(docId),
        s"doc $docId must rebuild from its chunk prefixes")
    }
  }

  test("text_chunk: consecutive chunks overlap by window − stride") {
    val parts = chunks.select(col("doc_id"), col("chunk_id"), col("chunk_text"))
      .collect().groupBy(_.getLong(0))
    for ((docId, rows) <- parts if rows.length > 1) {
      val ordered = rows.sortBy(_.getLong(1)).map(_.getString(2).split(" ", -1))
      for (i <- 0 until ordered.length - 1) {
        val cur = ordered(i); val nxt = ordered(i + 1)
        // next chunk starts stride=24 tokens later: its prefix equals the
        // current chunk's tokens from position 24 (8 shared when full)
        val expectedOverlap = cur.drop(24)
        assert(nxt.startsWith(expectedOverlap),
          s"doc $docId chunk ${i + 1} must start with chunk $i's tail")
      }
    }
  }

  test("chunking runs as an append-mode stream, chunk-set equal to batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val stream = MemoryStream[(Long, String)](93, spark, None)
    val q = TextOps.chunk(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("chunk_sink")
      .outputMode("append").start()
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (a, b) = docs.splitAt(docs.size / 2)
    stream.addData(a); q.processAllAvailable()
    stream.addData(b); q.processAllAvailable()
    q.stop()
    val got = spark.table("chunk_sink").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    val expected = chunks.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got === expected)
    assert(got.size > docs.size, "multi-chunk docs must fan out")
  }

  test("split_assign: total, disjoint by construction, near-nominal fractions") {
    val a = TextOps.queries("split_assign")(spark, sfDir)
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 500)
    // nominal 79.7 / 10.2 / 10.2 % of 500 ⇒ ≈ 398 / 51 / 51; binomial
    // 4σ ≈ 36 / 27 / 27
    assert(math.abs(counts("train") - 398) < 40, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 51) < 30, s"val=${counts("val")}")
    assert(math.abs(counts("test") - 51) < 30, s"test=${counts("test")}")
    // bucket agrees with the declared rule
    val bad = a.filter(
      (col("bucket") < 204 && col("split") =!= "train") ||
        (col("bucket") >= 204 && col("bucket") < 230 && col("split") =!= "val") ||
        (col("bucket") >= 230 && col("split") =!= "test"))
    assert(bad.count() === 0)
  }

  test("split_assign: pure in doc_id — repartition- and growth-stable") {
    val a = TextOps.queries("split_assign")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // same assignment computed over an arbitrary subset (corpus growth in
    // reverse): membership of OTHER documents cannot flip a doc's split
    val sub = graft.core.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 0).repartition(7)
      .selectExpr(TextOps.splitAssignCols: _*)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(sub.nonEmpty)
    for ((id, s) <- sub) assert(a(id) === s, s"doc $id flipped split")
  }
}
