package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Versioned tokenizer persistence ([[TokenizerStore]]): round-trip is an
  * IDENTITY for both families, a republish flips atomically behind the
  * `_CURRENT` pointer (readers see old or new, and unpublished debris is
  * inert), and the streaming encode twins re-resolve the pointer per
  * batch — a mid-stream retrain takes effect at exactly the next batch
  * boundary. */
class TokenizerStoreSpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = graft.core.Tables.documents(spark, sfDir)
    .select("doc_id", "text").localCheckpoint()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_tokstore").toString

  test("round-trip identity for all three families") {
    val dir = tmp()
    val bpe = Bpe.train(docs, 25)
    TokenizerStore.writeBpe(bpe, s"$dir/bpe", spark)
    assert(TokenizerStore.readBpe(spark, s"$dir/bpe") === bpe,
      "BPE merge list must round-trip in training order")

    val uni = Unigram.train(docs, targetMultis = 25)
    TokenizerStore.writeUnigram(uni, s"$dir/uni", spark)
    assert(TokenizerStore.readUnigram(spark, s"$dir/uni") === uni,
      "unigram piece inventory must round-trip identically")

    val wp = WordPiece.train(docs, 15)
    assert(wp.merges.nonEmpty && wp.vocab.nonEmpty)
    TokenizerStore.writeWordPiece(wp, s"$dir/wp", spark)
    assert(TokenizerStore.readWordPiece(spark, s"$dir/wp") === wp,
      "WordPiece vocab + merges must round-trip in order")
  }

  test("BPE family tagging: byte models round-trip via their own " +
      "reader, a family mismatch fails loudly, legacy untagged tables " +
      "read as char only") {
    val dir = tmp()
    val byteModel = ByteBpe.train(docs, 20)
    TokenizerStore.writeByteBpe(byteModel, s"$dir/bbpe", spark)
    assert(TokenizerStore.readByteBpe(spark, s"$dir/bbpe") === byteModel,
      "byte merge list must round-trip in training order")
    // reading a byte table as a char model must fail at load time —
    // not tokenize garbage three stages later
    val e1 = intercept[IllegalArgumentException] {
      TokenizerStore.readBpe(spark, s"$dir/bbpe") }
    assert(e1.getMessage.contains("family mismatch"))
    // and the converse
    val charModel = Bpe.train(docs, 20)
    TokenizerStore.writeBpe(charModel, s"$dir/cbpe", spark)
    val e2 = intercept[IllegalArgumentException] {
      TokenizerStore.readByteBpe(spark, s"$dir/cbpe") }
    assert(e2.getMessage.contains("family mismatch"))
    // legacy table (pre-r15: no family column): char read accepted,
    // byte read refused
    import graft.core.Versioned
    val legacy = s"$dir/legacy"
    val v = Versioned.nextVersion(spark, legacy)
    charModel.merges.zipWithIndex.map { case ((x, y), r) => (r, x, y) }
      .toDF("rank", "x", "y")
      .coalesce(1).write.mode("overwrite").parquet(s"$legacy/$v")
    Versioned.publish(spark, legacy, v)
    assert(TokenizerStore.readBpe(spark, legacy) === charModel)
    val e3 = intercept[IllegalArgumentException] {
      TokenizerStore.readByteBpe(spark, legacy) }
    assert(e3.getMessage.contains("legacy"))
  }

  test("WordPiece streaming encode re-resolves the published model " +
      "per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = tmp()
    val m1 = WordPiece.train(docs, 5)
    val m2 = WordPiece.train(docs, 15)
    assert(m1.vocab !== m2.vocab, "fixture needs two models")
    TokenizerStore.writeWordPiece(m1, dir, spark)
    val b = Seq((9001L, "hello world"), (9002L, "spark tokenizer"))
    def expect(m: WordPiece.Model) =
      WordPiece.encode(b.toDF("doc_id", "text"), m)
        .collect().map(r => (r.getLong(0), r.getInt(1),
          r.getSeq[String](3).toSeq)).toSet
    val sunk = scala.collection.mutable.ArrayBuffer[
      Set[(Long, Int, Seq[String])]]()
    val stream = MemoryStream[(Long, String)](97, spark, None)
    val q = graft.stream.Streaming.streamEncodeWordPiece(
        stream.toDF().toDF("doc_id", "text"), dir,
        (out, _) => sunk += out.collect().map(r => (r.getLong(0),
          r.getInt(1), r.getSeq[String](3).toSeq)).toSet)
      .start()
    stream.addData(b); q.processAllAvailable()
    TokenizerStore.writeWordPiece(m2, dir, spark) // retrain mid-stream
    stream.addData(b); q.processAllAvailable()
    q.stop()
    assert(sunk.size === 2)
    assert(sunk(0) === expect(m1))
    assert(sunk(1) === expect(m2),
      "the republish must take effect at the next batch boundary")
  }

  test("republish flips atomically; staged-but-unpublished debris is inert") {
    val dir = tmp()
    val m1 = Bpe.train(docs, 10)
    val m2 = Bpe.train(docs, 25)
    assert(m1 !== m2, "fixture needs two distinguishable models")
    TokenizerStore.writeBpe(m1, dir, spark)
    assert(TokenizerStore.readBpe(spark, dir) === m1)

    // crash simulation: a half-built next version WITHOUT the pointer
    // flip — readers must keep serving v1
    m2.merges.zipWithIndex.map { case ((x, y), r) => (r, x, y) }
      .toDF("rank", "x", "y")
      .write.mode("overwrite").parquet(s"$dir/v999_debris")
    assert(TokenizerStore.readBpe(spark, dir) === m1,
      "unpublished debris must never be served")

    TokenizerStore.writeBpe(m2, dir, spark)
    assert(TokenizerStore.readBpe(spark, dir) === m2,
      "the republish must serve the new model after the pointer flip")
  }

  test("byte-level streaming encode twin: per-batch ≡ the batch " +
      "encoder under the published byte model") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def rows(df: DataFrame): Set[(Long, Int, String, Seq[String])] =
      df.select("doc_id", "pos", "word", "subs").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getSeq[String](3))).toSet
    val m = ByteBpe.train(docs, 20)
    val dir = tmp()
    TokenizerStore.writeByteBpe(m, dir, spark)
    val all = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = all.splitAt(all.length / 2)
    val sunk = scala.collection.mutable.ArrayBuffer[
      Set[(Long, Int, String, Seq[String])]]()
    val stream = MemoryStream[(Long, String)](187, spark, None)
    val q = graft.stream.Streaming.streamEncodeByteBpe(
        stream.toDF().toDF("doc_id", "text"), dir,
        (df, _) => sunk += rows(df))
      .start()
    Seq(b1, b2).foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    assert(sunk.size === 2)
    assert(sunk.reduce(_ ++ _) === rows(ByteBpe.encode(docs, m)),
      "streamed byte encodings must union to the batch encode")
  }

  test("streaming encode twins: per-batch ≡ the batch encoder, and a " +
      "mid-stream republish is visible to exactly the next batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def rows(df: DataFrame): Set[(Long, Int, String, Seq[String])] =
      df.select("doc_id", "pos", "word", "subs").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getSeq[String](3))).toSet

    val all = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = all.splitAt(all.length / 2)
    val m1 = Unigram.train(docs, targetMultis = 10)
    val m2 = Unigram.train(docs, targetMultis = 30)
    assert(m1 !== m2)

    val dir = tmp()
    TokenizerStore.writeUnigram(m1, dir, spark)
    val sunk = scala.collection.mutable
      .ArrayBuffer[Set[(Long, Int, String, Seq[String])]]()
    val stream = MemoryStream[(Long, String)](211, spark, None)
    val q = graft.stream.Streaming.streamEncodeUnigram(
        stream.toDF().toDF("doc_id", "text"), dir,
        (df, _) => sunk += rows(df))
      .start()
    stream.addData(b1); q.processAllAvailable()
    // retrain + atomic republish between batches
    TokenizerStore.writeUnigram(m2, dir, spark)
    stream.addData(b2); q.processAllAvailable()
    q.stop()

    val b1df = b1.toSeq.toDF("doc_id", "text")
    val b2df = b2.toSeq.toDF("doc_id", "text")
    assert(sunk.size === 2)
    assert(sunk(0) === rows(Unigram.encode(b1df, m1)),
      "batch 1 must encode under the model published at its boundary")
    assert(sunk(1) === rows(Unigram.encode(b2df, m2)),
      "the republish must take effect at the next batch boundary")
    assert(sunk(1) !== rows(Unigram.encode(b2df, m1)),
      "fixture must prove the models actually segment differently")

    // the BPE twin shares the body shape — one-batch pin
    val bdir = tmp()
    val bm = Bpe.train(docs, 12)
    TokenizerStore.writeBpe(bm, bdir, spark)
    val bsunk = scala.collection.mutable
      .ArrayBuffer[Set[(Long, Int, String, Seq[String])]]()
    val bstream = MemoryStream[(Long, String)](212, spark, None)
    val bq = graft.stream.Streaming.streamEncodeBpe(
        bstream.toDF().toDF("doc_id", "text"), bdir,
        (df, _) => bsunk += rows(df))
      .start()
    bstream.addData(b1); bq.processAllAvailable()
    bq.stop()
    assert(bsunk.size === 1 && bsunk(0) === rows(Bpe.encode(b1df, bm)))
  }
}
