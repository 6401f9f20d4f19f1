package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Versioned

/** Versioned persistence for FROZEN tokenizer models — the production
  * form the other model-bearing families already have (LM counts,
  * classifier centroids ride index tables; the tokenizers lived only as
  * driver-side Seqs until round 14). A training pipeline retrains its
  * tokenizer rarely but must ship the change atomically: every consumer
  * (budget metering B9.33/B9.61, corpus packing, the encode stream) must
  * flip from vocab N to vocab N+1 at a batch boundary, never read half a
  * merge list.
  *
  * Layout: one parquet table per published version under the
  * [[graft.core.Versioned]] `_CURRENT`-pointer discipline — a republish
  * writes a COMPLETE v<N+1> and flips the pointer last, so a reader
  * racing a retrain sees the old model or the new one, never a mix; a
  * crash mid-write leaves inert debris [[Versioned.sweep]] reclaims.
  *
  *  - BPE:     (rank, x, y)   — the ORDERED merge list; order IS the
  *              model (the encode replay applies merges in training
  *              order), so rank is materialized as a column and read
  *              back under an explicit sort.
  *  - unigram: (piece, n)     — the count table ([[Unigram.Model]]);
  *              piece probabilities derive from the BIGINT counts in
  *              the kernel, so persisting counts (not floats) keeps the
  *              store exact and the round-trip an identity.
  *
  * Reads COLLECT the table — deliberately: tokenizer models are
  * driver-resident by design everywhere in this engine (they broadcast
  * into kernels as task-shared reference objects), and both tables are
  * vocabulary-bounded, never corpus-sized. TokenizerStoreSpec pins
  * round-trip identity, atomic-flip visibility, debris inertness, and
  * the streaming twins' republish-at-batch-boundary semantics. */
object TokenizerStore {

  def writeBpe(model: Bpe.Model, dir: String,
      spark: SparkSession): Unit =
    writeBpeFamily(model, dir, spark, "char")

  /** BYTE-level BPE models ([[ByteBpe]], round 15) share [[Bpe.Model]]'s
    * shape but NOT its alphabet — a byte model read as a char model (or
    * vice versa) would silently tokenize garbage. The store therefore
    * tags every BPE table with its `family` and the readers enforce it:
    * a family mismatch fails loudly at model-load time, not as corrupt
    * output three stages later. */
  def writeByteBpe(model: Bpe.Model, dir: String,
      spark: SparkSession): Unit =
    writeBpeFamily(model, dir, spark, "byte")

  private def writeBpeFamily(model: Bpe.Model, dir: String,
      spark: SparkSession, family: String): Unit = {
    import spark.implicits._
    val version = Versioned.nextVersion(spark, dir)
    model.merges.zipWithIndex
      .map { case ((x, y), r) => (r, x, y, family) }
      .toDF("rank", "x", "y", "family")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$version")
    Versioned.publish(spark, dir, version)
  }

  def readBpe(spark: SparkSession, dir: String): Bpe.Model =
    readBpeFamily(spark, dir, "char")

  def readByteBpe(spark: SparkSession, dir: String): Bpe.Model =
    readBpeFamily(spark, dir, "byte")

  private def readBpeFamily(spark: SparkSession, dir: String,
      want: String): Bpe.Model = {
    val root = Versioned.resolveRoot(spark, dir)
    val df = spark.read.parquet(root)
    if (df.columns.contains("family")) {
      val fams = df.select("family").distinct().collect()
        .map(_.getString(0)).toSeq
      require(fams.isEmpty || fams == Seq(want),
        s"BPE family mismatch at $dir: stored ${fams.mkString(",")}, " +
          s"asked for $want")
    } else require(want == "char",
      s"legacy (untagged) BPE table at $dir cannot satisfy a $want read")
    Bpe.Model(df.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq)
  }

  def writeUnigram(model: Unigram.Model, dir: String,
      spark: SparkSession): Unit = {
    import spark.implicits._
    val version = Versioned.nextVersion(spark, dir)
    // the inventory order is immaterial to the kernel (a piece's score
    // depends only on its own count), but it is materialized as `ord`
    // anyway so the round-trip is an IDENTITY, not just an equivalence
    model.pieces.zipWithIndex
      .map { case ((p, n), o) => (o, p, n) }
      .toDF("ord", "piece", "n")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$version")
    Versioned.publish(spark, dir, version)
  }

  def readUnigram(spark: SparkSession, dir: String): Unigram.Model = {
    val root = Versioned.resolveRoot(spark, dir)
    Unigram.Model(spark.read.parquet(root)
      .orderBy("ord").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq)
  }

  /** WordPiece (round 14, the third family): one table of tagged rows —
    * kind 'v' carries the ORDERED vocabulary (order is the alphabet-
    * then-training-order convention; encode reads only the set, but the
    * identity round-trip keeps the model inspectable), kind 'm' the
    * merge list that built it. */
  def writeWordPiece(model: WordPiece.Model, dir: String,
      spark: SparkSession): Unit = {
    import spark.implicits._
    val version = Versioned.nextVersion(spark, dir)
    val v = model.vocab.zipWithIndex
      .map { case (p, o) => (o, "v", p, null: String) }
    val m = model.merges.zipWithIndex
      .map { case ((x, y), o) => (o, "m", x, y) }
    (v ++ m).toDF("ord", "kind", "x", "y")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$version")
    Versioned.publish(spark, dir, version)
  }

  def readWordPiece(spark: SparkSession, dir: String): WordPiece.Model = {
    val root = Versioned.resolveRoot(spark, dir)
    val rows = spark.read.parquet(root).orderBy("ord").collect()
    WordPiece.Model(
      rows.filter(_.getString(1) == "v").map(_.getString(2)).toSeq,
      rows.filter(_.getString(1) == "m")
        .map(r => (r.getString(2), r.getString(3))).toSeq)
  }
}
