package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hyperplane-LSH embedding fingerprints ([[EmbedFp]]): the banded
  * near-dup join ≡ a brute-force Hamming model (pigeonhole recall +
  * exact verify), the encode is partitioning-independent, geometric
  * identities hold exactly (copy → hamming 0, negation → hamming 63),
  * and the fingerprints feed the persisted [[FpIndex]] loop unchanged.
  */
class EmbedFpSpec extends SparkSpec {

  import spark.implicits._

  private val Dim = 64

  // deterministic corpus: 40 base vectors + 10 planted near-copies
  // (tiny relative perturbation — a near-dup in angle, so fingerprints
  // land within a few bits) + 5 exact copies + 2 negations
  private lazy val vecs: Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(42)
    val base = (0L until 40L).map(i =>
      (i, Seq.fill(Dim)(rnd.nextGaussian())))
    val near = (0 until 10).map { j =>
      val (_, v) = base(j * 3)
      (100L + j, v.map(x => x * (1.0 + 0.01 * rnd.nextGaussian())))
    }
    val copies = (0 until 5).map(j => (200L + j, base(j * 7)._2))
    val negs = (0 until 2).map(j => (300L + j, base(j * 11)._2.map(-_)))
    base ++ near ++ copies ++ negs
  }

  private lazy val emb: DataFrame =
    vecs.toDF("vec_id", "embedding")

  private def fpMap: Map[Long, Long] =
    EmbedFp.fingerprints(emb, Dim).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def brutePairs(fps: Map[Long, Long], r: Int): Set[(Long, Long, Int)] = {
    val ids = fps.keys.toSeq.sorted
    (for {
      a <- ids; b <- ids if a < b
      h = java.lang.Long.bitCount(fps(a) ^ fps(b)) if h <= r
    } yield (a, b, h)).toSet
  }

  test("banded near-dup pairs == brute-force hamming join (planted corpus)") {
    val fps = fpMap
    val expected = brutePairs(fps, EmbedFp.DeclaredRadius)
    assert(expected.nonEmpty, "planted corpus must produce near pairs")
    // exact copies are in there at hamming 0
    assert(expected.exists(_._3 == 0))
    val got = EmbedFp.nearDupPairs(emb, Dim).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expected)
  }

  test("geometric identities: copy -> 0 bits, negation -> 63 bits") {
    val fps = fpMap
    (0 until 5).foreach { j =>
      assert(fps(200L + j) === fps(j * 7L), s"exact copy $j")
    }
    (0 until 2).foreach { j =>
      val h = java.lang.Long.bitCount(fps(300L + j) ^ fps(j * 11L))
      assert(h === 63, s"negation flips every sign bit (got $h)")
    }
  }

  test("rademacher_fp kernel == the composed dot-product form, inside " +
      "whole-stage codegen") {
    val viaKernel = EmbedFp.fingerprints(emb, Dim)
    val viaComposed = emb.select(col("vec_id").as("id"),
      EmbedFp.fingerprintViaComposed(
        col("embedding").cast("array<double>"), Dim).as("fp"))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(viaKernel) === m(viaComposed))
    // a real (non-LocalRelation) input, or ConvertToLocalRelation folds
    // the projection away before any plan exists to inspect; collect
    // first so the adaptive plan is final
    val df = EmbedFp.fingerprints(emb.repartition(2), Dim)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rademacher_fp"), "kernel must be in the plan")
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      "the fingerprint projection must stay inside whole-stage codegen")
  }

  test("encode is partitioning-independent") {
    val a = EmbedFp.fingerprints(emb.repartition(2), Dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = EmbedFp.fingerprints(emb.repartition(7), Dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a === b)
  }

  test("streaming composition: the fingerprint projection is streaming-" +
      "legal and the generic fp twin flags embedding near-dups per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files
      .createTempDirectory("embedfp_stream").toString
    val corpus = emb.filter(col("vec_id") < 100)
    FpIndex.writeIndex(EmbedFp.fingerprints(corpus, Dim), dir,
      maxHamming = EmbedFp.DeclaredRadius)
    val fps = fpMap
    def expected(ids: Seq[Long]): Set[Long] =
      ids.filter(s => fps.keys.exists(c => c < 100L &&
        java.lang.Long.bitCount(fps(s) ^ fps(c)) <=
          EmbedFp.DeclaredRadius)).toSet
    val b1 = vecs.filter(v => v._1 >= 100L && v._1 < 200L)
    val b2 = vecs.filter(_._1 >= 200L)
    val sunk = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    val stream = MemoryStream[(Long, Seq[Double])](95, spark, None)
    val q = graft.stream.Streaming.streamFpDupFlags(
        EmbedFp.fingerprints(
          stream.toDF().toDF("vec_id", "embedding"), Dim), dir,
        (flags, _) => sunk += flags.collect().map(_.getLong(0)).toSet)
      .start()
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    assert(sunk.size === 2)
    assert(sunk(0) === expected(b1.map(_._1)))
    assert(sunk(1) === expected(b2.map(_._1)))
    assert(sunk(1).nonEmpty, "the exact copies must flag")
  }

  test("fingerprints feed the persisted FpIndex loop unchanged") {
    val dir = java.nio.file.Files
      .createTempDirectory("embedfp_idx").toString
    val corpus = emb.filter(col("vec_id") < 100)
    val shard = emb.filter(col("vec_id") >= 100)
    FpIndex.writeIndex(EmbedFp.fingerprints(corpus, Dim), dir,
      maxHamming = EmbedFp.DeclaredRadius)
    val got = FpIndex.probe(spark, EmbedFp.fingerprints(shard, Dim), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fps = fpMap
    val expected = (for {
      s <- fps.keys if s >= 100L
      c <- fps.keys if c < 100L
      h = java.lang.Long.bitCount(fps(s) ^ fps(c))
        if h <= EmbedFp.DeclaredRadius
    } yield (s, c, h)).toSet
    assert(expected.nonEmpty) // the planted copies/near-copies
    assert(got === expected)
  }
}
