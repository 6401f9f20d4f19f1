package graft.props

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck property layer (SURVEY §5.2 layer 3). Each sample runs a real
  * Spark job, so sample counts are kept small — the point is randomized
  * shapes, not volume. */
object GraftProps extends Properties("graft") {

  private lazy val spark = graft.SparkSpec.session

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val ipGen: Gen[Long] = Gen.chooseNum(0L, (1L << 32) - 1)

  property("ipToLong inverts dotted-quad formatting") =
    forAll(ipGen) { ip =>
      import spark.implicits._
      val quad = Seq(((ip >> 24) & 255, (ip >> 16) & 255, (ip >> 8) & 255,
        ip & 255)).map { case (a, b, c, d) => s"$a.$b.$c.$d" }
      val got = quad.toDF("s")
        .select(graft.domain.LogParse.ipToLong(col("s"))).head.getLong(0)
      got == ip && graft.domain.Fw.ipToLong(quad.head) == ip
    }

  private val valuesGen: Gen[List[Double]] =
    Gen.listOfN(40, Gen.chooseNum(-1000, 1000).map(_ / 4.0))

  property("window running sum equals scan-left") =
    forAll(valuesGen) { xs =>
      import spark.implicits._
      val w = Window.orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = xs.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("idx", "v")
        .select(col("idx"), sum(col("v").cast("decimal(18,4)")).over(w).as("r"))
        .orderBy("idx")
        .collect().map(_.getDecimal(1).doubleValue()).toList
      val expected = xs.scanLeft(0.0)(_ + _).tail
      got.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-9 }
    }

  property("orderBy.limit(k) equals sorted take(k)") =
    forAll(valuesGen, Gen.chooseNum(1, 15)) { (xs, k) =>
      import spark.implicits._
      val got = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v").orderBy(desc("v"), asc("id")).limit(k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
      val expected = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .sortBy { case (id, v) => (-v, id) }.take(k)
      got == expected
    }

  // The determinism discipline as an executable property: the decimal-sum
  // → double pattern and the derived variance expression must produce the
  // same BITS regardless of how the data is partitioned (raw double sums
  // would not — fold order changes the rounding).
  property("decimal-sum aggregates are bit-identical across partitionings") =
    forAll(valuesGen, Gen.chooseNum(1, 13)) { (xs, nParts) =>
      import spark.implicits._
      def agg(parts: Int): (Double, Double) = {
        val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "v").repartition(parts)
        val r = df.agg(
          sum(col("v").cast("decimal(18,4)")).cast("double").as("s"),
          sum((col("v") * col("v")).cast("decimal(18,4)")).cast("double")
            .as("ss")).head
        (r.getDouble(0), r.getDouble(1))
      }
      val (s1, ss1) = agg(1)
      val (sn, ssn) = agg(nParts)
      // exact bit equality, not epsilon
      java.lang.Double.doubleToLongBits(s1) ==
        java.lang.Double.doubleToLongBits(sn) &&
      java.lang.Double.doubleToLongBits(ss1) ==
        java.lang.Double.doubleToLongBits(ssn)
    }

  // Deterministic content-hash sampling: membership is a pure function of
  // the key — invariant under repartitioning, and monotone under corpus
  // growth (a row never changes its fate when more rows arrive).
  property("hash-sample membership survives repartition and growth") =
    forAll(Gen.chooseNum(50, 200), Gen.chooseNum(1, 13)) { (n, parts) =>
      import spark.implicits._
      def sampleIds(upTo: Int, p: Int): Set[Long] =
        (0 until upTo).map(_.toLong).toDF("id").repartition(p)
          .filter(substring(md5(col("id").cast("string")), 1, 1)
            .isin("0", "1"))
          .collect().map(_.getLong(0)).toSet
      val small = sampleIds(n, 1)
      val smallReparted = sampleIds(n, parts)
      val grown = sampleIds(n + 57, parts)
      small == smallReparted && small.subsetOf(grown)
    }

  property("exceptAll/intersectAll obey multiset identities") =
    forAll(Gen.listOfN(30, Gen.chooseNum(0, 5)),
      Gen.listOfN(30, Gen.chooseNum(0, 5))) { (as, bs) =>
      import spark.implicits._
      val a = as.toDF("x")
      val b = bs.toDF("x")
      val interCount = a.intersectAll(b).count()
      val exceptCount = a.exceptAll(b).count()
      // |A ∩m B| + |A \m B| = |A| for multisets
      interCount + exceptCount == as.size
    }

  // BQ sign packing on random vectors: the cluster expression, the
  // driver twin, and the brute-force sign count must agree for ANY dim
  // (not just the spec's 64/130 fixtures), and Hamming is a metric on
  // the packed form (symmetry + identity come free; the triangle
  // inequality is the property a broken multi-word fold would violate).
  private val vecGen: Gen[List[Double]] =
    Gen.chooseNum(1, 150).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-100, 100).map(_ / 7.0)))

  property("bq packing: cluster == driver == brute signs; hamming is a metric") =
    forAll(vecGen, vecGen) { (a0, b0) =>
      import spark.implicits._
      val d = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(d), b0.take(d))
      val sigs = Seq((1L, a), (2L, b)).toDF("vec_id", "embedding")
      val packed = graft.sim.Bq.encode(sigs, d).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      def brute(x: Seq[Double], y: Seq[Double]): Int =
        x.indices.count(i => (x(i) >= 0) != (y(i) >= 0))
      def ham(x: Seq[Long], y: Seq[Long]): Int =
        x.zip(y).map { case (p, q) => java.lang.Long.bitCount(p ^ q) }.sum
      packed(1L) == graft.sim.Bq.signature(a) &&
      packed(2L) == graft.sim.Bq.signature(b) &&
      ham(packed(1L), packed(2L)) == brute(a, b) &&
      ham(packed(1L), packed(1L)) == 0
    }

  // BPE on random lowercase corpora: whatever merges training learns,
  // encoding must stay lossless (subwords concatenate back to the word)
  // and must REPLAY training exactly on every training word — the
  // tokenizer contract, independent of corpus shape.
  private val wordGen: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(3, 12).flatMap(k =>
      Gen.listOfN(k, wordGen).flatMap(vocab =>
        Gen.listOfN(25, Gen.oneOf(vocab))))

  property("bpe: round-trip lossless + encode replays training, any corpus") =
    forAll(corpusGen, Gen.chooseNum(0, 10)) { (words, merges) =>
      import spark.implicits._
      val docs = words.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val m = graft.text.Bpe.train(docs, merges)
      val enc = graft.text.Bpe.encode(docs, m).collect()
        .map(r => (r.getString(2), r.getSeq[String](3)))
      val roundTrip = enc.forall { case (w, subs) =>
        subs.mkString("").stripSuffix(graft.text.Bpe.Eow) == w }
      val trained = graft.text.Bpe.trainedSeg(docs, m).collect()
        .map(r => r.getString(0) -> r.getString(2)).toMap
      val replays = enc.forall { case (w, subs) =>
        subs.mkString(" ") == trained(w) }
      roundTrip && replays
    }

  // The bpe_encode KERNEL equals the regex-chain reference on random
  // corpora AND random probe words (seen + unseen) — the heap replay's
  // equivalence argument, executable.
  property("bpe kernel == regex chain on random corpora and probes") =
    forAll(corpusGen, Gen.listOfN(6, wordGen), Gen.chooseNum(1, 10)) {
      (words, probes, merges) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val docs = words.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val m = graft.text.Bpe.train(docs, merges)
      val rows = (words ++ probes).distinct.toDF("w")
        .select(graft.text.Bpe.encodeWordChain(col("w"), m).as("a"),
          graft.text.Bpe.encodeWordKernel(col("w"), m).as("b"))
        .collect()
      rows.forall(r => r.getSeq[String](0) == r.getSeq[String](1))
    }

  // The LM score's analytic range on ANY corpus: the known-transition
  // mass is a cb/cu(prev)-weighted ratio with cb ≤ cu(prev) termwise
  // (a bigram cannot outnumber its context word), so it lies in [0, 1];
  // the backoff mass is ≤ 0.4 by N-normalization — score ∈ [0, 1.4].
  property("lm score lies in its analytic [0, 1.4] range on any corpus") =
    forAll(corpusGen) { words =>
      import spark.implicits._
      val docs = words.grouped(5).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val scores = graft.text.LmScore
        .score(docs, graft.text.LmScore.lmFrom(docs))
        .select("lm_score").collect().map(_.getDouble(0))
      scores.forall(s => s >= 0.0 && s <= 1.4)
    }

  // FpIndex's recall claim is a pigeonhole THEOREM, so it must hold at
  // EVERY radius 1..8 on arbitrary fingerprints — the fixed-fixture spec
  // (FpIndexSpec) checks radii 8 and 3; this samples the rest.
  private val fp63Gen: Gen[Long] =
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(_ & Long.MaxValue)
  property("FpIndex probe == brute-force Hamming pairs at any radius") =
    forAll(Gen.listOfN(40, fp63Gen), Gen.listOfN(10, fp63Gen),
        Gen.listOfN(8, Gen.chooseNum(0, 62)), Gen.chooseNum(1, 8)) {
      (cfps, fresh, flipPos, radius) =>
        import spark.implicits._
        val corpus = cfps.distinct.zipWithIndex
          .map { case (fp, i) => (i.toLong, fp) }
        val near = (0 until 10).map { j =>
          val base = corpus(j % corpus.size)._2
          val fp = flipPos.take(j % (radius + 1)).distinct
            .foldLeft(base)((f, b) => f ^ (1L << b))
          (1000L + j, fp)
        }
        val shard = near ++ fresh.zipWithIndex
          .map { case (fp, j) => (1100L + j, fp) }
        val dir = java.nio.file.Files
          .createTempDirectory("graft_fpprop").toString
        graft.sim.FpIndex.writeIndex(corpus.toDF("id", "fp"), dir, radius)
        val got = graft.sim.FpIndex
          .probe(spark, shard.toDF("id", "fp"), dir)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
          .toSet
        val want = (for {
          (sid, sfp) <- shard; (cid, cfp) <- corpus
          h = java.lang.Long.bitCount(sfp ^ cfp) if h <= radius
        } yield (sid, cid, h)).toSet
        got == want
    }

  // Byte-level BPE round trip on RANDOM valid Unicode (surrogate range
  // excluded — an unpaired surrogate is not UTF-8-encodable and Java
  // substitutes '?', which is a fact about strings, not the codec):
  // decode ∘ encode must be the identity under a trained model, for
  // in-vocabulary and fully-OOV words alike, and the heap kernel must
  // agree with the regex chain on every sample.
  private val uniCpGen: Gen[Int] = Gen.frequency(
    4 -> Gen.chooseNum(0x20, 0x7E),       // ASCII
    3 -> Gen.chooseNum(0xA0, 0x2FFF),     // 2–3-byte BMP
    1 -> Gen.chooseNum(0x1F300, 0x1F64F), // astral (4-byte)
    1 -> Gen.chooseNum(0x00, 0x1F))       // control
  private val uniWordGen: Gen[String] =
    Gen.listOfN(12, uniCpGen)
      .map(_.flatMap(Character.toChars(_).toSeq).mkString)

  private lazy val byteBpeModel: graft.text.Bpe.Model = {
    import spark.implicits._
    val texts = Seq.fill(5)("café crème naïve") ++
      Seq.fill(4)("日本語 テスト 🚀") ++ Seq.fill(6)("plain ascii words")
    graft.text.ByteBpe.train(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), 25)
  }

  property("byte-BPE: decode∘encode = id and kernel = chain on random " +
      "valid Unicode") =
    forAll(Gen.listOfN(6, uniWordGen)) { ws =>
      import spark.implicits._
      val df = ws.toDF("word")
      val rows = df.select(col("word"),
          graft.text.ByteBpe.decodeSubs(
            graft.text.ByteBpe.encodeWordChain(col("word"), byteBpeModel))
            .as("rt"),
          concat_ws(" ", graft.text.ByteBpe
            .encodeWordChain(col("word"), byteBpeModel)).as("chain"),
          concat_ws(" ", graft.text.ByteBpe
            .encodeWordKernel(col("word"), byteBpeModel)).as("kernel"))
        .collect()
      rows.forall { r =>
        r.getString(1) == r.getString(0) &&
          r.getString(2) == r.getString(3)
      }
    }
}
