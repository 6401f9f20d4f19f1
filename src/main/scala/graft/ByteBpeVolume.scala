package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.{Bpe, ByteBpe}

/** Volume proof for BYTE-level BPE training ([[graft.text.ByteBpe]],
  * SURVEY B9.74) — the [[BpeVolume]] discipline at the byte alphabet,
  * with MULTI-BYTE planted morphology so the byte level is genuinely
  * exercised (an ASCII corpus would make this a char-level rerun by the
  * ASCII-isomorphism theorem ByteBpeSpec pins).
  *
  *  - corpus: `nDocs` docs × [[WordsPerDoc]] hash-uniform words from a
  *    [[NMorph]]²-word vocabulary of morpheme COMPOUNDS. Morpheme m is
  *    TWO 2-byte UTF-8 characters from its own DISJOINT byte family:
  *    lead byte 0xC4+m, continuation bytes 0x80+2m and 0x80+2m+1 — so a
  *    morpheme is 4 bytes [L,B,L,B+1] and no byte value appears in two
  *    morphemes. The stratification is then provable at the BYTE level:
  *    intra-morpheme byte pairs ride in the 2·NMorph−1 vocabulary words
  *    containing that morpheme (freq ≈ 23k), the fused-morpheme+`</w>`
  *    attach in NMorph words (≈ 12k), but a CROSS-BOUNDARY pair
  *    (morpheme a's last byte, morpheme b's lead) identifies ONE
  *    compound (≈ 1k) — so greedy byte BPE must spend its first
  *    3·NMorph merges fusing morphemes, the next NMorph attaching
  *    `</w>`, and after exactly 4·NMorph merges EVERY vocabulary word
  *    segments as [hex(morph_a), hex(morph_b)</w>] — 2.0 symbols/word.
  *  - the scale claim measured, not asserted: ONE corpus-sized
  *    word-count pass, then vocabulary-bounded rounds (sec/round in the
  *    artifact must not scale with nDocs).
  *  - LOSSLESSNESS at volume: decode ∘ encode is the identity over
  *    every distinct corpus word (multi-byte throughout).
  *  - kernel vocabulary-size-independence: the byteLevel heap kernel at
  *    the trained merges vs +5000 inert ladder merges (over 0xFE/0xFF —
  *    bytes UTF-8 never emits, so output provably identical).
  *
  * Usage: runMain graft.ByteBpeVolume [nDocs]
  */
object ByteBpeVolume {

  val NMorph = 12
  val WordsPerDoc = 8
  val Merges = 4 * NMorph

  /** Morpheme m as a string: two chars with UTF-8 bytes
    * (0xC4+m, 0x80+2m) and (0xC4+m, 0x80+2m+1). */
  def morpheme(m: Int): String = {
    def cp(lead: Int, cont: Int): Int = ((lead & 0x1F) << 6) | (cont & 0x3F)
    new String(Character.toChars(cp(0xC4 + m, 0x80 + 2 * m))) +
      new String(Character.toChars(cp(0xC4 + m, 0x80 + 2 * m + 1)))
  }

  /** Uppercase hex of a morpheme's UTF-8 bytes — the symbol space the
    * byte model's merges live in. */
  def morphemeHex(m: Int): String =
    morpheme(m).getBytes("UTF-8").map(b => f"${b & 0xFF}%02X").mkString

  /** The planted compound vocabulary, NMorph² words (8 bytes each). */
  val words: Seq[String] =
    for (a <- 0 until NMorph; b <- 0 until NMorph)
      yield morpheme(a) + morpheme(b)

  /** Deterministic corpus: (doc_id, text). */
  def corpus(spark: SparkSession, nDocs: Long): DataFrame = {
    val wl = typedLit(words)
    val toks: Seq[org.apache.spark.sql.Column] =
      (0 until WordsPerDoc).map { j =>
        element_at(wl, (pmod(xxhash64(col("id") * WordsPerDoc + j),
          lit(words.size)) + 1).cast("int"))
      }
    spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", toks: _*).as("text"))
  }

  /** Every learned merge must be morphology: the merged hex symbol,
    * `</w>` stripped, is a contiguous EVEN-offset substring of ONE
    * morpheme's hex (byte families are disjoint, so a cross-boundary
    * symbol cannot be). */
  def allIntraUnit(model: Bpe.Model): Boolean =
    model.merges.forall { case (x, y) =>
      val s = (x + y).stripSuffix(Bpe.Eow)
      s.isEmpty || (0 until NMorph).exists { m =>
        val h = morphemeHex(m)
        val i = h.indexOf(s)
        i >= 0 && i % 2 == 0 && s.length % 2 == 0
      }
    }

  /** After the full budget, every vocabulary word segments exactly at
    * its planted morpheme boundary: [hex(a), hex(b)</w>]. */
  def segmentsAtBoundaries(spark: SparkSession, model: Bpe.Model): Boolean = {
    import spark.implicits._
    val vocabDocs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val expect = (for (a <- 0 until NMorph; b <- 0 until NMorph)
      yield (morpheme(a) + morpheme(b)) ->
        Seq(morphemeHex(a), morphemeHex(b) + Bpe.Eow)).toMap
    ByteBpe.encode(vocabDocs, model).collect().forall { r =>
      r.getSeq[String](3) == expect(r.getString(2))
    }
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = corpus(spark, nDocs).localCheckpoint() // exclude gen cost
    val t0 = System.nanoTime()
    val nWords = Bpe.wordFreq(docs).count()
    val countSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val model = ByteBpe.train(docs, Merges)
    val trainSec = (System.nanoTime() - t1) / 1e9
    val intra = allIntraUnit(model)
    val seg = segmentsAtBoundaries(spark, model)

    // deployment-path encode throughput + the planted 2.0 symbols/word
    val t2 = System.nanoTime()
    val encStats = ByteBpe.encode(docs, model)
      .agg(count(lit(1)).as("words"), sum("n_subs").as("subs")).head()
    val encodeSec = (System.nanoTime() - t2) / 1e9
    val encWords = encStats.getLong(0)
    val symbolsPerWord = encStats.getLong(1).toDouble / encWords

    // LOSSLESSNESS at volume: decode ∘ encode = identity on every
    // distinct corpus word (all multi-byte)
    val broken = Bpe.wordFreq(docs).select(col("word"),
        ByteBpe.decodeSubs(ByteBpe.encodeWord(col("word"), model)).as("rt"))
      .filter(col("rt") =!= col("word")).count()

    // kernel vocabulary-size-independence: +5000 inert ladder merges
    // over 0xFE/0xFF hex symbols (bytes valid UTF-8 never emits)
    def kernelEncodeSec(m: Bpe.Model): (Double, Long) = {
      val t = System.nanoTime()
      val r = Bpe.wordFreq(docs)
        .select(col("word"), col("freq"),
          size(ByteBpe.encodeWordKernel(col("word"), m)).as("ns"))
        .agg(sum(col("freq") * col("ns")).cast("long")).head().getLong(0)
      ((System.nanoTime() - t) / 1e9, r)
    }
    val (kSec, kSubs) = kernelEncodeSec(model)
    val big = Bpe.Model(model.merges ++
      (1 until 2501).map(i => ("FF" * i, "FF")) ++
      (1 until 2501).map(i => ("FE" * i, "FE")))
    val (kSec5k, kSubs5k) = kernelEncodeSec(big)

    val ok = model.size == Merges && intra && seg && broken == 0L &&
      encWords == nDocs * WordsPerDoc && symbolsPerWord == 2.0 &&
      kSubs == encStats.getLong(1) && kSubs5k == kSubs
    val line =
      f"""{"metric":"bytebpe_sec_per_merge_round","value":${
        trainSec / Merges}%.3f,"unit":"sec/round",""" +
      f""""n_docs":$nDocs,"n_tokens":${nDocs * WordsPerDoc},""" +
      f""""vocab_words":$nWords,"count_pass_sec":$countSec%.2f,""" +
      f""""train_sec":$trainSec%.2f,"merges":${model.size},""" +
      s""""all_intra_unit":$intra,"segments_at_boundaries":$seg,""" +
      s""""roundtrip_broken":$broken,""" +
      f""""encode_sec":$encodeSec%.2f,""" +
      f""""encode_tokens_per_sec":${encWords / encodeSec}%.0f,""" +
      f""""symbols_per_word":$symbolsPerWord%.3f,""" +
      f""""kernel_vocab_sec":$kSec%.2f,""" +
      f""""kernel_vocab_sec_5048_merges":$kSec5k%.2f,""" +
      s""""all_ok":$ok}"""
    println(line)
    Artifacts.write("bytebpe_volume.json", line)
    spark.stop()
    if (!ok) { System.err.println("[bytebpevol] CONTRACT MISS"); sys.exit(1) }
  }
}
