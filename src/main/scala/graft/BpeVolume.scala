package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.Bpe

/** Volume proof for distributed BPE training ([[graft.text.Bpe]], SURVEY
  * B9.43) — the [[DedupVolume]] discipline: measured cost at ≥1M documents
  * with PLANTED morphology the construction makes provably recoverable.
  *
  *  - corpus: `nDocs` docs × [[WordsPerDoc]] hash-uniform words from a
  *    [[NMorph]]²-word vocabulary of morpheme COMPOUNDS: word(a,b) =
  *    morpheme_a + morpheme_b, each morpheme 3 chars from a disjoint
  *    alphabet slice. Pair frequencies are then stratified by
  *    construction: intra-morpheme char pairs ride in 2·NMorph of the
  *    NMorph² words (freq ≈ n/6), the morpheme+</w> attach in NMorph
  *    words (≈ n/12), but any CROSS-BOUNDARY pair identifies one
  *    specific compound (≈ n/144) — an order of magnitude below. So the
  *    first 3·NMorph = 36 merges MUST all be morphology: greedy BPE
  *    provably rediscovers the planted morphemes before it ever crosses
  *    a boundary, and after exactly 36 merges EVERY vocabulary word
  *    segments as [morpheme_a, morpheme_b</w>].
  *  - the scale claim measured, not asserted: training touches the
  *    corpus ONCE (the word-count pass, corpus-sized) and every merge
  *    round runs on the 144-row vocabulary table — sec/round must not
  *    scale with nDocs (the artifact records both).
  *  - the committed artifact (dev/bpe_volume.json); BpeVolumeSpec
  *    asserts the same contract CI-sized.
  *
  * Usage: runMain graft.BpeVolume [nDocs]
  */
object BpeVolume {

  val Alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
  val NMorph = 12
  val WordsPerDoc = 8
  val Merges = 3 * NMorph

  def morpheme(m: Int): String = Alphabet.substring(3 * m, 3 * m + 3)

  /** The planted compound vocabulary, NMorph² words. */
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

  /** Every learned merge must be morphology: the merged symbol, </w>
    * stripped, is a contiguous substring of ONE morpheme (cross-boundary
    * symbols span disjoint alphabet slices and cannot be). */
  def allIntraUnit(model: Bpe.Model): Boolean =
    model.merges.forall { case (x, y) =>
      val s = (x + y).stripSuffix(Bpe.Eow)
      s.isEmpty || (0 until NMorph).exists(m => morpheme(m).contains(s))
    }

  /** After the full merge budget, every vocabulary word segments exactly
    * at its planted morpheme boundary. */
  def segmentsAtBoundaries(spark: SparkSession, model: Bpe.Model): Boolean = {
    import spark.implicits._
    val vocabDocs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    Bpe.encode(vocabDocs, model).collect().forall { r =>
      val w = r.getString(2)
      val subs = r.getSeq[String](3)
      subs == Seq(w.substring(0, 3), w.substring(3) + Bpe.Eow)
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
    // isolate the one corpus-sized pass from the vocab-bounded rounds
    val t0 = System.nanoTime()
    val nWords = Bpe.wordFreq(docs).count()
    val countSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val model = Bpe.train(docs, Merges)
    val trainSec = (System.nanoTime() - t1) / 1e9
    val intra = allIntraUnit(model)
    val seg = segmentsAtBoundaries(spark, model)
    // corpus ENCODE throughput under the trained model: the regex chain
    // runs once per distinct word, the broadcast join fans it back — so
    // this measures the deployment path, and the per-word symbol count
    // must land exactly at the planted 2 (one symbol per morpheme, the
    // boundary assertion aggregated over every occurrence)
    val t2 = System.nanoTime()
    val encStats = Bpe.encode(docs, model)
      .agg(count(lit(1)).as("words"), sum("n_subs").as("subs")).head()
    val encodeSec = (System.nanoTime() - t2) / 1e9
    val encWords = encStats.getLong(0)
    val symbolsPerWord = encStats.getLong(1).toDouble / encWords

    // the kernel's VOCABULARY-SIZE-INDEPENDENCE claim, measured: encode
    // the same corpus through bpe_encode at the trained 36 merges and
    // again with 5000 inert ladder merges appended (they touch a letter
    // this corpus never uses, so the output is identical — asserted via
    // the symbol total) — the chain would be a 5036-deep expression tree
    def kernelEncodeSec(m: Bpe.Model): (Double, Long) = {
      val t = System.nanoTime()
      val r = Bpe.wordFreq(docs)
        .select(col("word"), col("freq"),
          size(Bpe.encodeWordKernel(col("word"), m)).as("ns"))
        .agg(sum(col("freq") * col("ns")).cast("long")).head().getLong(0)
      ((System.nanoTime() - t) / 1e9, r)
    }
    val (kSec, kSubs) = kernelEncodeSec(model)
    val big = Bpe.Model(model.merges ++
      (1 until 2501).map(i => ("z" * i, "z")) ++
      (1 until 2501).map(i => ("Z" * i, "Z")))
    val (kSec5k, kSubs5k) = kernelEncodeSec(big)
    val ok = model.size == Merges && intra && seg &&
      encWords == nDocs * WordsPerDoc && symbolsPerWord == 2.0 &&
      kSubs == encStats.getLong(1) && kSubs5k == kSubs
    val line =
      f"""{"metric":"bpe_sec_per_merge_round","value":${
        trainSec / Merges}%.3f,"unit":"sec/round",""" +
      f""""n_docs":$nDocs,"n_tokens":${nDocs * WordsPerDoc},""" +
      f""""vocab_words":$nWords,"count_pass_sec":$countSec%.2f,""" +
      f""""train_sec":$trainSec%.2f,"merges":${model.size},""" +
      s""""all_intra_unit":$intra,"segments_at_boundaries":$seg,""" +
      f""""encode_sec":$encodeSec%.2f,""" +
      f""""encode_tokens_per_sec":${encWords / encodeSec}%.0f,""" +
      f""""symbols_per_word":$symbolsPerWord%.3f,""" +
      f""""kernel_vocab_sec":$kSec%.2f,""" +
      f""""kernel_vocab_sec_5036_merges":$kSec5k%.2f,""" +
      s""""all_ok":$ok}"""
    println(line)
    Artifacts.write("bpe_volume.json", line)
    spark.stop()
    if (!ok) { System.err.println("[bpevol] CONTRACT MISS"); sys.exit(1) }
  }
}
