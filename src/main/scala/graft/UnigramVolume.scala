package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.{Bpe, Unigram}

/** Volume proof for the unigram-LM tokenizer ([[graft.text.Unigram]],
  * SURVEY B9.62) — the [[BpeVolume]] discipline at ≥1M documents, PLUS
  * the cross-family comparison the operator exists for: BPE and unigram
  * trained on the SAME corpus to the SAME effective vocabulary, their
  * compression measured side by side.
  *
  * Corpus: compound words from [[NMorph]] 4-char morphemes on disjoint
  * alphabet slices — words are 8 code points, ABOVE the unigram
  * [[Unigram.MaxPieceLen]] cap, so whole-word memorization is impossible
  * and the likelihood optimum is the morphology. The planted contract:
  *
  *  - hard-EM keeps EXACTLY the 9 morphemes (every fragment and every
  *    crossing piece starves to zero Viterbi votes in round 1 — the
  *    EM concentration the soft-EM paper predicts, here a theorem of the
  *    count stratification: morpheme-containing segmentations dominate
  *    every word's lattice, so no other multi-char piece is ever voted);
  *  - every vocabulary word encodes as [morphemeA, morphemeB] — 2.0
  *    symbols/word EXACTLY, equal to BPE's after its 36-merge budget
  *    (4 merges per morpheme: 3 intra + 1 sentinel-attach), with a
  *    9-piece inventory vs BPE's 36 — the unigram model's compactness;
  *  - the scale claim measured: training touches the corpus ONCE (the
  *    word-count pass); every EM round runs on the distinct-word table
  *    (81 rows here however large nDocs grows), so sec/round must not
  *    scale with corpus size.
  *
  * Usage: runMain graft.UnigramVolume [nDocs]
  */
object UnigramVolume {

  val Alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
  val NMorph = 9
  val WordsPerDoc = 8
  val TargetMultis = 36 // = BPE's merge budget: the equal-vocab point
  val BpeMerges = 4 * NMorph

  def morpheme(m: Int): String = Alphabet.substring(4 * m, 4 * m + 4)

  val words: Seq[String] =
    for (a <- 0 until NMorph; b <- 0 until NMorph)
      yield morpheme(a) + morpheme(b)

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

  /** The trained multi-char inventory must be EXACTLY the morpheme set. */
  def multisAreMorphemes(model: Unigram.Model): Boolean =
    model.pieces.map(_._1)
      .filter(p => p.codePointCount(0, p.length) > 1)
      .toSet == (0 until NMorph).map(morpheme).toSet

  /** Every vocabulary word segments at its planted boundary. */
  def segmentsAtBoundaries(spark: SparkSession,
      model: Unigram.Model): Boolean = {
    import spark.implicits._
    val vocabDocs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    Unigram.encode(vocabDocs, model).collect().forall { r =>
      val w = r.getString(2)
      r.getSeq[String](3) == Seq(w.substring(0, 4), w.substring(4))
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

    val docs = corpus(spark, nDocs).localCheckpoint()
    val t0 = System.nanoTime()
    val nWords = Bpe.wordFreq(docs).count()
    val countSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val model = Unigram.train(docs, TargetMultis)
    val trainSec = (System.nanoTime() - t1) / 1e9
    val morph = multisAreMorphemes(model)
    val seg = segmentsAtBoundaries(spark, model)

    val t2 = System.nanoTime()
    val encStats = Unigram.encode(docs, model)
      .agg(count(lit(1)).as("words"), sum("n_subs").as("subs")).head()
    val encodeSec = (System.nanoTime() - t2) / 1e9
    val encWords = encStats.getLong(0)
    val uniSymbols = encStats.getLong(1)
    val uniSpw = uniSymbols.toDouble / encWords

    // the cross-family anchor: BPE on the same corpus to the same
    // effective vocabulary (its 36 merge symbols = the unigram budget)
    val t3 = System.nanoTime()
    val bpeModel = Bpe.train(docs, BpeMerges)
    val bpeTrainSec = (System.nanoTime() - t3) / 1e9
    val bpeSymbols = Bpe.totalSymbols(docs, bpeModel)
    // BPE carries the </w> sentinel as part of its final symbol — both
    // families land at 2 symbols per word on this corpus
    val bpeSpw = bpeSymbols.toDouble / encWords

    val ok = morph && seg && model.multis == NMorph &&
      encWords == nDocs * WordsPerDoc &&
      uniSpw == 2.0 && bpeSpw == 2.0 &&
      bpeModel.size == BpeMerges
    val line =
      f"""{"metric":"unigram_encode_tokens_per_sec","value":${
        encWords / encodeSec}%.0f,"unit":"tokens/s",""" +
      f""""n_docs":$nDocs,"n_tokens":${nDocs * WordsPerDoc},""" +
      f""""vocab_words":$nWords,"count_pass_sec":$countSec%.2f,""" +
      f""""train_sec":$trainSec%.2f,"target_multis":$TargetMultis,""" +
      f""""final_multis":${model.multis},""" +
      s""""multis_are_morphemes":$morph,"segments_at_boundaries":$seg,""" +
      f""""encode_sec":$encodeSec%.2f,""" +
      f""""unigram_symbols_per_word":$uniSpw%.3f,""" +
      f""""bpe_merges":$BpeMerges,"bpe_train_sec":$bpeTrainSec%.2f,""" +
      f""""bpe_symbols_per_word":$bpeSpw%.3f,""" +
      f""""unigram_vocab_vs_bpe":"${model.multis} vs ${bpeModel.size}",""" +
      s""""all_ok":$ok}"""
    println(line)
    Artifacts.write("unigram_volume.json", line)
    spark.stop()
    if (!ok) { System.err.println("[univol] CONTRACT MISS"); sys.exit(1) }
  }
}
