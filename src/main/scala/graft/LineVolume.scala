package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Volume proof for line-level corpus dedup ([[graft.text.TextOps.lineDedup]],
  * the CCNet boilerplate-removal stage) — the [[FpVolume]]/[[DecontVolume]]
  * discipline: a MILLION-document corpus with PLANTED ground truth built so
  * the contract is a theorem, not a measurement:
  *
  *  - every doc carries [[DocLines]] unique lines `u<doc>_<p>` — INJECTIVE
  *    by construction (the doc id is part of the line), so each has df = 1
  *    and can never cross the threshold;
  *  - every 5th doc replaces the line at [[SpliceAt]] with one of
  *    [[NBp]] planted boilerplate lines (round-robin by doc id), giving
  *    each planted line df = nDocs/5/[[NBp]] ≫ minDf while every other
  *    line stays below it.
  *
  * Therefore: the mined boilerplate set must be EXACTLY the [[NBp]]
  * planted lines (recall 1.0 AND zero false boilerplate — both are set
  * identities), every planted doc must lose exactly its spliced line with
  * the cleaned text byte-equal to the expected reassembly, and every clean
  * doc must pass through verbatim. The run proves the guarantee at scale
  * and measures mine+clean docs/s; [[graft.text.LineVolumeSpec]] re-gates
  * the same theorem CI-sized on every `sbt test`.
  *
  * Usage: runMain graft.LineVolume [nDocs]
  */
object LineVolume {

  val DocLines = 8
  val SpliceAt = 2
  val NBp = 20

  private def uline(d: Column, p: Int): Column =
    concat(lit("u"), d.cast("string"), lit(s"_$p"))
  /** Planted docs are ids ≡ 0 (mod 5), so round-robin on id/5 — pmod(id,
    * NBp) would only ever hit gcd-limited residues on that sublattice. */
  private def bpLine(d: Column): Column =
    concat(lit("boilerplate footer "),
      pmod(d.cast("long") / 5, lit(NBp)).cast("string"))

  def corpus(spark: SparkSession, nDocs: Long): DataFrame = {
    val planted = pmod(col("id"), lit(5)) === 0
    val lines = (0 until DocLines).map { p =>
      if (p == SpliceAt) when(planted, bpLine(col("id")))
        .otherwise(uline(col("id"), p))
      else uline(col("id"), p)
    }
    spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws("\n", lines: _*).as("text"))
  }

  /** The expected cleaned text: all unique lines, minus the spliced slot
    * on planted docs, space-joined — computed in column space so the
    * equality check is one distributed comparison, no driver data. */
  def expectedCleaned(): Column = {
    val planted = pmod(col("doc_id"), lit(5)) === 0
    val all = (0 until DocLines).map(p => uline(col("doc_id"), p))
    val minusSplice = all.patch(SpliceAt, Nil, 1)
    when(planted, concat_ws(" ", minusSplice: _*))
      .otherwise(concat_ws(" ", all: _*))
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

    // mine: the set identity — exactly the NBp planted lines
    val t0 = System.nanoTime()
    val bp = TextOps.boilerplateLines(docs).localCheckpoint()
    val mineSec = (System.nanoTime() - t0) / 1e9
    val mined = bp.agg(count(lit(1)).as("n"),
      count(when(not(col("line").startsWith("boilerplate footer ")), 1))
        .as("alien"),
      min("df").as("min_df")).head()
    require(mined.getLong(0) == NBp.toLong,
      s"mined ${mined.getLong(0)} boilerplate lines, expected $NBp")
    require(mined.getLong(1) == 0L, "a unique line crossed the threshold")

    // clean: byte-exact reassembly on every doc
    val t1 = System.nanoTime()
    val cleaned = TextOps.lineDedup(docs)
    val bad = cleaned.agg(count(lit(1)).as("n"),
      count(when(col("cleaned") =!= expectedCleaned(), 1)).as("wrong"),
      count(when((pmod(col("doc_id"), lit(5)) === 0) =!=
        (col("n_kept") === DocLines - 1), 1)).as("acct")).head()
    val cleanSec = (System.nanoTime() - t1) / 1e9
    require(bad.getLong(0) == nDocs, s"row count ${bad.getLong(0)}")
    require(bad.getLong(1) == 0L,
      s"CLEANED TEXT DIVERGED on ${bad.getLong(1)} docs")
    require(bad.getLong(2) == 0L, "kept-line accounting wrong")

    // index-served path: persist the counts once, then the probe pays
    // only the read-time set aggregation + the broadcast cleaning join —
    // same byte-identities (probeShard replays the batch body VERBATIM)
    val dir = java.nio.file.Files.createTempDirectory("graft_linevol")
      .toString
    val t2 = System.nanoTime()
    text.LineIndex.writeIndex(docs, dir)
    val indexSec = (System.nanoTime() - t2) / 1e9
    val t3 = System.nanoTime()
    val probed = text.LineIndex.probeShard(docs, dir)
    val pbad = probed.agg(count(lit(1)).as("n"),
      count(when(col("cleaned") =!= expectedCleaned(), 1)).as("wrong"))
      .head()
    val probeSec = (System.nanoTime() - t3) / 1e9
    require(pbad.getLong(0) == nDocs && pbad.getLong(1) == 0L,
      s"INDEX-SERVED CLEANING DIVERGED on ${pbad.getLong(1)} docs")

    val line =
      f"""{"metric":"line_dedup_docs_per_sec","value":${nDocs / (mineSec + cleanSec)}%.0f,""" +
      f""""unit":"docs/s","n_docs":$nDocs,"n_lines":${nDocs * DocLines},""" +
      f""""n_bp_lines":$NBp,"min_bp_df":${mined.getLong(2)},""" +
      f""""mine_sec":$mineSec%.2f,"clean_sec":$cleanSec%.2f,""" +
      f""""index_build_sec":$indexSec%.2f,"index_probe_sec":$probeSec%.2f,""" +
      f""""bp_recall":1.0,"false_bp":0,"wrong_cleanings":0}"""
    println(line)
    Artifacts.write("line_volume.json", line)
    spark.stop()
  }
}
