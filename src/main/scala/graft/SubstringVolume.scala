package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.SubstringDedup

/** Volume proof for the substring-dedup subsystem (VERDICT r8 next-round
  * #2): the fw raw path has a measured throughput artifact (RawLogBench);
  * this is the same discipline for the passage pipeline — a generated
  * million-doc corpus with PLANTED cross-doc passages driven through
  * whole-corpus [[SubstringDedup.dupSpans]] and the bucketed incremental
  * probe [[SubstringDedup.shardDupSpansBucketed]], reporting MB/s,
  * planted-span recall, and the probe plan's exchange count — turning the
  * "linear, bucketed, no index shuffle" 100 TB posture into numbers.
  *
  * The corpus is a pure function of the row id (no files, no RNG state):
  * every doc gets [[BaseTokens]] hash-derived filler tokens from a 3M-word
  * vocabulary (an 8-gram collision between two fillers needs 8 consecutive
  * hash equalities — never happens at this scale), and every
  * [[PlantEvery]]-th doc appends one of [[SubstringVolume.main]]'s
  * `nPassages` shared passages. Ground truth is therefore exact: each
  * planted doc must report the single island (span_start = BaseTokens+1,
  * span_len = PassageTokens), with n_sharers = its passage's doc count —
  * so "recall at volume" is a strict equality check, not a statistic.
  * SubstringVolumeSpec asserts it at a CI-sized corpus; the committed
  * artifact (dev/substring_volume.json) records the million-doc run.
  *
  * Usage: runMain graft.SubstringVolume [nDocs] [nPassages] [workDir]
  */
object SubstringVolume {

  val K = 8
  val BaseTokens = 24
  val PassageTokens = 10
  val PlantEvery = 4

  /** Deterministic corpus: (doc_id, text). Docs with doc_id ≡ 0 (mod
    * [[PlantEvery]]) carry passage `(doc_id / PlantEvery) mod nPassages`
    * appended after the filler, so each passage recurs in
    * ~nDocs/(PlantEvery·nPassages) distinct documents. */
  def corpus(spark: SparkSession, nDocs: Long, nPassages: Long): DataFrame = {
    val id = col("id")
    val base = concat_ws(" ", (1 to BaseTokens).map(i =>
      concat(lit("w"), pmod(xxhash64(id, lit(i)), lit(3000000L)))): _*)
    val pid = pmod(id / PlantEvery, lit(nPassages))
    val passage = concat_ws(" ", (1 to PassageTokens).map(j =>
      concat(lit("p"), pid, lit("x"), lit(j))): _*)
    spark.range(nDocs).select(id.as("doc_id"),
      when(id % PlantEvery === 0, concat(base, lit(" "), passage))
        .otherwise(base).as("text"))
  }

  /** (planted docs, docs reporting exactly the planted span, other spans).
    * Exact-match recall: the planted island is the ONLY duplication in a
    * planted doc, at a position known by construction. */
  def plantedRecall(spans: DataFrame, nDocs: Long): (Long, Long, Long) = {
    val planted = (nDocs + PlantEvery - 1) / PlantEvery
    val hits = spans.filter(col("doc_id") % PlantEvery === 0
        && col("span_start") === BaseTokens + 1
        && col("span_len") === PassageTokens).count()
    (planted, hits, spans.count() - hits)
  }

  private def exchanges(df: DataFrame): Int =
    "Arguments: hashpartitioning".r.findAllIn(
      df.queryExecution.explainString(org.apache.spark.sql.execution
        .ExplainMode.fromString("formatted"))).size

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1200000L)
    val nPassages = args.lift(1).map(_.toLong).getOrElse(50000L)
    val workDir = args.lift(2).getOrElse("/tmp/graft_subvol")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", s"$workDir/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // materialize to parquet so the measured pipeline reads real files
    // (scan + decode included in MB/s, like the fw volume proof)
    val corpusPath = s"$workDir/corpus"
    corpus(spark, nDocs, nPassages)
      .write.mode("overwrite").parquet(corpusPath)
    val docs = spark.read.parquet(corpusPath)
    val bytes = docs.select(sum(length(col("text")) + lit(1)))
      .head.getLong(0)
    val mb = bytes / 1e6

    // whole-corpus span detection
    val t0 = System.nanoTime()
    val spans = SubstringDedup.dupSpans(docs, K).localCheckpoint()
    val nSpans = spans.count()
    val corpusSec = (System.nanoTime() - t0) / 1e9
    val (planted, hits, spurious) = plantedRecall(spans, nDocs)

    // incremental form: index the first 90%, probe the last 10% through
    // the bucketed table (the no-index-shuffle 100 TB shape)
    val split = nDocs * 9 / 10
    val table = "substring_volume_idx"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val t1 = System.nanoTime()
    SubstringDedup.appendShingleIndexBucketed(
      docs.filter(col("doc_id") < split), K, table)
    val indexSec = (System.nanoTime() - t1) / 1e9
    val shard = docs.filter(col("doc_id") >= split)
    val shardMb = shard.select(sum(length(col("text")) + lit(1)))
      .head.getLong(0) / 1e6
    val t2 = System.nanoTime()
    val probe = SubstringDedup.shardDupSpansBucketed(shard, K, table,
      estShardGrams = nDocs * 4)
    val nProbeSpans = probe.count()
    val probeSec = (System.nanoTime() - t2) / 1e9
    val nExchanges = exchanges(probe)
    spark.sql(s"DROP TABLE IF EXISTS $table")

    val line =
      f"""{"metric":"substring_mb_per_sec","value":${mb / corpusSec}%.1f,""" +
      f""""unit":"MB/s","mb":$mb%.1f,"sec":$corpusSec%.2f,"docs":$nDocs,""" +
      f""""spans":$nSpans,"planted":$planted,"recall_hits":$hits,""" +
      f""""spurious":$spurious,"index_sec":$indexSec%.2f,""" +
      f""""probe_mb":$shardMb%.1f,"probe_sec":$probeSec%.2f,""" +
      f""""probe_mb_per_sec":${shardMb / probeSec}%.1f,""" +
      s""""probe_spans":$nProbeSpans,"probe_exchanges":$nExchanges,""" +
      s""""recall_exact":${hits == planted}}"""
    println(line)
    Artifacts.write("substring_volume.json", line)
    spark.stop()
    if (hits != planted) {
      System.err.println(s"[subvol] RECALL MISS: $hits/$planted")
      sys.exit(1)
    }
  }
}
