package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Volume proof for the Misra–Gries heavy-hitters aggregate
  * ([[graft.ops.HeavyHitters]], SURVEY B4.19) — the [[DedupVolume]]
  * discipline applied to the sketch: measured throughput at ≥10M tokens
  * with PLANTED ground truth, closing r11 what's-wrong #2 ("no volume
  * proof exists for this operator").
  *
  *  - corpus: `nTokens` rows, pure hash functions of the row id. Every
  *    5th row is one of [[NHeavy]] planted dominants (each exactly
  *    n/(5·NHeavy) = 2.5% of the stream); the rest is a ~[[TailCard]]-ary
  *    uniform tail — the worst case for a counter sketch (maximum counter
  *    churn, nothing cacheable).
  *  - one `agg(heavyHitters(tok, k))` with k = [[K]]: n/(k+1) ≈ 1.5% <
  *    2.5%, so the MG guarantee REQUIRES all planted dominants to
  *    surface, and the invariant est ≤ true ≤ est + Δ is checkable
  *    exactly because the construction fixes each dominant's true count.
  *  - the committed artifact (dev/hh_volume.json) records tokens/s of the
  *    million-row run; HhVolumeSpec asserts the same contract CI-sized.
  *
  * Usage: runMain graft.HhVolume [nTokens]
  */
object HhVolume {

  val K = 64
  val NHeavy = 8
  val TailCard = 2000000L

  /** One token per row: id % 5 == 0 → planted dominant `h<0..NHeavy)`,
    * else a hash-uniform tail token. Each dominant's exact true count is
    * the number of ids ≡ 0 (mod 5) with (id/5) % NHeavy = h — for
    * nTokens divisible by 5·NHeavy that is nTokens/(5·NHeavy) exactly. */
  def corpus(spark: SparkSession, nTokens: Long): DataFrame =
    spark.range(nTokens).select(
      when(col("id") % 5 === 0,
          concat(lit("h"), (col("id") / 5).cast("long") % NHeavy))
        .otherwise(concat(lit("t"), pmod(xxhash64(col("id")), lit(TailCard))))
        .as("tok"))

  /** Run the aggregate, check the planted-dominant contract, return
    * (elapsedSec, items found, n, maxError, allOk). */
  def measure(toks: DataFrame, nTokens: Long):
      (Double, Seq[(String, Long)], Long, Long, Boolean) = {
    val t0 = System.nanoTime()
    val row = toks.agg(graft.ops.HeavyHitters.heavyHitters(col("tok"), K)
      .as("hh")).select("hh.*").head()
    val sec = (System.nanoTime() - t0) / 1e9
    val n = row.getAs[Long]("n")
    val maxErr = row.getAs[Long]("maxError")
    val items = row
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("items")
      .toSeq.map(r => (r.getString(0), r.getLong(1)))
    val est = items.toMap
    val trueCount = nTokens / (5L * NHeavy)
    val ok = n == nTokens &&
      (0 until NHeavy).forall { h =>
        val e = est.getOrElse(s"h$h", 0L)
        e > 0L && e <= trueCount && trueCount <= e + maxErr
      }
    (sec, items, n, maxErr, ok)
  }

  def main(args: Array[String]): Unit = {
    val nTokens = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val toks = corpus(spark, nTokens).localCheckpoint() // exclude gen cost
    val (sec, items, n, maxErr, ok) = measure(toks, nTokens)
    val heavies = items.count(_._1.startsWith("h"))
    val line =
      f"""{"metric":"mg_tokens_per_sec","value":${nTokens / sec}%.0f,""" +
      f""""unit":"tokens/s","n_tokens":$n,"k":$K,"sec":$sec%.2f,""" +
      f""""n_heavy_planted":$NHeavy,"n_heavy_found":$heavies,""" +
      f""""stored_items":${items.size},"max_error":$maxErr,""" +
      s""""all_ok":$ok}"""
    println(line)
    Artifacts.write("hh_volume.json", line)
    spark.stop()
    if (!ok) { System.err.println("[hhvol] CONTRACT MISS"); sys.exit(1) }
  }
}
