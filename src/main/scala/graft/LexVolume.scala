package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.LexIndex

/** Volume proof for the persisted BM25 inverted index
  * ([[graft.text.LexIndex]], SURVEY B9.49) — the [[FpVolume]] discipline
  * for the lexical modality: a million-doc index with PLANTED ground truth
  * whose expected search results are computed driver-side from the SAME
  * IEEE double tree the engine uses, so the volume gate is bit-exact
  * EQUALITY of the served top-k (ids, dl, AND scores), not a recall
  * estimate. Measures what serving costs at scale:
  *
  *  - corpus: `nCorpus` docs, 10 + (id % 20) base tokens drawn by hash
  *    from a 50k-term vocabulary (pure function of the row id — the
  *    generated-corpus posture of [[SubstringVolume]]); every 100th doc
  *    additionally carries the needle term `needleone` with tf cycling
  *    1→3. The needle's full posting list, df, and every doc's dl are
  *    thus KNOWN, and the BM25 top-k for the needle query is a driver
  *    computation, not a measurement.
  *  - probe vs re-scan: the SAME query served from the pruned index scan
  *    (`searchTopK` — reads ≤ |terms| of the 32 term buckets) and
  *    recomputed off the corpus (`searchCorpus` — tokenizes all nCorpus
  *    docs). The ratio is the reason the index exists; the generated
  *    corpus flatters the re-scan (pure compute, no parquet IO), so the
  *    reported speedup is a LOWER bound on the real one.
  *  - serving: `nQueries` two-term queries through ONE
  *    [[LexIndex.searchTopKBatch]] plan → queries/s.
  *  - ingest: a `nShard`-doc append (its own needle `needletwo` every
  *    50th doc), after which BOTH needles' expected top-k are recomputed
  *    against the ADVANCED corpus stats (n_docs, Σdl grew; needleone's
  *    df did not) and re-gated bit-exactly — df/avgdl freshness at
  *    volume, the property a stale-stats index silently violates.
  *
  * Usage: runMain graft.LexVolume [nCorpus] [nShard] [nQueries]
  */
object LexVolume {

  val Vocab = 50000

  /** Generated (doc_id, text) block: ids [start, start+n), base dl =
    * 10 + id % 20 hashed-vocabulary tokens, plus `tf = 1 + (j/every) % 3`
    * copies of `needle` on every `every`-th doc (j = id − start). Pure
    * column function of the id — distributed, nothing on the driver. */
  def docs(spark: SparkSession, start: Long, n: Long, needle: String,
      every: Int): DataFrame = {
    val j = col("id") - lit(start)
    val base = transform(
      sequence(lit(0), (lit(9) + pmod(col("id"), lit(20))).cast("int")),
      i => concat(lit("t"),
        pmod(xxhash64(col("id") * lit(131) + i.cast("long")),
          lit(Vocab)).cast("string")))
    val tfNeedle = when(pmod(j, lit(every)) === 0,
      (lit(1) + pmod((j / lit(every)).cast("long"), lit(3))).cast("int"))
      .otherwise(lit(0))
    spark.range(start, start + n).select(
      col("id").as("doc_id"),
      array_join(concat(base, array_repeat(lit(needle), tfNeedle)), " ")
        .as("text"))
  }

  /** Driver twin of the generator's needle planting: (doc_id, tf, dl)
    * for every planted doc in [start, start+n). */
  def plantedDocs(start: Long, n: Long, every: Int)
      : Seq[(Long, Int, Int)] =
    (0L until n by every.toLong).map { j =>
      val tf = 1 + (j / every % 3).toInt
      (start + j, tf, 10 + ((start + j) % 20).toInt + tf)
    }

  /** Σdl over a generated block — the base mass in closed form (start and
    * n multiples of 20 keep the id % 20 cycle whole) plus the planted
    * needle copies. */
  def sumDl(start: Long, n: Long, every: Int): Long = {
    require(start % 20 == 0 && n % 20 == 0 && n % every == 0,
      "block must align to the dl cycle and the planting stride")
    10L * n + (n / 20) * 190L +
      plantedDocs(start, n, every).map(_._2.toLong).sum
  }

  /** The expected single-needle top-k — [[LexIndex]]'s BM25 tree verbatim
    * in driver doubles (same IEEE op order → bit-equal scores), ranked
    * (score desc, doc_id asc): rows (doc_id, dl, n_hit = 1, score). */
  def expectedTopK(planted: Seq[(Long, Int, Int)], nDocs: Long,
      sumDl: Long, k: Int): Seq[(Long, Int, Long, Double)] = {
    val nD = nDocs.toDouble
    val dfD = planted.size.toDouble
    val avgdl = sumDl.toDouble / nD
    planted.map { case (id, tf, dl) =>
      val t = tf.toDouble
      val w = ((nD - dfD + 0.5) / (dfD + 0.5)) *
        ((t * 2.2) / (t + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl))))
      (id, dl, 1L, 0.0 + w) // the fold's 0.0 seed, kept for bit honesty
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(k)
  }

  def collectTopK(df: DataFrame): Seq[(Long, Int, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq

  def main(args: Array[String]): Unit = {
    val nCorpus = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nShard = args.drop(1).headOption.map(_.toLong).getOrElse(100000L)
    val nQueries = args.drop(2).headOption.map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft_lexvol")
      .toString
    val corpusDf = docs(spark, 0L, nCorpus, "needleone", 100)

    val t0 = System.nanoTime()
    LexIndex.writeIndex(corpusDf, dir)
    val buildSec = (System.nanoTime() - t0) / 1e9

    // warm the index read path (parquet reader init, codegen) with a
    // throwaway term so probe_sec measures steady-state serving, not
    // first-read setup — the generated corpus never touches parquet, so
    // without this the re-scan leg is unfairly pre-warmed
    collectTopK(LexIndex.searchTopK(spark, dir, Seq("t1"), 1))

    // planted-needle equality, index-served
    val planted1 = plantedDocs(0L, nCorpus, 100)
    val expect1 = expectedTopK(planted1, nCorpus, sumDl(0L, nCorpus, 100),
      100)
    val t1 = System.nanoTime()
    val got1 = collectTopK(
      LexIndex.searchTopK(spark, dir, Seq("needleone"), 100))
    val probeSec = (System.nanoTime() - t1) / 1e9
    val match1 = got1 == expect1

    // the same query recomputed off the corpus — the ratio the index buys
    val t2 = System.nanoTime()
    val scan1 = collectTopK(
      LexIndex.searchCorpus(corpusDf, Seq("needleone"), 100))
    val scanSec = (System.nanoTime() - t2) / 1e9
    val matchScan = scan1 == expect1

    // batch serving: nQueries two-term vocabulary queries, ONE plan
    val queriesDf = (0 until nQueries).map(q =>
        (q.toLong, Seq(s"t${q * 7919 % Vocab}", s"t${q * 104729 % Vocab}")))
      .toDF("qid", "terms").localCheckpoint()
    val t3 = System.nanoTime()
    val nServed = LexIndex.searchTopKBatch(spark, queriesDf, dir, 10)
      .count()
    val batchSec = (System.nanoTime() - t3) / 1e9

    // ingest a shard, then BOTH needles against the advanced stats
    val t4 = System.nanoTime()
    LexIndex.appendIndex(
      docs(spark, nCorpus, nShard, "needletwo", 50), dir)
    val appendSec = (System.nanoTime() - t4) / 1e9
    val nDocs2 = nCorpus + nShard
    val sumDl2 = sumDl(0L, nCorpus, 100) + sumDl(nCorpus, nShard, 50)
    val expect1b = expectedTopK(planted1, nDocs2, sumDl2, 100)
    val got1b = collectTopK(
      LexIndex.searchTopK(spark, dir, Seq("needleone"), 100))
    val planted2 = plantedDocs(nCorpus, nShard, 50)
    val expect2 = expectedTopK(planted2, nDocs2, sumDl2, 100)
    val got2 = collectTopK(
      LexIndex.searchTopK(spark, dir, Seq("needletwo"), 100))
    val matchAfter = got1b == expect1b && got2 == expect2

    val root = graft.core.Versioned.resolveRoot(spark, dir)
    val nPostings = spark.read.parquet(s"$root/postings").count()
    val bytes = {
      def sizeOf(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(sizeOf).sum).getOrElse(0L)
      sizeOf(new java.io.File(root))
    }

    val line =
      f"""{"metric":"lex_batch_queries_per_sec","value":${nQueries / batchSec}%.0f,""" +
      f""""unit":"q/s","n_corpus":$nCorpus,"n_shard":$nShard,""" +
      f""""n_queries":$nQueries,"build_sec":$buildSec%.2f,""" +
      f""""probe_sec":$probeSec%.3f,"scan_sec":$scanSec%.2f,""" +
      f""""probe_speedup":${scanSec / probeSec}%.1f,""" +
      f""""batch_sec":$batchSec%.2f,"append_sec":$appendSec%.2f,""" +
      f""""n_served_rows":$nServed,"n_postings":$nPostings,""" +
      f""""index_bytes":$bytes,"bytes_per_posting":${bytes.toDouble / nPostings}%.1f,""" +
      f""""planted_exact":$match1,"scan_exact":$matchScan,""" +
      f""""post_append_exact":$matchAfter}"""
    println(line)
    Artifacts.write("lex_volume.json", line)
    spark.stop()
    if (!(match1 && matchScan && matchAfter)) {
      System.err.println("[lexvol] PLANTED EQUALITY VIOLATED: " +
        s"pre=$match1 scan=$matchScan post=$matchAfter\n" +
        s"  expect1=${expect1.take(3)}\n  got1=${got1.take(3)}")
      sys.exit(1)
    }
  }
}
