package graft.ops

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Incremental quantiles over PERSISTED KLL sketches — the third leg of
  * the incremental-analytics trio (near-dup index: [[graft.sim.IncrementalDedup]];
  * distinct counts: [[IncrementalDistinct]]): per-(day, type) KLL quantile
  * sketches (DataSketches, bundled with Spark for its `hll_*` functions)
  * are built in ONE pass over each arriving day and appended under the
  * day's partition; any later day-range × type window answers p50/p95/p99
  * by merging kB sketches — never re-scanning fact data. KLL merge is
  * associative with bounded rank error (k=200 ⇒ ~1.65% single-sided), so
  * the per-day decomposition loses nothing over a monolithic build.
  *
  * Shapes: the build is `repartition(day, type)` + one `mapPartitions`
  * pass updating heap sketches per group — one exchange, no per-row
  * serialization, payloads never on the driver. The window query merges
  * the (days × types)-row sketch table through a typed `Aggregator` whose
  * per-row deserialize cost is paid at sketch-table cardinality, not fact
  * cardinality; quantile extraction is a typed flatMap (no UDF — the
  * repo's zero-scalar-UDF policy holds).
  *
  * TEST-only (SURVEY §7.5.7 — approximate); SketchSpec pins rank accuracy
  * against exact order statistics, append-only immutability, and
  * partition-pruned sketch reads.
  */
object QuantileSketch {

  val DefaultK = 200

  /** Merge KLL sketch blobs; buffer/output are serialized sketch bytes, so
    * the encoders are plain BINARY. Row count here is the sketch-table
    * size (days × types) — tiny — which is what makes per-row
    * heapify+merge acceptable. */
  class KllMerge(k: Int)
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def des(b: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(b))
    private def mrg(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val s = KllDoublesSketch.newHeapInstance(k)
      s.merge(des(a)); s.merge(des(b))
      s.toByteArray
    }
    override def zero: Array[Byte] =
      KllDoublesSketch.newHeapInstance(k).toByteArray
    override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] =
      mrg(buf, in)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      mrg(a, b)
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Name of the per-day completion marker. Leading underscore keeps it
    * invisible to parquet file listings (Spark's FileIndex skips `_`/`.`
    * files), so the marker never pollutes reads of the sketch table. */
  private val CommitMarker = "_graft_day_committed"

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Day partitions COMMITTED under `path` — the executable form of the
    * once-per-day contract. Bare directory existence is NOT enough: a
    * killed append can leave a partially-listed day= directory, and
    * treating it as done would skip that day forever with no error
    * (ADVICE r8). A day counts only when its [[CommitMarker]] exists —
    * written strictly AFTER the job commit in [[appendDailySketches]].
    * The check is ONE recursive listing of the SKETCH table (days × a few
    * sketch files, not facts) filtered for marker entries — not a
    * per-day= `exists` probe, which would cost N round-trips per append
    * on an object store (ADVICE r9). */
  private def existingDays(spark: SparkSession, path: String): Set[String] = {
    val (fs, p) = fsOf(spark, path)
    if (!fs.exists(p)) return Set.empty
    val out = Set.newBuilder[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next().getPath
      val parent = f.getParent.getName
      if (f.getName == CommitMarker && parent.startsWith("day="))
        out += parent.substring(4)
    }
    out.result()
  }

  /** One sketch row per (day, event_type) of `value`, appended under the
    * day's partition — history is immutable. Unlike the HLL distinct index,
    * re-appending a day here is NOT harmless: KLL is a weighted sample, so
    * duplicate sketches would double that day's weight in every window
    * estimate. The once-per-day contract is therefore ENFORCED here, not
    * deferred to an external ledger: days whose partition already exists
    * are idempotently skipped (a second append of the same batch is a
    * no-op), and the returned set names the days actually written.
    * Partial-day batches remain the caller's responsibility — the unit of
    * idempotence is the day.
    *
    * Crash safety, SINGLE-WRITER assumed (concurrent appenders would race
    * the recovery delete below — serialize appends externally, e.g. one
    * ingest job per table, the normal shape for a daily index build):
    * a day is committed only once its [[CommitMarker]] lands, strictly
    * after the parquet job commit. An append that dies mid-write leaves
    * an UNMARKED day= directory; the retry deletes that partial directory
    * before re-appending, so the day is rebuilt whole — never skipped
    * forever, never double-weighted. */
  def appendDailySketches(events: DataFrame, path: String,
      k: Int = DefaultK): Set[String] = {
    val spark = events.sparkSession
    import spark.implicits._
    val done = existingDays(spark, path)
    val fresh = events
      .withColumn("day", to_date(col("ts")).cast("string"))
      .filter(if (done.isEmpty) lit(true)
        else !col("day").isin(done.toSeq: _*))
    // the day probe is a column-pruned scan of the incoming batch only —
    // the price of reporting (and short-circuiting) skipped days
    val days = fresh.select("day").distinct()
      .collect().map(_.getString(0)).toSet
    if (days.nonEmpty) {
      val (fs, root) = fsOf(spark, path)
      // recovery: an unmarked day= directory is a dead append's debris
      // (its marker would exist otherwise) — remove it before rewriting
      days.foreach { d =>
        val dir = new org.apache.hadoop.fs.Path(root, s"day=$d")
        if (fs.exists(dir)) fs.delete(dir, true)
      }
      fresh
        .select(col("day"), col("event_type"), col("value"))
        .repartition(col("day"), col("event_type"))
        .as[(String, String, Double)]
        .mapPartitions { it =>
          val m = scala.collection.mutable.HashMap
            .empty[(String, String), (KllDoublesSketch, Long)]
          it.foreach { case (d, t, v) =>
            val (sk, n) = m.getOrElseUpdate((d, t),
              (KllDoublesSketch.newHeapInstance(k), 0L))
            sk.update(v)
            m((d, t)) = (sk, n + 1)
          }
          m.iterator.map { case ((d, t), (sk, n)) =>
            (d, t, n, sk.toByteArray)
          }
        }
        .toDF("day", "event_type", "n_values", "sketch")
        .write.mode("append").partitionBy("day").parquet(path)
      // job committed → publish each day atomically (marker create is one
      // filesystem op; a crash between write and marker re-runs the day)
      days.foreach { d =>
        fs.create(new org.apache.hadoop.fs.Path(root,
          s"day=$d/$CommitMarker"), true).close()
      }
    }
    days
  }

  /** The sketch table, optionally day-bounded (bounds land on the
    * partition column → pruned read). */
  def sketches(spark: SparkSession, path: String,
      fromDay: Option[String] = None, toDay: Option[String] = None): DataFrame = {
    val t = spark.read.parquet(path)
    val lo = fromDay.map(d => col("day") >= lit(d)).getOrElse(lit(true))
    val hi = toDay.map(d => col("day") <= lit(d)).getOrElse(lit(true))
    t.filter(lo && hi)
  }

  /** `(event_type, p, value)` quantile estimates per type over a day
    * window — one sketch merge per type, quantiles pulled in a typed
    * flatMap. */
  def quantilesByType(spark: SparkSession, path: String, probs: Seq[Double],
      fromDay: Option[String] = None, toDay: Option[String] = None,
      k: Int = DefaultK): DataFrame = {
    import spark.implicits._
    val mergeFn = udaf(new KllMerge(k), Encoders.BINARY)
    sketches(spark, path, fromDay, toDay)
      .groupBy("event_type").agg(mergeFn(col("sketch")).as("sk"))
      .as[(String, Array[Byte])]
      .flatMap { case (t, bytes) =>
        val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
        probs.map(p => (t, p, sk.getQuantile(p)))
      }
      .toDF("event_type", "p", "value")
      .orderBy("event_type", "p")
  }
}
