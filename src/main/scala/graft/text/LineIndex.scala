package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{IndexLifecycle, Meta, Versioned}

/** Persisted boilerplate line-frequency index — the PRODUCTION form of
  * `text_line_dedup` (B9.55): mine per-line document frequencies ONCE,
  * persist them as a mergeable count index, and clean every incoming
  * corpus shard at shard cost. The CCNet loop: a crawl snapshot's lines
  * fold in as they arrive, and the boilerplate set — every line whose
  * ACCUMULATED df crosses the threshold — is re-derived from the index,
  * never from a corpus rescan.
  *
  * Index rows are `(pb, line, n)` partial doc-frequency counts, the
  * [[LmScore]] mergeable-count algebra: readers SUM, so
  *  - append = write the shard's partials (exact across shards because
  *    the monotonic-id contract makes shards doc-disjoint — a doc's
  *    distinct-line contribution lands exactly once);
  *  - retraction = append the retracted docs' partials NEGATED (the
  *    exact-subtraction trick): a taken-down doc's mass vanishes from
  *    every future threshold decision, and a line it alone pushed over
  *    minDf reverts to kept. Idempotent at doc granularity via a
  *    tombstone id list (a replayed takedown must not subtract twice);
  *  - compaction = re-aggregate to one row per line, DROP rows summing
  *    ≤ 0, one file per partition, fresh version, pointer flips LAST
  *    ([[Versioned]] — a crash leaves the old version fully readable).
  *
  * The raw line is the join key (byte-exact membership — a 64-bit
  * hash-only index would let a collision delete innocent text); at
  * petabyte scale swap the key to xxhash64(line) + accept the CCNet
  * collision odds, same algebra. `pb` hash-partitions the count table so
  * compaction writes and probe scans parallelize without skew.
  *
  * LineIndexSpec pins every leg: round-trip ≡ [[TextOps.boilerplateLines]],
  * append ≡ rebuild-over-union (+ replay trips the guard), retraction ≡
  * rebuild-without (+ replay no-op), compaction identity + physical drop,
  * empty-publish refusal, and the streaming probe-then-fold twin.
  */
object LineIndex {

  val PartBuckets = 16

  private val Lines = IndexLifecycle.Table("lines", "pb")

  private def writeMeta(spark: SparkSession, root: String,
      nDocs: Long, maxId: Long): Unit = {
    import spark.implicits._
    // crash-safe retire-then-replace publish (core/Meta, ADVICE r12)
    Meta.write(Seq((nDocs, maxId)).toDF("n_docs", "max_id"), root)
  }

  private def readMeta(spark: SparkSession, root: String): (Long, Long) = {
    val r = Meta.read(spark, root).head()
    (r.getLong(0), r.getLong(1))
  }

  /** One partial count row per (line, shard): the line's distinct-doc
    * frequency WITHIN `docs`. The digest-groupBy shape — shuffle bounded
    * by the shard's distinct lines. */
  private def countRows(docs: DataFrame): DataFrame =
    TextOps.docLines(docs)
      .groupBy("line")
      .agg(countDistinct("doc_id").as("n"))
      .withColumn("pb", pmod(xxhash64(col("line")), lit(PartBuckets)))

  /** Build and PUBLISH the index from a (doc_id, text) corpus. */
  def writeIndex(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val st = docs.agg(count(lit(1)),
      coalesce(max(col("doc_id").cast("long")), lit(-1L))).head()
    // an empty corpus would publish parquet dirs Spark cannot re-read —
    // and silently declare nothing boilerplate forever
    require(st.getLong(0) > 0L,
      "refusing to publish an EMPTY line index")
    IndexLifecycle.publishVersion(spark, dir) { root =>
      IndexLifecycle.writeTable(countRows(docs), root, Lines)
      writeMeta(spark, root, st.getLong(0), st.getLong(1))
    }
  }

  /** Fold a corpus shard into the published version. The monotonic-id
    * guard is what makes summed distinct-doc counts EXACT: shards are
    * doc-disjoint, so no doc is ever counted twice — and a replayed
    * shard fails loudly instead of double-counting. */
  def appendIndex(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val root = Versioned.resolveRoot(spark, dir)
    val (nDocs, maxSeen) = readMeta(spark, root)
    val st = docs.agg(count(lit(1)),
      min(col("doc_id").cast("long")),
      max(col("doc_id").cast("long"))).head()
    if (st.getLong(0) > 0L) {
      IndexLifecycle.requireMonotonic(st.getLong(1), maxSeen, "doc_id")
      IndexLifecycle.appendTable(countRows(docs), root, Lines)
      writeMeta(spark, root, nDocs + st.getLong(0), st.getLong(2))
    }
  }

  /** Take down documents: subtract their line counts exactly. The caller
    * supplies the retracted docs WITH text (a takedown carries content —
    * the counts to remove are derived, not guessed). Idempotent at doc
    * granularity: ids already tombstoned are skipped, so a replayed
    * takedown subtracts nothing twice. The high-water mark never rewinds
    * (a retracted id stays burned — re-adding the same content must
    * arrive under a fresh id, the monotonic-ingest contract). */
  def retract(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val root = Versioned.resolveRoot(spark, dir)
    val already = IndexLifecycle.tombstonedIds(spark, root, "doc_id")
    val fresh = docs
      .join(broadcast(already), Seq("doc_id"), "left_anti")
      .localCheckpoint() // two passes below must see ONE stable id set
    val (nDocs, maxId) = readMeta(spark, root)
    val n = fresh.count()
    if (n > 0L) {
      IndexLifecycle.appendTable(countRows(fresh).withColumn("n", -col("n")),
        root, Lines)
      IndexLifecycle.appendTombstones(
        fresh.select(col("doc_id").cast("long")), root)
      writeMeta(spark, root, nDocs - n, maxId)
    }
  }

  /** The served membership set: every line whose accumulated df ≥ minDf.
    * Read-time aggregation over all folded partials (distinct-line
    * bounded — the vocabulary-shaped small side every probe broadcasts). */
  def boilerplateSet(spark: SparkSession, dir: String,
      minDf: Long = 3): DataFrame = {
    val root = Versioned.resolveRoot(spark, dir)
    spark.read.parquet(s"$root/lines")
      .groupBy("line").agg(sum("n").cast("long").as("df"))
      .filter(col("df") >= minDf)
  }

  /** Clean a shard against the CURRENT boilerplate set —
    * [[TextOps.cleanAgainstBoilerplate]] VERBATIM, so the index-served
    * path and the declared `text_line_dedup` corpus-recompute cannot
    * drift (the DecontIndex probeShard ≡ probeCorpus argument). */
  def probeShard(docs: DataFrame, dir: String,
      minDf: Long = 3): DataFrame =
    TextOps.cleanAgainstBoilerplate(docs,
      boilerplateSet(docs.sparkSession, dir, minDf))

  /** Compact O(shards) partial rows to one row per line in a freshly
    * PUBLISHED version: fully-retracted lines sum to ≤ 0 and drop
    * physically (set identical — readers threshold at minDf ≥ 1 anyway),
    * one file per partition, the high-water mark carries, the pointer
    * flips LAST. Tombstones carry over so takedown idempotence survives
    * compaction. */
  def compactIndex(spark: SparkSession, dir: String): Unit = {
    val old = Versioned.resolveRoot(spark, dir)
    val (nDocs, maxId) = readMeta(spark, old)
    IndexLifecycle.publishVersion(spark, dir) { root =>
      IndexLifecycle.compactTable(
        spark.read.parquet(s"$old/lines")
          .groupBy("pb", "line").agg(sum("n").cast("long").as("n"))
          .filter(col("n") > 0L),
        root, Lines)
      IndexLifecycle.carryTombstones(spark, old, root)
      writeMeta(spark, root, nDocs, maxId)
    }
  }
}
