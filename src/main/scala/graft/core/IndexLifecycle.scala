package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared plumbing of the persisted-index lifecycle (VERDICT r12 #6) —
  * the ~150–250 LoC of version staging / bucket-partitioned writes /
  * tombstone exclusion / monotonic-id guard that FpIndex, DecontIndex,
  * LineIndex, LexIndex (and the heavier Pq/SemDedup) each hand-rolled.
  * The FAMILY keeps its semantics — what a row means, how meta advances,
  * what retraction subtracts; this object owns only the mechanics, so
  * the next lifecycle bug is a one-place fix.
  *
  * The lifecycle contract every family states in its own scaladoc:
  *  - content lives under `dir/v<N>/<table>` partitioned by a hash
  *    bucket column; `dir/_CURRENT` resolves the published version
  *    ([[Versioned]]); the one-row meta publishes crash-safely
  *    ([[Meta]]);
  *  - build = stage a COMPLETE version, flip the pointer LAST
  *    ([[publishVersion]]);
  *  - append = single-writer fold-in under the monotonic-id guard
  *    ([[requireMonotonic]]) — a replayed shard fails loudly;
  *  - retract = tombstone ids; probes share one [[liveRows]] read path
  *    that anti-joins the tombstone set ONLY when one exists, so the
  *    takedown-free plan keeps its spec-pinned shape;
  *  - compact = rewrite the live rows into a fresh version via
  *    [[publishVersion]]; superseded versions are inert debris for
  *    [[Versioned.sweep]].
  */
object IndexLifecycle {

  /** One content table of an index version: subdir name + the hash-bucket
    * column its files are partitioned by (the static-prune key). */
  final case class Table(name: String, bucketCol: String)

  def pathExists(spark: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).exists(hp)
  }

  /** Stage a fresh COMPLETE version via `build(stagedRoot)` (content
    * tables + meta), then flip the pointer — readers resolve the old
    * version or the new one, never a mix; a crash mid-build leaves the
    * old version untouched and the staging dir as sweepable debris. */
  def publishVersion(spark: SparkSession, dir: String)
      (build: String => Unit): Unit = {
    val v = Versioned.nextVersion(spark, dir)
    build(s"$dir/$v")
    Versioned.publish(spark, dir, v)
  }

  /** Write `rows` as a version's content table — build/compact path
    * (errorifexists: a staged version is written exactly once). */
  def writeTable(rows: DataFrame, root: String, table: Table): Unit =
    rows.write.mode("errorifexists").partitionBy(table.bucketCol)
      .parquet(s"$root/${table.name}")

  /** Compaction form of [[writeTable]]: one file set per bucket
    * partition (the repartition collapses O(shards) append fragments). */
  def compactTable(rows: DataFrame, root: String, table: Table): Unit =
    writeTable(rows.repartition(col(table.bucketCol)), root, table)

  /** Fold shard rows into the CURRENT version's table (append path,
    * single-writer contract). */
  def appendTable(rows: DataFrame, root: String, table: Table): Unit =
    rows.write.mode("append").partitionBy(table.bucketCol)
      .parquet(s"$root/${table.name}")

  /** The monotonic-id ingest guard, verbatim across every family: shards
    * arrive in id order and never overlap, so mergeable-count appends
    * stay exact and a replayed shard fails loudly instead of
    * double-counting. */
  def requireMonotonic(shardMin: Long, maxSeen: Long, idCol: String): Unit =
    require(shardMin > maxSeen,
      s"monotonic-id ingest contract violated: shard min $idCol " +
        s"$shardMin <= index high-water mark $maxSeen")

  /** A version's content table minus tombstoned ids — the single read
    * path every probe shares. The anti-join (tombstones broadcast —
    * takedowns are k-bounded) appears only when a tombstone set exists,
    * so the takedown-free plan keeps its spec-pinned pruned-scan shape. */
  def liveRows(spark: SparkSession, root: String, table: Table,
      idCol: String): DataFrame = {
    val rows = spark.read.parquet(s"$root/${table.name}")
    if (!pathExists(spark, s"$root/tombstones")) rows
    else rows.join(
      broadcast(spark.read.parquet(s"$root/tombstones")
        .select(idCol).distinct()),
      Seq(idCol), "left_anti")
  }

  /** Already-tombstoned ids of a version (empty set when no takedown
    * happened) — what retraction idempotence filters against. */
  def tombstonedIds(spark: SparkSession, root: String,
      idCol: String): DataFrame = {
    if (!pathExists(spark, s"$root/tombstones")) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(idCol, LongType))))
    } else spark.read.parquet(s"$root/tombstones").select(idCol).distinct()
  }

  /** Record newly tombstoned ids (one id column; coalesced — takedowns
    * are k-bounded, one tiny file per event keeps the set listable). */
  def appendTombstones(ids: DataFrame, root: String): Unit =
    ids.coalesce(1).write.mode("append").parquet(s"$root/tombstones")

  /** Carry a version's tombstone set into a staged successor — for
    * families whose takedown idempotence must survive compaction (the
    * negated-count algebra: LineIndex). Families that drop tombstoned
    * rows physically start the new version with a clean set instead. */
  def carryTombstones(spark: SparkSession, oldRoot: String,
      newRoot: String): Unit =
    if (pathExists(spark, s"$oldRoot/tombstones"))
      spark.read.parquet(s"$oldRoot/tombstones").distinct()
        .coalesce(1).write.mode("errorifexists")
        .parquet(s"$newRoot/tombstones")
}
