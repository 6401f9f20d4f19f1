package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export — the pipeline's LAST step: write a curated
  * release to disk as the shard files a trainer streams. Everything a
  * 100 TB export needs is decided here and nowhere downstream:
  *
  *  - **Deterministic global shuffle** (`export_shuffle`'s assignment,
  *    B9.52): shard = md5-bucket of doc_id, within-shard order = md5 sort
  *    key — a pure function of doc_id, so two exports of the same release
  *    are IDENTICAL in shard membership and order regardless of cluster
  *    layout, partitioning, or run (no `rand()`, no load-order leakage),
  *    and any shard is re-derivable alone.
  *  - **One file per shard**: the write repartitions BY the shard column
  *    (each shard's rows land in exactly one task) and sorts within
  *    partitions on (shard, sort_key, doc_id) — a prefix that satisfies
  *    the partition-column ordering `partitionBy` needs, so the writer
  *    adds no extra sort and each `shard=` directory holds exactly one
  *    parquet file in within-shard order. Parallelism = shard count —
  *    set `nShards` to O(cluster) at scale (16 here keeps specs
  *    readable).
  *  - **The `pos` column carries the order in-band**: a reader that
  *    splits a file (or a filesystem that reorders) still reconstructs
  *    the exact training order by (shard, pos) — determinism lives in
  *    the DATA, not in file-layout accidents.
  *  - **A manifest written LAST** (`dir/manifest`): per-shard doc and
  *    whitespace-token counts from the same aggregation that fed the
  *    write, the trainer's integrity check (and the "did every shard
  *    arrive" gate on a multi-writer cluster).
  *
  * ExportSpec pins: two exports under different shuffle partitionings are
  * row-identical (assignment AND pos), every doc lands exactly once, one
  * file per shard directory, and the manifest matches a re-read.
  */
object Export {

  val DefaultShards = 16

  /** Shard assignment as Columns — the `export_shuffle` projection
    * (md5-bucket shard, md5 sort key, within-shard rank) for a given
    * shard count. */
  private def assigned(docs: DataFrame, nShards: Int): DataFrame = {
    val b = pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 2),
      16, 10).cast("long"), lit(256))
    val key = md5(col("doc_id").cast("string"))
    docs.withColumn("shard", pmod(b, lit(nShards)).cast("long"))
      .withColumn("sort_key", key)
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("shard")
          .orderBy("sort_key", "doc_id")).cast("long"))
  }

  /** Write `docs` (any schema with a `doc_id`) as training shards under
    * `dir` and return the manifest. The export is restartable by
    * deleting `dir` and re-running — same bytes of content either way. */
  def writeShards(docs: DataFrame, dir: String,
      nShards: Int = DefaultShards): DataFrame = {
    val spark = docs.sparkSession
    val a = assigned(docs, nShards)
    a.repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "sort_key", "doc_id")
      .write.mode("errorifexists").partitionBy("shard")
      .parquet(s"$dir/shards")
    // manifest from the assignment (not a re-read): written LAST, so its
    // presence certifies a complete export
    val m = a.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        max("pos").as("max_pos"))
      .orderBy("shard")
    m.coalesce(1).write.mode("errorifexists").parquet(s"$dir/manifest")
    spark.read.parquet(s"$dir/manifest")
  }

  /** Re-read an export in exact training order (shard, pos). The
    * `shard=` directory column comes back via partition inference as
    * INT — re-cast to the written LONG so round-trips are schema-stable. */
  def readShards(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/shards")
      .withColumn("shard", col("shard").cast("long"))
      .orderBy("shard", "pos")
}
