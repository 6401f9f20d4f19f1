package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Training-shard export ([[Export]]): determinism across partitionings,
  * exactly-once coverage, one file per shard, manifest integrity, and
  * agreement with the declared `export_shuffle` assignment. */
class ExportSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = graft.core.Tables.documents(spark, sfDir)
    .select("doc_id", "source", "text")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"export_$tag").toString

  test("two exports under different shuffle partitionings are " +
      "row-identical in assignment and order") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def export(parts: String): Seq[(Long, Long, Long, String)] = {
      spark.conf.set(key, parts)
      try {
        val d = tmp(s"p$parts")
        Export.writeShards(docs, d)
        Export.readShards(spark, d)
          .select(col("shard"), col("pos"), col("doc_id"), col("text"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getString(3))).toSeq
      } finally spark.conf.set(key, prev)
    }
    val a = export("2")
    val b = export("7")
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("every doc lands exactly once; one parquet file per shard dir; " +
      "manifest matches the re-read; pos is dense per shard") {
    val d = tmp("cov")
    val manifest = Export.writeShards(docs, d)
    val back = Export.readShards(spark, d)
    val n = docs.count()
    assert(back.count() === n)
    assert(back.select("doc_id").distinct().count() === n)
    // one file per shard directory
    val shardDirs = new java.io.File(d, "shards").listFiles()
      .filter(_.getName.startsWith("shard="))
    assert(shardDirs.length === Export.DefaultShards)
    assert(shardDirs.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) === 1))
    // manifest vs re-read, per shard
    val fromData = back.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        max("pos").as("max_pos"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val fromManifest = manifest.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(fromManifest === fromData)
    // pos dense 1..n_docs within each shard (max_pos == n_docs)
    assert(fromData.values.forall { case (nd, _, mp) => nd === mp })
  }

  test("the export carries the declared export_shuffle assignment") {
    val d = tmp("agree")
    Export.writeShards(docs, d)
    val fromExport = Export.readShards(spark, d)
      .select("doc_id", "shard", "pos").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val declared = graft.SparkEntry.queries("export_shuffle")(spark, sfDir)
      .select("doc_id", "shard", "pos").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(fromExport === declared)
  }
}
