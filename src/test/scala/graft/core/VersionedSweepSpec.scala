package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Retention sweep over the versioned-index layout ([[Versioned.sweep]],
  * VERDICT r12 #3): superseded versions and dead staging dirs are
  * deleted, the published version is untouchable at every crash point,
  * and the reclaimable-bytes accounting ties out. Exercised both on raw
  * Versioned layouts (crash injection by hand) and end-to-end through a
  * real index family ([[graft.sim.FpIndex]] compaction) with probe
  * verdicts pinned across the sweep. */
class VersionedSweepSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_sweep_$tag").toString

  private def fs(p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def versionDirs(path: String): Set[String] =
    fs(path).listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.matches("v\\d+")).toSet

  /** Publish one content row under the next version of `path`. */
  private def publishVersion(path: String, payload: Long): String = {
    val v = Versioned.nextVersion(spark, path)
    Seq(payload).toDF("x").write.parquet(s"$path/$v/data")
    Versioned.publish(spark, path, v)
    v
  }

  test("sweep deletes superseded and staged versions, keeps the " +
      "published one, and reports the freed bytes") {
    val dir = tmp("basic")
    publishVersion(dir, 1L) // v1 — superseded below
    publishVersion(dir, 2L) // v2 — published
    // a dead staging dir: a build that crashed before its pointer flip
    Seq(3L).toDF("x").write.parquet(s"$dir/v3/data")
    assert(versionDirs(dir) === Set("v1", "v2", "v3"))

    val expected = Versioned.reclaimableBytes(spark, dir)
    assert(expected > 0L)
    val (n, bytes) = Versioned.sweep(spark, dir)
    assert(n === 2, "v1 (superseded) and v3 (dead staging) must go")
    assert(bytes === expected,
      "sweep must free exactly what reclaimableBytes promised")
    assert(versionDirs(dir) === Set("v2"))
    assert(Versioned.reclaimableBytes(spark, dir) === 0L)
    // the published content is fully readable after the sweep
    assert(spark.read.parquet(
      s"${Versioned.resolveRoot(spark, dir)}/data").head().getLong(0) === 2L)
    // idempotent: a second sweep is a no-op
    assert(Versioned.sweep(spark, dir) === ((0, 0L)))
  }

  test("an interrupted sweep is harmless: published version readable, " +
      "next version numbering monotonic, re-sweep finishes the job") {
    val dir = tmp("crash")
    publishVersion(dir, 1L)
    publishVersion(dir, 2L)
    // crash mid-sweep: v1's content went but the dir itself survived
    // (recursive delete interrupted partway)
    val f = fs(dir)
    f.delete(new org.apache.hadoop.fs.Path(s"$dir/v1/data"), true)
    assert(versionDirs(dir) === Set("v1", "v2"))
    // readers are untouched
    assert(spark.read.parquet(
      s"${Versioned.resolveRoot(spark, dir)}/data").head().getLong(0) === 2L)
    // the remnant still counts for numbering — a new build cannot land
    // on top of it
    assert(Versioned.nextVersion(spark, dir) === "v3")
    // the next sweep clears the remnant
    val (n, _) = Versioned.sweep(spark, dir)
    assert(n === 1)
    assert(versionDirs(dir) === Set("v2"))
  }

  test("sweep on unversioned or empty paths is a no-op") {
    assert(Versioned.sweep(spark, tmp("empty")) === ((0, 0L)))
    val dir = tmp("unpub")
    Seq(1L).toDF("x").write.parquet(s"$dir/v1/data") // staged, never published
    assert(Versioned.sweep(spark, dir) === ((0, 0L)),
      "no published pointer -> nothing is provably superseded, keep all")
    assert(Versioned.reclaimableBytes(spark, dir) === 0L)
  }

  test("sweepRelease clears every curation family's superseded versions " +
      "and the loop keeps ingesting afterwards") {
    import graft.sim.Curation
    val dir = tmp("rel")
    val release = (0L until 400L)
      .map(i => (i, "rel", s"r$i a b c d e f g h i j k l m n o p q r"))
      .toDF("doc_id", "source", "text").localCheckpoint()
    Curation.writeIndexes(release, None, dir, lmQuality = true)
    Curation.compactRelease(spark, dir) // leaves v1 superseded everywhere
    val before = Curation.manifest(spark, dir)
      .agg(sum("reclaimable_bytes").cast("long")).head().getLong(0)
    assert(before > 0L, "compaction must leave reclaimable versions")
    val swept = Curation.sweepRelease(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(Seq("exact", "substring", "minhash", "lm")
      .forall(c => swept(c)._1 >= 1 && swept(c)._2 > 0L),
      s"each built family must shed its superseded version: $swept")
    assert(swept("semantic") === ((0, 0L)), "no semantic index was built")
    assert(Curation.manifest(spark, dir)
      .agg(sum("reclaimable_bytes").cast("long")).head().getLong(0) === 0L)
    // the loop is unharmed: a shard ingests against the swept release
    val shard = Seq((1000L, "shard", "r7 a b c d e f g h i j k l m n o p q r"),
        (1001L, "shard", "fresh unique words entirely new content here ok"))
      .toDF("doc_id", "source", "text")
    val r = Curation.ingestShard(shard, None, dir, lmMinScore = None)
    assert(r.kept.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(1001L), "exact copy must still drop after the sweep")
  }

  test("end-to-end through FpIndex: compact then sweep; probe verdicts " +
      "unchanged and only the compacted version remains") {
    import graft.sim.FpIndex
    val dir = tmp("fp")
    val corpus = (0L until 100L).map(i => (i, i * 0x9E3779B97F4A7C15L))
      .toDF("id", "fp").select(col("id"), pmod(col("fp"), lit(Long.MaxValue))
        .as("fp"))
    FpIndex.writeIndex(corpus, dir)                       // v1
    FpIndex.retract(spark, dir, Seq(3L, 7L))
    FpIndex.compactIndex(spark, dir)                      // v2 published
    val probeFps = (0L until 100L by 10L).map(i =>
      (10000L + i, i * 0x9E3779B97F4A7C15L)).toDF("id", "fp")
      .select(col("id"), pmod(col("fp"), lit(Long.MaxValue)).as("fp"))
    val before = FpIndex.probe(spark, probeFps, dir).collect().toSet
    assert(versionDirs(dir) === Set("v1", "v2"))

    val (n, bytes) = Versioned.sweep(spark, dir)
    assert(n === 1 && bytes > 0L)
    assert(versionDirs(dir) === Set("v2"))
    assert(FpIndex.probe(spark, probeFps, dir).collect().toSet === before,
      "probe verdicts must be identical after the retention sweep")
  }
}
