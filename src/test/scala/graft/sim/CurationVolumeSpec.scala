package graft.sim

import graft.{CurationVolume, SparkSpec}

/** CI-scale gate for the release-loop volume proof
  * ([[graft.CurationVolume]], committed artifact
  * dev/curation_volume.json): on the walk corpus every planted category
  * dies in exactly its own stage — junk at quality (all-OOV → 0.0),
  * copies at exact, prefixes at substring (dup_frac 1.0 vs the 0.99
  * cut), appended-token near-dups at MinHash — and the fresh walks all
  * survive, across every shard and again after compaction. */
class CurationVolumeSpec extends SparkSpec {

  test("release-loop volume contract at CI scale: every planted drop " +
      "accounted for by stage, loop survives compaction") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_curvol_ci").toString
    val (buildSec, shards, compactSec, post, ok) =
      CurationVolume.run(spark, dir, releaseDocs = 5000L,
        shardDocs = 1200L, plants = 50)
    info(f"build $buildSec%.1fs, ingest ${
      shards.map(s => f"${s._2}%.1f").mkString("/")}s, " +
      f"compact $compactSec%.1fs")
    shards.zipWithIndex.foreach { case ((lm, _), i) =>
      info(s"shard $i: $lm") }
    info(s"post-compact: $post")
    assert(ok, s"per-stage accounting failed: ${shards.map(_._1)} / $post")
  }

  test("FULL-STACK release loop at CI scale: all eight stages on " +
      "(quality + decont + line-clean + class-filter + exact + " +
      "substring + minhash + semantic), one planted kill per stage, " +
      "export verified") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_curvol_fs_ci").toString
    val (buildSec, shards, compactSec, post, exportDocs, ok) =
      CurationVolume.runFullStack(spark, dir, releaseDocs = 5000L,
        shardDocs = 1200L, plants = 30)
    info(f"build $buildSec%.1fs, ingest ${
      shards.map(s => f"${s._2}%.1f").mkString("/")}s, " +
      f"compact $compactSec%.1fs, export $exportDocs docs")
    shards.zipWithIndex.foreach { case ((lm, _), i) =>
      info(s"shard $i: $lm") }
    info(s"post-compact: $post")
    assert(ok,
      s"full-stack accounting failed: ${shards.map(_._1)} / $post")
  }
}
