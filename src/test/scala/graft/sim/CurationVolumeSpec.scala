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
      "export verified — and the PQ-accelerated mode produces " +
      "IDENTICAL ledgers (margin-0 ADC is lossless)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_curvol_fs_ci").toString
    val fs = CurationVolume.runFullStack(spark, dir, releaseDocs = 5000L,
      shardDocs = 1200L, plants = 30)
    info(f"build ${fs.buildSec}%.1fs, ingest ${
      fs.shards.map(s => f"${s._2}%.1f").mkString("/")}s, " +
      f"compact ${fs.compactSec}%.1fs, export ${fs.exportDocs} docs")
    info(s"per-stage mean sec: ${fs.stageSec.map { case (n, s) =>
      f"$n=$s%.2f" }.mkString(" ")}")
    fs.shards.zipWithIndex.foreach { case ((lm, _), i) =>
      info(s"shard $i: $lm") }
    info(s"post-compact: ${fs.post}")
    assert(fs.ok,
      s"full-stack accounting failed: ${fs.shards.map(_._1)} / ${fs.post}")
    // the ledger order is the declared stage order, and the timer saw
    // every stage
    assert(fs.stageSec.map(_._1).toSet ==
      Set("quality", "decont", "line_clean", "class_filter", "exact",
        "substring", "near_dup", "semantic", "fold_in"))

    // VERDICT r13 #3: the same loop with PQ codes + margin-0 ADC
    // prefilter — per-row qerr certificates make it lossless, so every
    // verdict must be bit-identical; only the time may differ
    val pqDir = java.nio.file.Files
      .createTempDirectory("graft_curvol_fspq_ci").toString
    val pq = CurationVolume.runFullStack(spark, pqDir,
      releaseDocs = 5000L, shardDocs = 1200L, plants = 30,
      pqM = 4, pqMargin = Some(0.0))
    info(s"pq per-stage mean sec: ${pq.stageSec.map { case (n, s) =>
      f"$n=$s%.2f" }.mkString(" ")}")
    assert(pq.ok)
    assert(pq.shards.map(_._1) == fs.shards.map(_._1) &&
      pq.post == fs.post,
      "PQ-accelerated ledgers must equal the float-mode ledgers")
  }
}
