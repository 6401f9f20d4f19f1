package graft.core

import org.apache.spark.sql.SparkSession

/** Versioned atomic-publish layout for persisted indexes — the r10
  * [[graft.sim.SemDedup]] pattern, factored out in round 12 so EVERY
  * release index (semantic, PQ, exact, minhash, substring) can share it
  * (r11 what's-wrong #1: the unversioned indexes compacted by
  * materialize-then-overwrite, leaving a crash window in which the index
  * is destroyed and its checkpoint gone — at 100 TB a rebuild is days).
  *
  * Layout: `path/_CURRENT` is a one-line pointer file "v<N>"; all content
  * lives under `path/v<N>/…`. A rebuild or compaction writes a COMPLETE
  * new `v<N+1>` and only then renames the pointer into place (FileContext
  * atomic rename-overwrite), so a reader — live probes, the streaming
  * twins between micro-batches — always resolves a fully committed
  * version. A crash before the flip leaves the old version untouched and
  * the half-written build as inert debris; a retention sweep of
  * superseded versions is an operational concern, not index logic.
  * Appends mutate the CURRENT version in place under the single-writer
  * contract (the [[graft.ops.QuantileSketch]] discipline). */
object Versioned {

  private val Pointer = "_CURRENT"

  private def hadoopFs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Whether `path` carries a published version pointer. */
  def isVersioned(spark: SparkSession, path: String): Boolean = {
    val (fs, p) = hadoopFs(spark, path)
    fs.exists(new org.apache.hadoop.fs.Path(p, Pointer))
  }

  /** Root directory of the PUBLISHED version at `path`; fails loudly when
    * nothing has been published. */
  def resolveRoot(spark: SparkSession, path: String): String = {
    val (fs, p) = hadoopFs(spark, path)
    val ptr = new org.apache.hadoop.fs.Path(p, Pointer)
    require(fs.exists(ptr),
      s"no published index at $path (missing $Pointer pointer)")
    val in = fs.open(ptr)
    val v =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    s"$path/$v"
  }

  /** Next unused version name under `path` (staging dirs count too, so a
    * dead unpublished build is never overwritten — it is inert debris). */
  def nextVersion(spark: SparkSession, path: String): String = {
    val (fs, p) = hadoopFs(spark, path)
    val n =
      if (!fs.exists(p)) 0
      else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
        .collect { case s if s.matches("v\\d+") => s.drop(1).toInt }
        .foldLeft(0)(math.max)
    "v" + (n + 1)
  }

  /** Version directories under `path` that are NOT the published one:
    * superseded versions a compaction/rebuild replaced, plus dead
    * staging dirs whose build crashed before its pointer flip. These are
    * inert — no reader resolves them — but they hold disk. */
  private def superseded(spark: SparkSession, path: String)
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    val (fs, p) = hadoopFs(spark, path)
    if (!fs.exists(p)) return Seq.empty
    val current = new org.apache.hadoop.fs.Path(resolveRoot(spark, path))
      .getName
    fs.listStatus(p).filter(_.isDirectory).toSeq
      .filter { d =>
        val n = d.getPath.getName
        n.matches("v\\d+") && n != current
      }
  }

  private def dirBytes(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Long = {
    val it = fs.listFiles(p, true)
    var b = 0L
    while (it.hasNext) b += it.next().getLen
    b
  }

  /** Bytes held by superseded/dead versions under `path` — what a
    * [[sweep]] would reclaim. Driver-side directory listing only (the
    * [[graft.sim.Curation.manifest]] discipline: never opens data
    * pages); 0 for an unversioned or unpublished path. */
  def reclaimableBytes(spark: SparkSession, path: String): Long = {
    if (!isVersioned(spark, path)) return 0L
    val (fs, _) = hadoopFs(spark, path)
    superseded(spark, path).map(d => dirBytes(fs, d.getPath)).sum
  }

  /** Retention sweep (VERDICT r12 #3): delete every version directory
    * under `path` EXCEPT the published one — superseded versions kept as
    * crash fallbacks by compact/rebuild, and dead staging dirs. Returns
    * (directories swept, bytes reclaimed).
    *
    * Crash-safety: the published version and the `_CURRENT` pointer are
    * never in the victim list, so an interrupted sweep cannot make a
    * single probe fail — it just leaves partial debris that the next
    * sweep (or [[nextVersion]]'s monotonic numbering, which counts the
    * remnant) handles. Single-writer contract: do not sweep while a
    * rebuild is staging its next version, or the staging dir is the
    * debris that gets deleted. */
  def sweep(spark: SparkSession, path: String): (Int, Long) = {
    if (!isVersioned(spark, path)) return (0, 0L)
    val (fs, _) = hadoopFs(spark, path)
    val victims = superseded(spark, path)
    var bytes = 0L
    victims.foreach { d =>
      bytes += dirBytes(fs, d.getPath)
      fs.delete(d.getPath, true)
    }
    (victims.size, bytes)
  }

  /** Atomically flip the pointer to `version`: write a temp file, then a
    * FileContext rename with OVERWRITE — readers see the old version or
    * the new one, never a missing or half-written pointer. */
  def publish(spark: SparkSession, path: String, version: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val (fs, p) = hadoopFs(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(p, s"$Pointer.tmp")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext
      .getFileContext(fs.makeQualified(tmp).toUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(
        new org.apache.hadoop.fs.Path(p, Pointer)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }
}
