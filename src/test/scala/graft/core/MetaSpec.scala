package graft.core

import graft.SparkSpec

/** The shared index-meta publish (core/Meta) must leave a committed,
  * readable row at EVERY crash point of a re-publish — the property the
  * six per-family writeMeta copies claimed ("the old meta stays readable
  * until one FS rename replaces it") but did not have: delete-then-rename
  * has a window with NO meta at all (ADVICE r12). Crash states are
  * injected by replaying the publish protocol's file operations by hand,
  * the [[graft.sim.CurationRetractSpec]] crash-injection pattern. */
class MetaSpec extends SparkSpec {

  import spark.implicits._

  private def fs(p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_meta").toString

  private def row(v: Long) = Seq(v).toDF("max_id")

  test("write/read round-trip, and re-publish replaces the row") {
    val root = tmp()
    Meta.write(row(7L), root)
    assert(Meta.read(spark, root).head().getLong(0) === 7L)
    Meta.write(row(11L), root)
    assert(Meta.read(spark, root).head().getLong(0) === 11L)
  }

  test("crash between retire and replace still reads the OLD committed row") {
    val root = tmp()
    Meta.write(row(7L), root)
    // second publish crashes after step 3 (meta retired to meta.prev,
    // meta.next staged but not yet renamed): replay exactly that state
    row(11L).coalesce(1).write.mode("overwrite")
      .parquet(s"$root/meta.next")
    val f = fs(root)
    assert(f.rename(new org.apache.hadoop.fs.Path(s"$root/meta"),
      new org.apache.hadoop.fs.Path(s"$root/meta.prev")))
    // no meta dir exists — the old protocol's probes would all fail here
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$root/meta")))
    assert(Meta.read(spark, root).head().getLong(0) === 7L,
      "reader in the crash window must see the old committed meta")
    // recovery is just the next publish — no manual repair
    Meta.write(row(11L), root)
    assert(Meta.read(spark, root).head().getLong(0) === 11L)
  }

  test("crash after staging meta.next leaves the current row authoritative") {
    val root = tmp()
    Meta.write(row(7L), root)
    row(99L).coalesce(1).write.mode("overwrite")
      .parquet(s"$root/meta.next")
    assert(Meta.read(spark, root).head().getLong(0) === 7L,
      "a dead staging dir must never shadow the committed meta")
    Meta.write(row(11L), root)
    assert(Meta.read(spark, root).head().getLong(0) === 11L)
  }

  test("stale meta.prev never shadows a newer committed meta") {
    val root = tmp()
    Meta.write(row(7L), root)
    Meta.write(row(11L), root)
    // the successful publish deliberately leaves meta.prev=7 in place as
    // the fallback for racing readers; meta=11 must win
    assert(fs(root).exists(new org.apache.hadoop.fs.Path(s"$root/meta.prev")))
    assert(Meta.read(spark, root).head().getLong(0) === 11L)
  }

  test("recovery publish commits the new meta BEFORE touching meta.prev") {
    val root = tmp()
    Meta.write(row(7L), root)
    // crash state: meta retired to meta.prev, replace never happened —
    // meta.prev is the ONLY committed row in existence
    val f = fs(root)
    assert(f.rename(new org.apache.hadoop.fs.Path(s"$root/meta"),
      new org.apache.hadoop.fs.Path(s"$root/meta.prev")))
    Meta.write(row(11L), root)
    // ADVICE r13: the recovery publish must NOT delete meta.prev before
    // the new meta is committed (a second crash in that window would
    // leave zero committed rows). The implementation skips the prev
    // cleanup entirely on this path — prev stays until the next normal
    // publish retires it.
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$root/meta.prev")),
      "recovery publish must leave the fallback row in place")
    assert(Meta.read(spark, root).head().getLong(0) === 11L)
    Meta.write(row(13L), root)
    assert(Meta.read(spark, root).head().getLong(0) === 13L)
  }

  test("a corrupt (still-present) meta rethrows instead of serving prev") {
    val root = tmp()
    Meta.write(row(7L), root)
    Meta.write(row(11L), root) // leaves meta.prev = 7
    // corrupt every parquet data file under meta: the directory still
    // exists, so this is NOT the rename race — serving prev's stale
    // high-water mark (7) would let a replayed shard double-fold
    val dir = new java.io.File(s"$root/meta")
    dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { pf =>
      java.nio.file.Files.write(pf.toPath, Array.fill[Byte](16)(0x5a))
    }
    intercept[Exception] { Meta.read(spark, root).head() }
  }

  test("read fails loudly when nothing was ever committed") {
    val root = tmp()
    val e = intercept[IllegalArgumentException] {
      Meta.read(spark, root)
    }
    assert(e.getMessage.contains("no committed meta"))
  }
}
