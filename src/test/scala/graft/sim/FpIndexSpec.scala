package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted fingerprint near-dup index ([[FpIndex]]): probe ≡ a
  * brute-force Hamming model (recall GUARANTEED at ≤ maxHamming by the
  * pigeonhole blocking), append ≡ rebuild-over-union under the
  * monotonic-id guard, versioned compaction preserves probe results while
  * shrinking files, the index scan stays statically pruned, the streaming
  * twin replays the batch probe, and the image-dHash composition makes
  * media dedup a production loop.
  */
class FpIndexSpec extends SparkSpec {

  import spark.implicits._

  // splitmix64 finalizer — independent 63-bit fingerprints per id, so
  // unplanted pairs sit near the random hamming-31 expectation and can
  // never stray into the ≤8 near-dup radius by bad luck of a weak mixer
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def fpOf(i: Long): Long = mix(i) & Long.MaxValue // 63 bits

  private def flipBits(fp: Long, n: Int, salt: Int): Long =
    // n ≤ 8 DISTINCT positions: salt*11 + 5t mod 63 are distinct for t<8
    (0 until n).foldLeft(fp)((f, t) => f ^ (1L << ((salt * 11 + 5 * t) % 63)))

  private def hammingOf(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  // corpus ids 0..199; shard ids 1000..1049 with 20 planted near-dups
  // (exactly salt%9 ≤ 8 bits flipped off corpus fp (salt*7)%200) + 30 fresh
  private lazy val corpusFps: Seq[(Long, Long)] =
    (0L until 200L).map(i => (i, fpOf(i)))
  private lazy val shardFps: Seq[(Long, Long)] =
    (0 until 20).map { j =>
      (1000L + j, flipBits(fpOf(j.toLong * 7 % 200), j % 9, j))
    } ++ (20 until 50).map(j => (1000L + j, fpOf(100000L + j)))

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_fpidx_$tag").toString

  private def probePairs(dir: String, shard: Seq[(Long, Long)])
      : Set[(Long, Long, Int)] =
    FpIndex.probe(spark, shard.toDF("id", "fp"), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  /** Brute-force shard-vs-corpus ground truth at radius 8. */
  private def bruteCross(shard: Seq[(Long, Long)],
      corpus: Seq[(Long, Long)]): Set[(Long, Long, Int)] =
    (for {
      (sid, sfp) <- shard; (cid, cfp) <- corpus
      h = hammingOf(sfp, cfp) if h <= 8
    } yield (sid, cid, h)).toSet

  test("probe == brute-force Hamming model (guaranteed recall, exact " +
      "precision), and == the batch self-join restricted to cross pairs") {
    val dir = tmp("probe")
    FpIndex.writeIndex(corpusFps.toDF("id", "fp"), dir)
    val got = probePairs(dir, shardFps)
    val want = bruteCross(shardFps, corpusFps)
    assert(got === want)
    // non-vacuous: all 20 plants found (hamming == bits flipped), and
    // fresh rows found nothing beyond chance
    assert((0 until 20).forall(j => got.exists(_._1 == 1000L + j)))
    assert(got.size >= 20)
    // the batch join over corpus ∪ shard, restricted to cross pairs,
    // agrees — index and self-join share the same blocking function
    val batchCross = SimHash
      .nearDupPairsByFp((corpusFps ++ shardFps).toDF("id", "fp"))
      .filter(col("id_b") >= 1000L && col("id_a") < 1000L)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getInt(2))).toSet
    assert(batchCross === want)
  }

  test("append == rebuild-over-union; a replayed shard trips the " +
      "monotonic-id guard") {
    val incr = tmp("incr"); val full = tmp("full")
    FpIndex.writeIndex(corpusFps.toDF("id", "fp"), incr)
    FpIndex.appendIndex(shardFps.toDF("id", "fp"), incr)
    FpIndex.writeIndex((corpusFps ++ shardFps).toDF("id", "fp"), full)
    // second shard: near-dups planted against BOTH generations
    val shard2 = Seq(
      (2000L, flipBits(fpOf(5L), 3, 21)), // near a corpus row
      (2001L, flipBits(shardFps(3)._2, 2, 22)), // near an APPENDED row
      (2002L, fpOf(777777L))) // fresh
    val gotIncr = probePairs(incr, shard2)
    val gotFull = probePairs(full, shard2)
    assert(gotIncr === gotFull)
    assert(gotIncr.exists(_._2 >= 1000L),
      "a hit against the appended generation must be present")
    // replayed shard: ids at or below the high-water mark fail loudly
    val e = intercept[IllegalArgumentException] {
      FpIndex.appendIndex(shardFps.toDF("id", "fp"), incr)
    }
    assert(e.getMessage.contains("monotonic-id"))
  }

  test("compaction: one file per pb partition in a NEW version behind " +
      "the atomic pointer, probe results identical, old version intact") {
    val dir = tmp("compact")
    FpIndex.writeIndex(corpusFps.toDF("id", "fp"), dir)
    FpIndex.appendIndex(shardFps.toDF("id", "fp"), dir)
    val before = probePairs(dir, Seq((3000L, flipBits(fpOf(9L), 4, 33))))
    val oldRoot = graft.core.Versioned.resolveRoot(spark, dir)

    def filesPerPart(root: String): Seq[Int] = {
      val base = new java.io.File(s"$root/blocks")
      base.listFiles().filter(_.getName.startsWith("pb=")).toSeq
        .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    }
    assert(filesPerPart(oldRoot).exists(_ > 1),
      "precondition: appends fragment partitions")

    FpIndex.compactIndex(spark, dir)
    val newRoot = graft.core.Versioned.resolveRoot(spark, dir)
    assert(newRoot !== oldRoot)
    assert(filesPerPart(newRoot).forall(_ == 1))
    assert(probePairs(dir, Seq((3000L, flipBits(fpOf(9L), 4, 33))))
      === before)
    // crash-safety shape: the superseded version is still fully readable
    assert(spark.read.parquet(s"$oldRoot/blocks").count() > 0)
    // and the loop continues: the high-water mark survived compaction
    val e = intercept[IllegalArgumentException] {
      FpIndex.appendIndex(shardFps.toDF("id", "fp"), dir)
    }
    assert(e.getMessage.contains("monotonic-id"))
  }

  test("plan: the index scan is statically pruned to the shard's bucket " +
      "set") {
    val dir = tmp("prune")
    FpIndex.writeIndex(corpusFps.toDF("id", "fp"), dir)
    val tiny = Seq((5000L, flipBits(fpOf(1L), 2, 44)))
    val probe = FpIndex.probe(spark, tiny.toDF("id", "fp"), dir)
    probe.collect()
    val physical = probe.queryExecution.executedPlan.toString
    assert(physical.linesIterator.exists(l =>
      l.contains("PartitionFilters: [") && l.contains("pb")
        && (l.contains("INSET") || l.contains(" IN ("))),
      "index scan lost its static partition prune")
  }

  test("streaming twin: per-batch flags == the batch probe, and an " +
      "append between batches is visible to the next batch") {
    val dir = tmp("stream")
    FpIndex.writeIndex(corpusFps.toDF("id", "fp"), dir)
    val b1 = shardFps
    // 2001 is a near-copy of a FRESH b1 row (id 1025, fp independent of
    // the corpus) — it can only flag through the fold-in; 2002 fresh
    val b2 = Seq((2001L, flipBits(shardFps(25)._2, 2, 22)),
      (2002L, fpOf(888888L)))

    val sunk = scala.collection.mutable.ArrayBuffer[(Long, Set[Long])]()
    val stream = MemoryStream[(Long, Long)](94, spark, None)
    val q = graft.stream.Streaming.streamFpDupFlags(
        stream.toDF().toDF("id", "fp"), dir,
        (flags, id) => sunk += ((id,
          flags.collect().map(_.getLong(0)).toSet)))
      .start()
    stream.addData(b1); q.processAllAvailable()
    FpIndex.appendIndex(b1.toDF("id", "fp"), dir)
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    assert(sunk.size === 2)
    assert(sunk(0)._2 === bruteCross(b1, corpusFps).map(_._1))
    assert(sunk(1)._2 === Set(2001L),
      "the fold-in between batches must be visible to batch 2")
  }

  test("dedupShard == whole-corpus min-id dedup restricted to the shard " +
      "(exact on both legs — recall is a pigeonhole guarantee), with all " +
      "three drop classes exercised") {
    val dir = tmp("dshard")
    FpIndex.writeIndex(corpusFps.toDF("id", "fp"), dir)
    // enrich the shard with within-shard structure:
    //   5000/5001 — a CLEAN within-shard near-pair (class 3: min kept)
    //   5002 — 6 bits from corpus row 7 (class 1: direct hit)
    //   5003 — 5 further bits from 5002 (11 from the corpus: NOT a direct
    //          hit, drops only by transitivity — class 2)
    val fp5002 = flipBits(fpOf(7L), 6, 51)
    val extra = Seq(
      (5000L, fpOf(424242L)), (5001L, flipBits(fpOf(424242L), 2, 50)),
      (5002L, fp5002), (5003L, flipBits(fp5002, 5, 52)))
    assert(hammingOf(extra(3)._2, fpOf(7L)) > 8, "5003 must not hit direct")
    val shard = shardFps ++ extra

    val kept = FpIndex.dedupShard(spark, shard.toDF("id", "fp"), dir)
      .select("id").collect().map(_.getLong(0)).toSet

    // driver model: union-find over ALL ≤8-bit pairs of corpus ∪ shard;
    // keep = each component's min id; expectation = kept ∩ shard ids
    val all = corpusFps ++ shard
    val parent = scala.collection.mutable.Map(all.map(x => x._1 -> x._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for ((ia, fa) <- all; (ib, fb) <- all
         if ia < ib && hammingOf(fa, fb) <= 8)
      parent(find(ia)) = find(ib)
    val minOfRoot = all.map(_._1).groupBy(find).view.mapValues(_.min).toMap
    val expect = shard.map(_._1).filter(id => minOfRoot(find(id)) == id).toSet

    assert(kept === expect)
    // non-vacuity: every drop class fired
    assert(kept.contains(5000L) && !kept.contains(5001L), "class 3")
    assert(!kept.contains(5002L), "class 1")
    assert(!kept.contains(5003L), "class 2 (transitivity)")
  }

  test("retraction: tombstoned rows stop flagging immediately, other " +
      "verdicts untouched, replay no-ops, compaction makes the drop " +
      "physical, and equivalent NEW content is kept under a fresh id") {
    val dir = tmp("retract")
    FpIndex.writeIndex(corpusFps.toDF("id", "fp"), dir)
    val shard = Seq((4000L, flipBits(fpOf(5L), 3, 21)),
      (4001L, flipBits(fpOf(9L), 4, 33)), (4002L, fpOf(555555L)))
    val before = probePairs(dir, shard)
    assert(before.exists(p => p._1 == 4000L && p._2 == 5L))
    assert(before.exists(p => p._1 == 4001L && p._2 == 9L))

    FpIndex.retract(spark, dir, Seq(5L))
    val after = probePairs(dir, shard)
    assert(after === before.filterNot(_._2 == 5L),
      "only the retracted row's pairs may disappear")
    FpIndex.retract(spark, dir, Seq(5L)) // replayed takedown: no-op
    assert(probePairs(dir, shard) === after)

    FpIndex.compactIndex(spark, dir)
    val root = graft.core.Versioned.resolveRoot(spark, dir)
    assert(!new java.io.File(s"$root/tombstones").exists(),
      "compaction starts the new version with a clean tombstone set")
    assert(spark.read.parquet(s"$root/blocks")
      .filter(col("id") === 5L).count() === 0L, "the drop is physical")
    assert(probePairs(dir, shard) === after)

    // takedown must not block equivalent FUTURE content: the same bits
    // under a fresh id append fine and flag as corpus from then on
    FpIndex.appendIndex(Seq((9000L, fpOf(5L))).toDF("id", "fp"), dir)
    val re = probePairs(dir, Seq((9500L, flipBits(fpOf(5L), 1, 7))))
    assert(re.exists(_._2 == 9000L))
    assert(!re.exists(_._2 == 5L))
  }

  test("streaming ingest twin: two micro-batches == sequential " +
      "ingestShard calls, and a batch-2 near-copy of a batch-1 fold-in " +
      "drops (the cross-batch property that makes it a loop)") {
    val dirS = tmp("sing"); val dirB = tmp("bing")
    FpIndex.writeIndex(corpusFps.toDF("id", "fp"), dirS)
    FpIndex.writeIndex(corpusFps.toDF("id", "fp"), dirB)
    val b1 = shardFps
    val b2 = Seq(
      (2000L, flipBits(shardFps(25)._2, 2, 22)), // near a b1 FRESH row
      (2001L, fpOf(999999L)))                    // fresh

    val sunk = scala.collection.mutable.ArrayBuffer[(Long, Set[Long])]()
    val stream = MemoryStream[(Long, Long)](95, spark, None)
    val q = graft.stream.Streaming.streamFpIngest(
        stream.toDF().toDF("id", "fp"), dirS,
        (kept, id) => sunk += ((id,
          kept.select("id").collect().map(_.getLong(0)).toSet)))
      .start()
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    assert(sunk.size === 2)

    def batchIngest(rows: Seq[(Long, Long)]): Set[Long] =
      FpIndex.ingestShard(spark, rows.toDF("id", "fp"), dirB)
        .select("id").collect().map(_.getLong(0)).toSet
    assert(sunk(0)._2 === batchIngest(b1))
    assert(sunk(1)._2 === batchIngest(b2))
    // the cross-batch drop: 2000 only collides with a batch-1 fold-in
    assert(!sunk(1)._2.contains(2000L) && sunk(1)._2.contains(2001L))
  }

  test("media composition: image dHash rows through the same index — a " +
      "payload-identical re-upload flags against the corpus") {
    import graft.multimodal.Multimodal._
    val meta = MediaMeta(72, 64, 0, 0L, "image/png")
    def img(id: Long, seed: Int) =
      MediaRow(id, "image", Array.tabulate[Byte](64)(i =>
        (mix(seed.toLong * 64 + i) >>> 56).toByte), meta)
    val corpus = (0 until 10).map(s => img(s.toLong, s))
    val dir = tmp("media")
    FpIndex.writeIndex(
      imageDHash(spark.createDataset(corpus)), dir)
    // 1000 re-uploads image 3's exact payload; 1001 is new content
    val shard = Seq(img(1000L, 3), img(1001L, 99))
    val flags = FpIndex.corpusDupFlags(spark,
        imageDHash(spark.createDataset(shard)), dir)
      .collect().map(_.getLong(0)).toSet
    assert(flags === Set(1000L))
  }
}
