package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Volume proof for the PQ index ([[graft.sim.Pq]], SURVEY B9.39) — the
  * [[DedupVolume]] discipline for the compressed-ANN claim: measured
  * throughput, compression, and retrieval recall at a million vectors,
  * with planted ground truth.
  *
  *  - corpus: 1M 64-dim unit vectors, pure hash functions of the row id.
  *    Ids ≡ 3 (mod 10) are 0.25-scaled copies of vec id−3 — after
  *    normalization their direction is EXACTLY the base's, so each held-out
  *    copy's true cosine top-1 over the index is its base, by construction.
  *  - index: ids ≢ 3 (mod 10) (900k vectors) → frozen router (64 spherical
  *    centroids) + frozen per-subspace codebooks (M=8, K=64) + codes
  *    partitioned by centroid_id. 64 floats → 8 ints per vector.
  *  - probes: the 100k held-out copies. Recall@1 is measured two ways:
  *    the BATCHED flat ADC scan (every probe × every code row — the
  *    throughput number: row·probes/s of the pq_adc kernel) on a probe
  *    sample, and the end-to-end pruned [[graft.sim.Pq.probeIndexTopK]]
  *    latency on a handful.
  *  - compression is reported from the actual parquet bytes on disk
  *    (codes index vs the float corpus it replaces).
  *
  * PqVolumeSpec asserts recall at a CI-sized corpus; the committed
  * artifact (dev/pq_volume.json) records the million-row run.
  * Usage: runMain graft.PqVolume [nVecs] [workDir]
  */
object PqVolume {

  val Dim = 64
  val M = 8
  val K = 64
  val NCentroids = 64

  /** (vec_id, embedding): 64-dim unit vectors; ids ≡ 3 (mod 10) are
    * scaled copies of vec id−3 (identical direction after normalize). */
  def corpus(spark: SparkSession, nVecs: Long): DataFrame = {
    val id = col("id")
    val eid = when(id % 10 === 3, id - 3).otherwise(id)
    val scale = when(id % 10 === 3, lit(0.25)).otherwise(lit(1.0))
    val raw = array((1 to Dim).map(i =>
      (pmod(xxhash64(eid, lit(i)), lit(1000L)).cast("double") / 500.0 - 1.0)
        * scale): _*)
    val norm = sqrt(graft.sim.VectorMath.dot(raw, raw))
    spark.range(nVecs).select(id.as("vec_id"),
      transform(raw, x => x / norm).as("embedding"))
  }

  /** Batched flat ADC over RESIDUAL codes: one scan scoring every
    * (code row × probe) pair via a stride-sliced literal of all probe
    * LUTs plus each row's broadcast-joined ⟨probe, centroid⟩ offset (the
    * IVFADC decomposition — `offs(p)` maps centroid_id → ⟨probe_p, c⟩),
    * arg-max per probe — the pq_adc kernel's throughput shape. Returns
    * (probe_id, top1). */
  def batchedTop1(codes: DataFrame, luts: Seq[Seq[Double]],
      offs: Seq[Map[Int, Double]]): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val stride = luts.head.length
    val flat = typedLit(luts.flatten)
    val offDf = offs.zipWithIndex.flatMap { case (m, pid) =>
      m.toSeq.map { case (cid, off) => (pid, cid, off) } }
      .toDF("probe_id", "centroid_id", "off")
    val scored = codes
      .select(col("vec_id"), col("codes"), col("centroid_id"),
        explode(sequence(lit(0), lit(luts.size - 1))).as("probe_id"))
      .join(broadcast(offDf), Seq("probe_id", "centroid_id"))
      .select(col("probe_id"), col("vec_id"),
        (col("off") + org.apache.spark.sql.graftexpr.PqAdcExpr
          .column(col("codes"),
            slice(flat, (col("probe_id") * stride + 1).cast("int"),
              lit(stride)))).as("score"))
    scored.groupBy("probe_id")
      .agg(max_by(col("vec_id"), struct(col("score"), -col("vec_id")))
        .as("top1"))
  }

  /** centroid_id → ⟨probe, c⟩ for one probe over the collected router. */
  def offsetsFor(cents: Seq[(Int, Seq[Double])],
      probe: Seq[Double]): Map[Int, Double] =
    cents.map { case (cid, cv) =>
      var d = 0.0; var i = 0
      while (i < cv.length) { d += probe(i) * cv(i); i += 1 }
      cid -> d
    }.toMap

  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val workDir = args.lift(1).getOrElse("/tmp/graft_pqvol")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sim.Pq

    corpus(spark, nVecs).write.mode("overwrite").parquet(s"$workDir/vecs")
    val all = spark.read.parquet(s"$workDir/vecs")
    val base = all.filter(col("vec_id") % 10 =!= 3)
    val probes = all.filter(col("vec_id") % 10 === 3)

    val t0 = System.nanoTime()
    Pq.writeIndex(base, s"$workDir/pqidx", M, K, NCentroids,
      routerIters = 2, pqIters = 2, sqRefine = true, bqPrefilter = true)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val nIndexed = base.count()

    // compression from actual bytes on disk (codes under the PUBLISHED
    // version root — the index is versioned as of round 12). The round-12
    // index carries the SQ8 refine store (sq + norm columns) beside the
    // PQ codes; `compression` stays the PQ-codes-only number (comparable
    // to the r11 artifact) measured by rewriting just those columns, and
    // `refine_bytes`/`compression_with_refine` report the full
    // four-scan-mode index honestly.
    val root = graft.core.Versioned.resolveRoot(spark, s"$workDir/pqidx")
    def bytesOf(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
      fs.getContentSummary(path).getLength
    }
    val floatBytes = bytesOf(s"$workDir/vecs")
    val idxBytes = bytesOf(s"$root/codes")
    spark.read.parquet(s"$root/codes")
      .select("vec_id", "codes", "centroid_id")
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$workDir/codes_pq_only")
    val codeBytes = bytesOf(s"$workDir/codes_pq_only")

    // batched flat ADC over a probe sample: the kernel throughput number
    val nSample = 64
    val sample = probes.filter(col("vec_id") % 1000 === 3).limit(nSample)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toSeq
    val cb = spark.read.parquet(s"$root/codebooks").localCheckpoint()
    val cents = spark.read.parquet(s"$root/centroids").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1))).toSeq
    val luts = sample.map { case (_, v) => Pq.lutFor(cb, v, M) }
    val offs = sample.map { case (_, v) => offsetsFor(cents, v) }
    val codes = spark.read.parquet(s"$root/codes")
      .select("vec_id", "codes", "centroid_id").localCheckpoint()
    val t1 = System.nanoTime()
    val top1 = batchedTop1(codes, luts, offs).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val adcSec = (System.nanoTime() - t1) / 1e9
    val hits = sample.zipWithIndex.count { case ((pid, _), i) =>
      top1(i) == pid - 3 } // each probe's true top-1 is its base, id−3
    val recall = hits.toDouble / sample.size

    // end-to-end pruned probe latency (nprobe 4 of 64 lists)
    val t2 = System.nanoTime()
    val prunedHits = sample.take(5).count { case (pid, v) =>
      Pq.probeIndexTopK(spark, s"$workDir/pqidx", v, 1, nprobe = 4)
        .head().getLong(0) == pid - 3 }
    val prunedSec = (System.nanoTime() - t2) / 1e9 / 5

    // IVFADC+R at volume (round 12). Two measurements:
    //
    //  1. rerank@1 on the planted-copy contract: RAW encoding retrieved
    //     every copy's base structurally (probe and base share codes —
    //     the r11 artifact's recall@1 = 1.0); RESIDUAL encoding trades
    //     that away (the flat ADC number above, measured 0.95) for the
    //     clustered-data win PqSpec gates. The production answer is the
    //     two-stage scan: a 100-deep shortlist re-scored with true
    //     cosines puts the cosine-1 base back at rank 1 whenever it is
    //     anywhere in the shortlist — the gate expects 1.0 restored.
    //  2. recall@10 vs the exact scan, ADC alone vs a 2000-deep rerank
    //     (0.2% of the corpus re-scored) — the generic-neighbor quality
    //     number on PQ's worst-case geometry (hash-random directions:
    //     the true top-10 sit barely above the bulk, so code resolution
    //     ranks them weakly; this is the regime the honest-docs note in
    //     PqSpec pins at ~0.30 in-memory at 500 rows).
    val nR1 = 16
    val t3 = System.nanoTime()
    val rr1Hits = sample.take(nR1).count { case (pid, v) =>
      Pq.probeIndexTopKRerank(spark, s"$workDir/pqidx", base, v, 1,
          nprobe = 4, rerank = 100)
        .head().getLong(0) == pid - 3 }
    val rerank1Sec = (System.nanoTime() - t3) / 1e9 / nR1
    val rr1 = rr1Hits.toDouble / nR1

    val nR = 8
    val t4 = System.nanoTime()
    val rPairs = sample.take(nR).map { case (_, v) =>
      val exact = graft.sim.Ann.bruteTopK(base, v, 10)
        .collect().map(_.getLong(0)).toSet
      val a = Pq.probeIndexTopK(spark, s"$workDir/pqidx", v, 10,
          nprobe = NCentroids)
        .collect().map(_.getLong(0)).toSet
      val r = Pq.probeIndexTopKRerank(spark, s"$workDir/pqidx", base, v, 10,
          nprobe = NCentroids, rerank = 2000)
        .collect().map(_.getLong(0)).toSet
      (exact.intersect(a).size / 10.0, exact.intersect(r).size / 10.0)
    }
    val rerankSec = (System.nanoTime() - t4) / 1e9 / nR
    val adc10 = rPairs.map(_._1).sum / nR
    val rr10 = rPairs.map(_._2).sum / nR

    // the refine-store scan modes (round 12) on the same probes:
    //  - one-stage IVF-SQ: near-exact at 4×, so the planted base should
    //    win outright — no shortlist, no float read
    //  - ADC shortlist + SQ refine: the self-contained twin of the float
    //    rerank above — recall should track rr10 with the floats cold
    val t5 = System.nanoTime()
    val sq1Hits = sample.take(nR1).count { case (pid, v) =>
      Pq.probeIndexTopKSq(spark, s"$workDir/pqidx", v, 1, nprobe = 4)
        .head().getLong(0) == pid - 3 }
    val sq1Sec = (System.nanoTime() - t5) / 1e9 / nR1
    val sq1 = sq1Hits.toDouble / nR1
    val t6 = System.nanoTime()
    val sqPairs = sample.take(nR).map { case (_, v) =>
      val exact = graft.sim.Ann.bruteTopK(base, v, 10)
        .collect().map(_.getLong(0)).toSet
      val s1 = Pq.probeIndexTopKSq(spark, s"$workDir/pqidx", v, 10,
          nprobe = NCentroids)
        .collect().map(_.getLong(0)).toSet
      val s2 = Pq.probeIndexTopKRerankSq(spark, s"$workDir/pqidx", v, 10,
          nprobe = NCentroids, rerank = 2000)
        .collect().map(_.getLong(0)).toSet
      val s3 = Pq.probeIndexTopKBqSq(spark, s"$workDir/pqidx", v, 10,
          nprobe = NCentroids, rerank = 2000)
        .collect().map(_.getLong(0)).toSet
      (exact.intersect(s1).size / 10.0, exact.intersect(s2).size / 10.0,
        exact.intersect(s3).size / 10.0)
    }
    val sqScanSec = (System.nanoTime() - t6) / 1e9 / nR
    val sq10 = sqPairs.map(_._1).sum / nR
    val sqrr10 = sqPairs.map(_._2).sum / nR
    val bq10 = sqPairs.map(_._3).sum / nR

    // the fifth scan mode (round 12, BQ→SQ): planted-copy recall@1 is a
    // STRUCTURAL 1.0 expectation — a scaled copy's signs match its base
    // exactly, so its Hamming distance is 0 and the SQ re-score seals
    // it; the generic-neighbor bq10 above is the honest number for an
    // untrained 1-bit shortlist at 0.22% depth on hash-random geometry
    // (gate only against collapse, ≈ 10/n)
    val t7 = System.nanoTime()
    val bq1Hits = sample.take(nR1).count { case (pid, v) =>
      Pq.probeIndexTopKBqSq(spark, s"$workDir/pqidx", v, 1,
          nprobe = 4, rerank = 100)
        .head().getLong(0) == pid - 3 }
    val bq1Sec = (System.nanoTime() - t7) / 1e9 / nR1
    val bq1 = bq1Hits.toDouble / nR1

    // recall >= 0.9 is the COLLAPSE guard on raw ADC copy-retrieval
    // (residual encoding measured 0.95; a broken LUT/encode reads ~1/n);
    // the 1.0-contract moves to the reranked form
    val ok = recall >= 0.9 && prunedHits >= 4 && rr1 >= 0.99 &&
      rr10 >= adc10 && sq1 >= 0.99 && sq10 >= 0.9 && sqrr10 >= adc10 &&
      bq1 >= 0.99 && bq10 >= 0.1
    val line =
      f"""{"metric":"pq_adc_row_probes_per_sec",""" +
      f""""value":${nIndexed * sample.size / adcSec}%.0f,"unit":"rows*probes/s",""" +
      f""""encoding":"residual",""" +
      f""""n_indexed":$nIndexed,"dim":$Dim,"m":$M,"k":$K,""" +
      f""""build_sec":$buildSec%.1f,""" +
      f""""float_bytes":$floatBytes,"code_bytes":$codeBytes,""" +
      f""""compression":${floatBytes.toDouble / codeBytes}%.1f,""" +
      f""""probes":${sample.size},"recall_at1":$recall%.4f,""" +
      f""""pruned_probe_sec":$prunedSec%.2f,""" +
      f""""pruned_hits":$prunedHits,"pruned_probes":5,""" +
      f""""recall1_rerank":$rr1%.4f,"rerank1_depth":100,""" +
      f""""rerank1_probes":$nR1,"rerank1_probe_sec":$rerank1Sec%.2f,""" +
      f""""recall10_adc":$adc10%.4f,"recall10_rerank":$rr10%.4f,""" +
      f""""rerank_depth":2000,"rerank_probes":$nR,""" +
      f""""rerank_probe_sec":$rerankSec%.2f,""" +
      f""""refine_bytes":${idxBytes - codeBytes},""" +
      f""""compression_with_refine":${floatBytes.toDouble / idxBytes}%.1f,""" +
      f""""recall1_sq":$sq1%.4f,"sq1_probe_sec":$sq1Sec%.2f,""" +
      f""""recall10_sq":$sq10%.4f,"recall10_sqrerank":$sqrr10%.4f,""" +
      f""""sq_scan_probe_sec":$sqScanSec%.2f,""" +
      f""""recall1_bqsq":$bq1%.4f,"bq1_probe_sec":$bq1Sec%.2f,""" +
      f""""recall10_bqsq":$bq10%.4f,"bq_rerank_depth":2000,""" +
      s""""all_ok":$ok}"""
    println(line)
    Artifacts.write("pq_volume.json", line)
    spark.stop()
    if (!ok) { System.err.println(s"[pqvol] RECALL MISS"); sys.exit(1) }
  }
}
