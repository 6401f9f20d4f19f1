package graft
import org.apache.spark.sql.SparkSession

/** Dev smoke: drives the flagship query and (optionally) one of the demo
  * pipelines end-to-end. Usage:
  *   runMain graft.EntrySmoke                      — flagship only
  *   runMain graft.EntrySmoke <logPath> <confPath> — raw fw pipeline
  *   runMain graft.EntrySmoke neardup|ann|dedup|incremental|stream|substring|semdedup|semshard|bpe|lm|dsir|bq|eval|fpidx|phash <sfDir>
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(20, false)
    args match {
      case Array("neardup", dir) =>
        println("NEARDUP:")
        sim.MinHash.nearDupPairs(
          core.Tables.documents(spark, dir), "doc_id", "text",
          numHashes = 32, bands = 8, shingleK = 1, threshold = 0.8)
          .show(10, false)
      case Array("ann", dir) =>
        val emb = core.Tables.embeddings(spark, dir)
        val probe = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 7)
          .select(org.apache.spark.sql.functions.col("embedding")
            .cast("array<double>"))
          .head().getSeq[Double](0).toSeq
        println("ANN_IVF:")
        sim.Ann.ivfSearch(sim.Ann.ivfAssign(emb, 16), 16, 8, probe, 10)
          .show(10, false)
        println("ANN_BRUTE:")
        sim.Ann.bruteTopK(emb, probe, 10).show(10, false)
        println("ANN_LSH:")
        sim.Ann.lshSearch(emb, probe, 10, nTables = 12, nBits = 5)
          .show(10, false)
      case Array("dedup", dir) =>
        // full pipeline: near-dup clusters, then the kept corpus
        println("DEDUP_CLUSTERS:")
        sim.Dedup.clusters(
          sim.Similarity.embeddingNearDupPairs(spark, dir), "vec_a", "vec_b")
          .orderBy("member").show(20, false)
        val docs = core.Tables.documents(spark, dir)
        val kept = sim.Dedup.dedupCorpus(docs, "doc_id", "text")
        println(s"DEDUP_CORPUS: kept ${kept.count()} of ${docs.count()}")
      case Array("incremental", dir) =>
        // the incremental-analytics trio: MinHash shard-vs-index dedup,
        // per-day HLL distinct index, per-day KLL quantile index
        import org.apache.spark.sql.functions.col
        val docs = core.Tables.documents(spark, dir)
        val split = 400L
        val idx = java.nio.file.Files
          .createTempDirectory("graft_inc_idx").toString
        sim.IncrementalDedup.writeIndex(
          docs.filter(col("doc_id") < split), "doc_id", "text", s"$idx/mh")
        val shard = docs.filter(col("doc_id") >= split)
        val kept = sim.IncrementalDedup.dedupShard(spark, shard,
          "doc_id", "text", s"$idx/mh")
        println(s"INCREMENTAL_DEDUP: kept ${kept.count()} of ${shard.count()} shard docs")
        val events = core.Tables.events(spark, dir)
        ops.IncrementalDistinct.appendDailySketches(events, s"$idx/hll")
        println(s"INCREMENTAL_DISTINCT: ~" +
          ops.IncrementalDistinct.distinctUsers(spark, s"$idx/hll") + " users")
        ops.QuantileSketch.appendDailySketches(events, s"$idx/kll")
        println("INCREMENTAL_QUANTILES:")
        ops.QuantileSketch.quantilesByType(spark, s"$idx/kll",
          Seq(0.5, 0.95)).show(12, false)
      case Array("stream", dir) =>
        // file-source streaming drive: µs-normalized copy of events →
        // readStream → watermarked tumbling agg → memory sink
        val staged = java.nio.file.Files.createTempDirectory("graft_stream")
          .toString
        core.Tables.events(spark, dir).write.mode("overwrite")
          .parquet(s"$staged/events")
        val q = stream.Streaming
          .tumblingCounts(stream.Streaming.readEventStream(spark, s"$staged/events"))
          .writeStream.format("memory").queryName("stream_demo")
          .outputMode("complete").start()
        q.processAllAvailable()
        q.stop()
        println("STREAM_TUMBLING:")
        spark.table("stream_demo")
          .orderBy("bucket_start", "event_type").show(8, false)
      case Array("substring", dir) =>
        // passage-level dedup: whole-corpus spans, then the incremental
        // probe of a held-out shard against the corpus shingle index
        import org.apache.spark.sql.functions.col
        val docs = core.Tables.documents(spark, dir)
        println("SUBSTRING_SPANS:")
        text.SubstringDedup.dupSpans(docs, 8)
          .orderBy("doc_id", "span_start").show(10, false)
        val idx = java.nio.file.Files
          .createTempDirectory("graft_sub_idx").toString
        val split = 400L
        text.SubstringDedup.appendShingleIndex(
          docs.filter(col("doc_id") < split), 8, idx)
        println("SHARD_SPANS (vs corpus index):")
        text.SubstringDedup.shardDupSpans(
            docs.filter(col("doc_id") >= split), 8, idx)
          .orderBy("doc_id", "span_start").show(10, false)
      case Array("semdedup", dir) =>
        // semantic dedup demo: plant scaled duplicates so the cluster-local
        // pass has something to drop (cosine is scale-invariant)
        import org.apache.spark.sql.functions.{col, transform}
        val emb = core.Tables.embeddings(spark, dir)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("embedding"))
        val copies = emb.filter(col("vec_id") % 25 === 0)
          .select((col("vec_id") + 10000L).as("vec_id"),
            transform(col("embedding"), x => x * 0.5).as("embedding"))
        val corpus = emb.union(copies)
        val kept = sim.SemDedup.semDedupCorpus(corpus, 0.99, 16, iters = 3)
        println(s"SEMDEDUP: kept ${kept.count()} of ${corpus.count()} " +
          s"(${copies.count()} planted duplicates)")
      case Array("semshard", dir) =>
        // incremental semantic dedup demo (round 9): index the corpus once,
        // then dedupe a shard of planted copies at shard cost
        import org.apache.spark.sql.functions.{col, transform}
        val emb = core.Tables.embeddings(spark, dir)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("embedding"))
        val idx = java.nio.file.Files
          .createTempDirectory("graft_sem_demo").toString
        sim.SemDedup.writeIndex(emb, idx, nCentroids = 16, iters = 3)
        val shard = emb.filter(col("vec_id") % 25 === 0)
          .select((col("vec_id") + 10000L).as("vec_id"),
            transform(col("embedding"), x => x * 0.5).as("embedding"))
        val kept2 = sim.SemDedup.semDedupShard(spark, shard, idx, 0.99)
        println(s"SEMSHARD: kept ${kept2.count()} of ${shard.count()} " +
          "shard vectors (planted copies of indexed corpus members drop)")
      case Array("bpe", dir) =>
        val docs = core.Tables.documents(spark, dir)
        val m = text.Bpe.train(docs, 20)
        println(s"BPE_MERGES: ${m.merges.mkString(", ")}")
        println("BPE_ENCODE:")
        text.Bpe.encode(docs, m)
          .orderBy("doc_id", "pos").show(15, false)
      case Array("lm", dir) =>
        import org.apache.spark.sql.functions.col
        val docs = core.Tables.documents(spark, dir)
          .select("doc_id", "text")
        val lmDir = java.nio.file.Files
          .createTempDirectory("graft_smoke_lm").toString
        text.LmScore.writeLm(docs.filter(col("doc_id") < 400), lmDir)
        println("LM_SCORES (shard vs frozen release LM):")
        text.LmScore.score(docs.filter(col("doc_id") >= 400),
            text.LmScore.readLm(spark, lmDir))
          .orderBy("doc_id").show(10, false)
      case Array("dsir", dir) =>
        println("DSIR_SAMPLE:")
        SparkEntry.queries("sample_dsir")(spark, dir).show(10, false)
      case Array("bq", dir) =>
        import org.apache.spark.sql.functions.col
        val emb = core.Tables.embeddings(spark, dir)
        val probe = emb.filter(col("vec_id") === 7)
          .select(col("embedding").cast("array<double>"))
          .head().getSeq[Double](0).toSeq
        val enc = sim.Bq.encode(emb, 64)
        println("BQ_HAMMING_TOP10:")
        sim.Bq.topK(enc, sim.Bq.signature(probe), 10).show(10, false)
        println("BQ_RERANKED_TOP10 (exact cosine over the shortlist):")
        sim.Bq.topKRerank(enc, emb, probe, 10, rerank = 50).show(10, false)
      case Array("eval", dir) =>
        println("RETRIEVAL_METRICS:")
        SparkEntry.queries("eval_retrieval")(spark, dir).show(false)
        println("KNN_PREDICTIONS:")
        SparkEntry.queries("eval_knn_accuracy")(spark, dir).show(10, false)
        println("HARD_NEGATIVE_TRIPLES:")
        SparkEntry.queries("mine_hard_negatives")(spark, dir).show(9, false)
      case Array("fpidx", dir) =>
        import org.apache.spark.sql.functions.col
        val docs = core.Tables.documents(spark, dir).select("doc_id", "text")
        val fps = docs.select(col("doc_id").as("id"),
          sim.SimHash.simhash(col("text")).as("fp"))
        val idxDir = java.nio.file.Files
          .createTempDirectory("graft_smoke_fp").toString
        sim.FpIndex.writeIndex(fps.filter(col("id") < 400), idxDir)
        println("FP_SHARD_PAIRS (shard vs frozen fingerprint index):")
        sim.FpIndex.probe(spark, fps.filter(col("id") >= 400), idxDir)
          .orderBy("id", "corpus_id").show(10, false)
      case Array("phash", dir) =>
        val media = multimodal.Multimodal.syntheticMedia(spark, dir)
        println("IMAGE_DHASH:")
        multimodal.Multimodal.imageDHash(media).orderBy("id").show(10, false)
        println("AUDIO_ENVHASH:")
        multimodal.Multimodal.audioEnvHash(media).orderBy("id").show(10, false)
      case Array(logPath, confPath) =>
        val report = domain.LogParse.usageReportFromRaw(spark, logPath, confPath)
        println("RAW_REPORT:")
        report.show(50, false)
        println("ENTRY_REPORT (per object-group member):")
        domain.LogParse.entryUsageFromRaw(spark, logPath, confPath)
          .show(50, false)
      case _ =>
    }
    spark.stop()
  }
}
