package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.SubstringDedup

/** The incremental curation contract (round 10, [[Curation.ingestShard]]):
  *
  *  - ingestShard(shard) ≡ curate(release ∪ shard, semCentroids = frozen)
  *    restricted to the shard's doc ids, with a planted drop for every
  *    stage on both the corpus-probe and within-shard paths;
  *  - THE INDEX IS THE RELEASE: docs the pipeline REJECTED do not
  *    influence later verdicts (a second shard's near-copy of a rejected
  *    doc is kept; a near-copy of a published doc drops) — and iterating
  *    ingest stays equal to batch curation over release ∪ kept₁ ∪ shard₂;
  *  - the monotonic-id guard fails loudly and the high-water mark
  *    advances with each ingest;
  *  - the exact-index probe is statically pruned to the shard's digest
  *    buckets (the plan gate);
  *  - [[SubstringDedup.shardDedupStats]] ≡ `dedupStats(corpus ∪ shard)`
  *    restricted to the shard, full-row (the equality its scaladoc
  *    promises this spec pins).
  */
class CurationIngestSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val B = 200000L // shard-1 id base
  private val C = 300000L // shard-2 id base

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private def ledgerOf(r: Curation.Result): Map[String, (Long, Long, Long)] =
    r.ledger.collect()
      .map(x => x.getString(1) -> (x.getLong(2), x.getLong(3), x.getLong(4)))
      .toMap

  /** Everything the tests share: the published release + its per-stage
    * indexes, the first shard (a planted drop for every stage on both the
    * corpus and within-shard paths), and the ingest-1 result. Bulk docs
    * come from a GLOBAL curation pass so the two halves carry no natural
    * cross-half duplication — every cross-half effect is a plant this
    * fixture controls. */
  private case class Fx(dir: String, release: DataFrame, shard1: DataFrame,
      embAll: DataFrame, res1: Curation.Result, frozen: DataFrame,
      relMinId: Long, longRelId: Long, longShardSrcId: Long, rStar: Long)

  private lazy val fx: Fx = {
    val all = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").localCheckpoint()
    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val globalKept = Curation.curate(all, None).kept.localCheckpoint()

    import spark.implicits._
    // released short docs (< substring k tokens) — the minhash stage's
    // corpus anchors, invisible to the substring budget
    val srcShorts = Seq(
      (1001L, "plant", "qa qb qc qd qe qf"),
      (1002L, "plant", "ra rb rc rd re rf"))
      .toDF("doc_id", "source", "text")
    val releaseInput = globalKept.filter(col("doc_id") < 250)
      .union(srcShorts).localCheckpoint()
    val release = Curation.curate(releaseInput, Some(emb)).kept
      .localCheckpoint()

    val dir = java.nio.file.Files
      .createTempDirectory("graft_curation_index").toString
    Curation.writeIndexes(release, Some(emb), dir)
    val frozen = SemDedup.indexCentroids(spark, s"$dir/semantic")
      .localCheckpoint()

    // deterministic plant sources, picked so the substring plants add
    // EXACTLY their 40% prefix to an otherwise span-free doc (dup_tokens
    // must be 0 in the pre-plant universe, so the planted coverage cannot
    // merge with natural spans and tip a source over the 0.5 budget —
    // the release side of that would be the batch-only back-channel)
    val bulkShard = globalKept.filter(col("doc_id") >= 250)
      .select((col("doc_id") + B).as("doc_id"), col("source"), col("text"))
    val st = SubstringDedup
      .dedupStats(release.union(bulkShard), SubstringDedup.declaredK, 0.5)
      .filter(col("dup_tokens") === 0 && col("n_tokens") >= 25)
      .localCheckpoint()
    val relTexts = release.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val relMinId = relTexts.keySet.min
    val longRelId = ids(st.filter(col("doc_id") < B)).min
    val longShardSrcId = ids(st.filter(col("doc_id") >= B)).min
    val rStar = relTexts.keySet.filter(_ < 500).min // released id with a vector
    def prefix40(text: String): String = {
      val t = text.split(" "); t.take((t.length * 0.4).toInt).mkString(" ")
    }
    val longShardSrcText = bulkShard
      .filter(col("doc_id") === longShardSrcId)
      .select("text").head().getString(0)

    val plants = Seq(
      // stage 1: corpus-exact hit + within-shard exact pair (min-id keeps)
      (B + 90001L, "plant", relTexts(relMinId)),
      (B + 90002L, "plant", "wx1 wx2 wx3 wx4 wx5 wx6 wx7 wx8 wx9 wx10"),
      (B + 90003L, "plant", "wx1 wx2 wx3 wx4 wx5 wx6 wx7 wx8 wx9 wx10"),
      // stage 2: 40% prefixes — fully span-covered, sources stay at 0.4
      (B + 90004L, "plant", prefix40(relTexts(longRelId))),
      (B + 90005L, "plant", prefix40(longShardSrcText)),
      // stage 3: substring-blind (≤ 7 tokens) one-token extensions —
      // token-Jaccard 6/7 ≥ 0.8 — vs a released anchor and within-shard
      (B + 90006L, "plant", "qa qb qc qd qe qf qg"),
      (B + 90007L, "plant", "sa sb sc sd se sf"),
      (B + 90008L, "plant", "sa sb sc sd se sf sg"),
      // stage 4: unique texts, verdicts carried purely by planted vectors
      (B + 90010L, "plant", "ta tb tc td te tf"),
      (B + 90011L, "plant", "ua ub uc ud ue uf"),
      (B + 90012L, "plant", "va vb vc vd ve vf"),
      (B + 90013L, "plant", "wa wb wc wd we wf"), // vectorless survivor
      // rejected at stage 1 — its NOVEL vector must never reach the index
      (B + 90014L, "plant", relTexts(relMinId)))
      .toDF("doc_id", "source", "text")
    val shard1 = bulkShard.union(plants).localCheckpoint()

    // planted vectors: scaled copies are cosine-1 with their base; the
    // reversed bases (novel directions) get a brute-force precondition in
    // the monotonic/guard test below
    val vOf = (id: Long) => emb.filter(col("vec_id") === id)
    val embAll = emb
      .union(vOf(rStar).select(lit(B + 90010L),
        transform(col("embedding"), x => x * 0.5f)))
      .union(vOf(17L).select(lit(B + 90011L), reverse(col("embedding"))))
      .union(vOf(17L).select(lit(B + 90012L),
        transform(reverse(col("embedding")), x => x * 0.5f)))
      .union(vOf(42L).select(lit(B + 90014L), reverse(col("embedding"))))
      .localCheckpoint()

    val res1 = Curation.ingestShard(shard1, Some(embAll), dir)
    res1.kept.localCheckpoint()
    Fx(dir, release, shard1, embAll, res1, frozen,
      relMinId, longRelId, longShardSrcId, rStar)
  }

  test("ingestShard equals batch curation over release ∪ shard, restricted " +
      "to the shard") {
    val got = ids(fx.res1.kept)
    val expected = ids(Curation
      .curate(fx.release.union(fx.shard1), Some(fx.embAll),
        semCentroids = Some(fx.frozen))
      .kept.filter(col("doc_id") >= B))
    assert(got === expected,
      s"missed=${expected.diff(got).toList.sorted.take(5)} " +
        s"extra=${got.diff(expected).toList.sorted.take(5)}")

    // every planted verdict, by name
    assert(!got.contains(B + 90001L) && !got.contains(B + 90014L),
      "corpus-exact copies must drop at stage 1")
    assert(got.contains(B + 90002L) && !got.contains(B + 90003L),
      "within-shard exact pair: min id wins")
    assert(!got.contains(B + 90004L) && !got.contains(B + 90005L),
      "40% prefixes are fully span-covered and must drop")
    assert(got.contains(fx.longShardSrcId),
      "a 40%-covered source stays under the budget and survives")
    assert(!got.contains(B + 90006L), "near-dup of a released anchor drops")
    assert(got.contains(B + 90007L) && !got.contains(B + 90008L),
      "within-shard near-dup pair: min id wins")
    assert(!got.contains(B + 90010L), "cosine twin of a released vector drops")
    assert(got.contains(B + 90011L) && !got.contains(B + 90012L),
      "within-shard cosine pair: min id wins")
    assert(got.contains(B + 90013L), "vectorless docs pass the semantic stage")

    // ledger: chained counts, and every stage saw a real drop
    val led = ledgerOf(fx.res1)
    assert(led("exact")._1 === fx.shard1.count())
    assert(led("exact")._3 === led("substring")._1)
    assert(led("substring")._3 === led("near_dup")._1)
    assert(led("near_dup")._3 === led("semantic")._1)
    assert(led.values.forall(_._2 >= 2), s"every stage must drop ≥ 2: $led")
    assert(led("semantic")._3 === got.size.toLong)
  }

  test("the index is the release: rejected docs never influence later " +
      "verdicts, and iterated ingest stays batch-equal") {
    val kept1 = fx.res1.kept
    import spark.implicits._
    val shard2 = Seq(
      // copy of a PUBLISHED shard-1 doc → the grown exact index drops it
      (C + 1L, "plant", "wx1 wx2 wx3 wx4 wx5 wx6 wx7 wx8 wx9 wx10"),
      // copy of a REJECTED shard-1 doc (B+90006): not in the exact index,
      // so it passes stage 1 — and then drops at stage 3 for the same
      // underlying reason its twin did (the released anchor 1001)
      (C + 2L, "plant", "qa qb qc qd qe qf qg"),
      // tok-Jaccard 7/8 ≥ 0.8 with the REJECTED B+90008, only 6/8 < 0.8
      // with the published B+90007 → must be KEPT
      (C + 3L, "plant", "sa sb sc sd se sf sg sh"),
      // cosine twin of the REJECTED B+90014's never-indexed vector → KEPT
      (C + 4L, "plant", "ya yb yc yd ye yf"),
      // cosine twin of the PUBLISHED B+90011's vector → drops
      (C + 5L, "plant", "za zb zc zd ze zf"))
      .toDF("doc_id", "source", "text")
    val vOf = (id: Long) => graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).filter(col("vec_id") === id)
    val embAll2 = fx.embAll
      .union(vOf(42L).select(lit(C + 4L),
        transform(reverse(col("embedding")), x => x * 0.5f)))
      .union(vOf(17L).select(lit(C + 5L),
        transform(reverse(col("embedding")), x => x * 0.25f)))
      .localCheckpoint()

    val res2 = Curation.ingestShard(shard2, Some(embAll2), fx.dir)
    val got2 = ids(res2.kept)
    assert(got2 === Set(C + 3L, C + 4L),
      s"got $got2 — rejected-doc copies must be judged by the RELEASE only")
    assert(ledgerOf(res2)("exact")._2 === 1L,
      "only the published copy drops at stage 1 — the rejected twin's " +
        "digest must not be in the exact index")

    // iterated self-consistency: the grown index ≡ release ∪ kept₁
    val expected2 = ids(Curation
      .curate(fx.release.union(kept1).union(shard2), Some(embAll2),
        semCentroids = Some(fx.frozen))
      .kept.filter(col("doc_id") >= C))
    assert(got2 === expected2,
      s"missed=${expected2.diff(got2)} extra=${got2.diff(expected2)}")
  }

  test("monotonic-id guard fails loudly; novel plant directions verified") {
    import spark.implicits._
    // after the two ingests the high-water mark is ≥ C+5: a shard whose
    // ids sit below it must be rejected loudly, not silently mis-curated
    val stale = Seq((250000L, "plant", "stale doc"))
      .toDF("doc_id", "source", "text")
    val e = intercept[IllegalArgumentException] {
      Curation.ingestShard(stale, None, fx.dir)
    }
    assert(e.getMessage.contains("monotonic-id"))

    // fixture precondition, brute force: the reversed base vectors the
    // semantic plants build on are genuinely novel directions — under
    // cosine 0.99 against EVERY real vector (else the planted keep/drop
    // verdicts above would not isolate the index-membership question)
    val vecs = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0d; var na = 0d; var nb = 0d
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    for (base <- Seq(17L, 42L)) {
      val rev = vecs(base).reverse
      val worst = vecs.values.map(cos(rev, _)).max
      assert(worst < 0.99,
        s"reverse(vec $base) has cosine $worst with a real vector — " +
          "pick a different plant base")
    }
  }

  test("exact-index probe is statically pruned to the shard's digest buckets") {
    import spark.implicits._
    val tiny = Seq((900000L, "plant", "just one probe doc"))
      .toDF("doc_id", "source", "text")
    val hits = Curation.exactHits(spark, tiny, fx.dir)
    hits.collect()
    val physical = hits.queryExecution.executedPlan.toString
    // a single-digest shard folds the one-element IN list to `pb = k`, so
    // accept either spelling — the property is a static pb filter beyond
    // the bare isnotnull, not the IN surface form
    val partFilter = physical.linesIterator
      .find(l => l.contains("PartitionFilters: [") &&
        (l.contains("pb") && (l.contains("IN (") || l.contains(" = "))))
    assert(partFilter.isDefined,
      "the exact-digest scan must carry a static partition filter on " +
        s"pb:\n${physical.linesIterator.take(40).mkString("\n")}")
  }

  test("shardDedupStats equals batch dedupStats over corpus ∪ shard, " +
      "restricted to the shard — full rows") {
    val all = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text")
    val corpus = all.filter(col("doc_id") < 250).localCheckpoint()
    import spark.implicits._
    // prefix plant whose spans are shared with the CORPUS only — pins the
    // index-side (nd_c) half of the count decomposition specifically
    val src = corpus.filter(size(split(col("text"), " ")) >= 25)
      .orderBy("doc_id").select("text").head().getString(0)
    val prefix = src.split(" ").take(12).mkString(" ")
    val shard = all.filter(col("doc_id") >= 250)
      .select((col("doc_id") + B).as("doc_id"), col("source"), col("text"))
      .union(Seq((B + 99999L, "plant", prefix))
        .toDF("doc_id", "source", "text"))
      .localCheckpoint()

    val dir = java.nio.file.Files
      .createTempDirectory("graft_gram_index").toString
    SubstringDedup.appendShingleIndex(corpus, SubstringDedup.declaredK, dir)

    val cols = Seq("doc_id", "n_tokens", "dup_tokens", "dup_frac", "keep")
    val got = SubstringDedup
      .shardDedupStats(shard, SubstringDedup.declaredK, dir, 0.5)
      .orderBy("doc_id").select(cols.map(col): _*).collect()
    val expected = SubstringDedup
      .dedupStats(corpus.union(shard), SubstringDedup.declaredK, 0.5)
      .filter(col("doc_id") >= B)
      .orderBy("doc_id").select(cols.map(col): _*).collect()
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g === e, s"$g != $e") }

    // fixture strength: the plant's budget came entirely from the index
    // side, and it is over budget
    val plant = got.find(_.getLong(0) === B + 99999L).get
    assert(plant.getLong(2) > 0L && !plant.getBoolean(4),
      s"corpus-only spans must drive the plant over budget: $plant")
  }

  test("compactRelease: probe/ingest verdicts identical on the compacted " +
      "twin; exact files drop to one per partition; gram rows merge") {
    import spark.implicits._
    val all = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").localCheckpoint()
    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val release = Curation.curate(all.filter(col("doc_id") < 200), Some(emb))
      .kept.localCheckpoint()
    val dirX = java.nio.file.Files
      .createTempDirectory("graft_curation_compactX").toString
    val dirY = java.nio.file.Files
      .createTempDirectory("graft_curation_compactY").toString
    Curation.writeIndexes(release, Some(emb), dirX)
    Curation.writeIndexes(release, Some(emb), dirY)

    def shardOf(base: Long) = all.filter(col("doc_id") >= 200)
      .select((col("doc_id") + base).as("doc_id"), col("source"), col("text"))
      .localCheckpoint()
    def resultOf(r: Curation.Result) = (
      r.kept.select("doc_id").collect().map(_.getLong(0)).toSet,
      r.ledger.collect().map(x =>
        (x.getString(1), x.getLong(2), x.getLong(3), x.getLong(4))).toSeq)
    // a SURVIVOR sharing a sub-budget 10-token passage with the release:
    // its appended gram rows duplicate release grams, which is what gives
    // the substring compaction real rows to merge (appends from gram-
    // disjoint shards compose without duplication by design)
    val relText = release.orderBy("doc_id").select("text").head().getString(0)
    val overlap = (relText.split(" ").take(10) ++
      (1 to 15).map(i => s"zq$i")).mkString(" ")
    // two ingests on each twin → multiple file sets per index (shard 2's
    // docs are exact copies of shard 1's fold-ins and all drop — itself a
    // probe of the appended exact index)
    for (base <- Seq(300000L, 600000L)) {
      val s = shardOf(base)
        .union(Seq((base + 99999L, "plant", overlap))
          .toDF("doc_id", "source", "text"))
        .localCheckpoint()
      val rX = resultOf(Curation.ingestShard(s, Some(emb), dirX))
      assert(rX === resultOf(Curation.ingestShard(s, Some(emb), dirY)))
      if (base == 300000L)
        assert(rX._1.contains(base + 99999L),
          "the partial-overlap plant must SURVIVE (0.4 < 0.5 budget) so " +
            "its shared grams are appended")
    }
    def parquetFiles(root: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(root))
    }
    // every stage index is versioned (round 12): measure the PUBLISHED
    // root only — superseded versions stay on disk as inert debris
    def pub(path: String): String =
      graft.core.Versioned.resolveRoot(spark, path)
    val exactBefore = parquetFiles(pub(s"$dirX/exact")).size
    val gramFilesBefore = parquetFiles(pub(s"$dirX/substring")).size
    val gramRowsBefore = spark.read.parquet(pub(s"$dirX/substring")).count()

    // crash injection: a dead half-written compaction build (a bare
    // version dir that never published) must be invisible to probes and
    // must not block the real compaction
    new java.io.File(s"$dirX/exact/v7/pb=0").mkdirs()
    val preCrash = resultOf(Curation.ingestShard(
      shardOf(800000L).localCheckpoint(), Some(emb), dirX))
    assert(resultOf(Curation.ingestShard(
      shardOf(800000L).localCheckpoint(), Some(emb), dirY)) === preCrash,
      "an unpublished debris version must not change any verdict")

    Curation.compactRelease(spark, dirX)

    val exactAfter = parquetFiles(pub(s"$dirX/exact"))
    assert(exactAfter.size < exactBefore,
      s"exact index files must shrink ($exactBefore → ${exactAfter.size})")
    assert(exactAfter.groupBy(_.getParentFile.getName).values
      .forall(_.size == 1), "expected one file per pb= partition")
    assert(pub(s"$dirX/exact").endsWith("/v8"),
      "compaction must publish PAST the dead debris version")
    val gramFilesAfter = parquetFiles(pub(s"$dirX/substring")).size
    assert(gramFilesAfter < gramFilesBefore,
      s"gram files must shrink ($gramFilesBefore → $gramFilesAfter)")
    val gramRowsAfter = spark.read.parquet(pub(s"$dirX/substring")).count()
    assert(gramRowsAfter < gramRowsBefore,
      s"per-append gram rows must merge ($gramRowsBefore → $gramRowsAfter)")

    // the next ingest sees identical verdicts and ledgers on both twins —
    // compaction was invisible to the pipeline. s3's copies of earlier
    // fold-ins all drop (probing the compacted exact index); the one
    // novel doc survives.
    val s3 = shardOf(900000L)
      .union(Seq((900000L + 99998L, "plant",
        (1 to 20).map(i => s"nv$i").mkString(" ")))
        .toDF("doc_id", "source", "text"))
      .localCheckpoint()
    val rX = resultOf(Curation.ingestShard(s3, Some(emb), dirX))
    val rY = resultOf(Curation.ingestShard(s3, Some(emb), dirY))
    assert(rX === rY)
    assert(rX._1 === Set(900000L + 99998L),
      "copies of fold-ins drop via the compacted index; the novel doc keeps")

    // the manifest reads the operational truth of both twins: same rows
    // and high-water mark everywhere (content identical), fewer files on
    // the compacted twin for the indexes s3's tiny fold-in didn't refragment
    def mf(d: String) = Curation.manifest(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val mX = mf(dirX); val mY = mf(dirY)
    assert(mX.keySet === Set("exact", "substring", "minhash", "semantic"))
    for (c <- mX.keySet) {
      assert(mX(c)._4 === 900000L + 99998L, s"$c high-water mark " +
        "(= s3's max id, the planted novel doc)")
      assert(mX(c)._4 === mY(c)._4)
      if (c != "substring") // compacted substring MERGED rows (by design)
        assert(mX(c)._1 === mY(c)._1, s"$c rows must match the twin")
    }
    assert(mX("exact")._2 < mY("exact")._2,
      "the compacted twin must carry fewer exact-index files")
  }
}
