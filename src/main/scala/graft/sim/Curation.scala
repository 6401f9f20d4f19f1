package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.text.SubstringDedup

/** End-to-end corpus curation (round 10) — the release pipeline a real
  * training-data run executes, composed from the four dedup modalities this
  * repo ships, IN THE ORDER THAT MAKES THEM SOUND, with a per-stage drop
  * ledger (the report a corpus release needs before anyone trusts it):
  *
  *  1. exact       — keep the min-id copy of each byte-identical text.
  *                   MUST run first: to every later stage a pair of exact
  *                   copies is 100%-mutual duplication, so the substring
  *                   filter would drop BOTH (each is entirely covered by
  *                   spans shared with the other) and no copy survives.
  *  2. substring   — drop docs whose duplicated-span budget exceeds
  *                   `maxDupFrac` ([[SubstringDedup.dedupStats]] verdict
  *                   over the exact-dedup survivors).
  *  3. near-dup    — pair detector → transitive clusters → keep each
  *                   component's min-id member ([[Dedup]]). The detector is
  *                   pluggable: MinHash banding by default (the unbounded
  *                   scale path), the exact token-Jaccard block join for the
  *                   oracled report ([[Similarity.tokenJaccardPairsOf]] —
  *                   the `dedup_clusters` anchor discipline).
  *  4. semantic    — SemDeDup over the embeddings of the surviving docs
  *                   ([[SemDedup.semDedupCorpus]]); docs without a vector
  *                   pass through (the stage can only judge what it can
  *                   see). Held out of the declared report (k-means is not
  *                   SQL-expressible; its own equality specs live in
  *                   SemDedupSpec).
  *
  * Each stage sees only the SURVIVORS of the previous one — the ordering is
  * semantic, not cosmetic (stage 2 depends on stage 1 as above; running the
  * pair stages on pre-shrunk input is also the cost order: the cheap exact
  * digest groupBy deflates the corpus before the shingle fan-out runs).
  *
  * Scale shape: every stage reduces to operators whose 100 TB posture is
  * already proven elsewhere in the repo (digest groupBy; shingle pipeline
  * with no pair fan-out; banded LSH with candidates ∝ answer;
  * cluster-partitioned IVF). The composition adds only slim id-set
  * semi-joins between stages. Stage survivor id sets are localCheckpointed
  * (cluster: `checkpoint`) — they are read twice each (next stage + ledger)
  * and the checkpoint caps the composed lineage at one stage deep, the
  * [[Dedup.connectedComponents]] discipline. The doc payload is fetched
  * once at the end by a single semi-join of the original corpus against the
  * final id set — full texts never flow THROUGH the stage chain. */
object Curation {

  /** `kept`: the surviving rows of `docs`, schema-preserving. `ledger`: one
    * row per executed stage — (stage_id, stage, n_in, n_dropped, n_out),
    * chained so each stage's n_in is the previous stage's n_out. */
  final case class Result(kept: DataFrame, ledger: DataFrame)

  /** The default near-dup pair detector: MinHash-banded candidates with the
    * exact-Jaccard verify — the corpus-size-unbounded path
    * ([[Dedup.dedupCorpus]]'s stage, volume-proven at 1M docs). */
  def minhashPairs(threshold: Double)(docs: DataFrame): DataFrame =
    MinHash.nearDupPairsUnordered(docs, "doc_id", "text", threshold = threshold)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))

  /** Run the four-stage pipeline over `docs` (+ optional `emb` keyed by
    * vec_id == doc_id for the semantic stage; `None` runs stages 1–3).
    * `semCentroids`: an explicit frozen centroid table for the semantic
    * stage (the [[SemDedup.semDedupCorpusWith]] form) — the shape the
    * incremental equality is stated against; `None` trains fresh ones. */
  /** Opt-in stage-0 LM quality gate: docs scoring below `minScore`
    * against the FROZEN `lm` drop before any dedup stage (the
    * RefinedWeb-style filter-then-dedup order — junk is cheapest to shed
    * first). Docs with no transitions (< 2 tokens) carry no LM evidence
    * and PASS — the same no-evidence-keeps convention as the semantic
    * stage's vectorless docs. */
  final case class Quality(lm: graft.text.LmScore.Lm, minScore: Double)

  private def qualityDrops(docs: DataFrame, q: Quality): DataFrame =
    graft.text.LmScore.score(docs, q.lm)
      .filter(col("lm_score") < q.minScore).select("doc_id")

  /** Opt-in benchmark-decontamination gate (stage 0b, after quality):
    * docs flagged against the persisted benchmark gram index at `dir`
    * ([[graft.text.DecontIndex]]) drop before any dedup stage — a
    * training release must not contain held-out eval content, and the
    * gate belongs BEFORE the dedup stages so a contaminated doc can
    * never win a dedup cluster and push the clean twin out of the
    * release. The index is EXTERNAL to the release (the eval battery is
    * not release content, unlike the release LM), so ingest never folds
    * anything into it — benchmark rotation is [[graft.text.DecontIndex]]
    * append/retract/compact against its own dir. */
  final case class Decont(dir: String,
      minHits: Int = graft.text.DecontIndex.DefaultMinHits)

  private def decontDrops(docs: DataFrame, dc: Decont): DataFrame =
    graft.text.DecontIndex.probeShardBloom(docs, dc.dir, dc.minHits)
      .select("doc_id")

  /** Opt-in boilerplate-line cleaning (stage 0c, after decontamination):
    * every surviving doc is rewritten with its boilerplate lines removed
    * ([[graft.text.LineIndex.probeShard]] against the line-frequency
    * index at `dir`) BEFORE any dedup stage — the only TEXT-TRANSFORM
    * stage in the loop, and it must run first: two docs differing only
    * in nav chrome become exact/near duplicates once the chrome is gone,
    * so cleaning after dedup would leak them both into the release. Docs
    * cleaned to EMPTY (every line boilerplate) drop here, on the ledger.
    * Like [[Decont]], the line index is EXTERNAL to the release — ingest
    * never folds shard lines into it; advancing it (the CCNet
    * accumulate-as-you-crawl loop) is [[graft.text.LineIndex]] append /
    * [[graft.stream.Streaming.streamLineIngest]] against its own dir.
    * NOTE: with this stage on, the release CONTENT is the cleaned text
    * (Result.kept and every release index digest reflect it), so a later
    * [[retract]] must carry the text AS RELEASED. */
  final case class LineClean(dir: String, minDf: Long = 3)

  /** (surviving ids, docs rewritten with cleaned text). Checkpointed: the
    * cleaning must not re-run per downstream stage. */
  private def lineCleanStage(docs: DataFrame,
      lc: LineClean): (DataFrame, DataFrame) = {
    val cleaned = graft.text.LineIndex
      .probeShard(docs, lc.dir, lc.minDf)
      .filter(col("n_kept") > 0).localCheckpoint()
    val rewritten = docs.drop("text")
      .join(cleaned.select(col("doc_id"), col("cleaned").as("text")),
        Seq("doc_id"))
      .localCheckpoint()
    // the id projection rides the already-checkpointed `cleaned` — a
    // cached-block scan; curate()'s ckptN pins (and counts) it once,
    // so checkpointing here again would just copy the same 8-byte rows
    (cleaned.select("doc_id"), rewritten)
  }

  /** Opt-in seed-set class filter (stage 0d, after line cleaning — it
    * must judge the text AS RELEASED): docs whose predicted class under
    * the FROZEN [[graft.text.Classify.Model]] is not in `keep` drop
    * before any dedup stage — the fastText-style domain/quality gate a
    * crawl release runs, placed ahead of dedup for the same reason as
    * [[Decont]]: an off-domain doc must never win a dedup cluster and
    * push an on-domain twin out of the release. The model is EXTERNAL
    * (trained on labeled seed corpora, never folded). Docs with no
    * classifiable evidence (every word OOV to every seed class) PASS —
    * the no-evidence-keeps convention shared by the quality and
    * semantic stages. */
  final case class ClassFilter(model: graft.text.Classify.Model,
      keep: Set[String])

  private def classDrops(docs: DataFrame, cf: ClassFilter): DataFrame =
    graft.text.Classify.classifyWith(docs, cf.model)
      .filter(!col("predicted").isin(cf.keep.toSeq: _*))
      .select("doc_id")

  def curate(docs: DataFrame, emb: Option[DataFrame],
      shingleK: Int = SubstringDedup.declaredK, maxDupFrac: Double = 0.5,
      nearDupPairs: DataFrame => DataFrame = minhashPairs(0.8),
      cosineThreshold: Double = 0.99, nCentroids: Int = 16,
      lloydIters: Int = 3, semCentroids: Option[DataFrame] = None,
      quality: Option[Quality] = None,
      decont: Option[Decont] = None,
      lineClean: Option[LineClean] = None,
      classFilter: Option[ClassFilter] = None): Result = {
    // Boundary id sets are checkpointed with their row count OBSERVED on
    // the same job (round 17): the ledger assembles from driver longs
    // the stage jobs already produced — the r16 driver-count ledger
    // still paid one cached-scan count job per boundary plus a
    // docs-scan count for the corpus size; now every count a stage
    // materializes is harvested for free and only boundaries no stage
    // job covered (none on the declared path) fall back to a count().
    val known = new java.util.IdentityHashMap[DataFrame, java.lang.Long]()
    def ckptN(df: DataFrame): DataFrame = {
      val obs = org.apache.spark.sql.Observation()
      val c = df.observe(obs, count(lit(1)).as("n")).localCheckpoint()
      known.put(c, Long.box(obs.get("n").asInstanceOf[Long]))
      c
    }
    val ids0 = docs.select("doc_id")

    // 0. quality (optional): LM gate against a frozen LM — an anti-join
    // of the scored drops so no-evidence docs pass
    val idsQ = quality.fold(ids0) { q =>
      ckptN(ids0.join(qualityDrops(docs, q), Seq("doc_id"), "left_anti"))
    }
    val dq = quality.fold(docs)(_ => docs.join(idsQ, Seq("doc_id"),
      "left_semi"))

    // 0b. decontamination (optional): benchmark-flagged docs drop —
    // per-doc membership, so the gate commutes with everything downstream
    val idsD = decont.fold(idsQ) { dc =>
      ckptN(idsQ.join(decontDrops(dq, dc), Seq("doc_id"), "left_anti"))
    }
    val dd = decont.fold(dq)(_ => docs.join(idsD, Seq("doc_id"),
      "left_semi"))

    // 0c. line cleaning (optional): the text-transform stage — docs are
    // REWRITTEN without their boilerplate lines before any dedup sees
    // them ([[LineClean]]); fully-boilerplate docs drop here
    val (idsL0, dl) = lineClean.fold((idsD, dd))(lineCleanStage(dd, _))
    val idsL = if (lineClean.isDefined) ckptN(idsL0) else idsL0

    // 0d. class filter (optional): per-doc membership against the frozen
    // seed-set classifier, on the text as released
    val idsC = classFilter.fold(idsL) { cf =>
      ckptN(idsL.join(classDrops(dl, cf), Seq("doc_id"), "left_anti"))
    }
    val dcf = classFilter.fold(dl)(_ => dl.join(idsC, Seq("doc_id"),
      "left_semi").localCheckpoint())

    // 1. exact: one digest-keyed aggregate; the 8-byte xxhash64 carries the
    // text's equality structure through the exchange (the dedup_exact
    // argument — collisions ≈ n²·2⁻⁶⁵). |dcf| ≡ |idsC| (a semi-join of
    // docs against idsC, or docs itself when every filter is off), so
    // observing dcf's row count inside this job hands the ledger the
    // exact-stage n_in without any extra scan.
    val obsIn = org.apache.spark.sql.Observation()
    val ids1 = ckptN(dcf.observe(obsIn, count(lit(1)).as("n"))
      .groupBy(xxhash64(col("text")).as("th"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id"))
    if (!known.containsKey(idsC))
      known.put(idsC, Long.box(obsIn.get("n").asInstanceOf[Long]))

    // 2. substring budget over the stage-1 survivors
    val d1 = dcf.join(ids1, Seq("doc_id"), "left_semi")
    val ids2 = ckptN(SubstringDedup.dedupStats(d1, shingleK, maxDupFrac)
      .filter(col("keep")).select("doc_id"))

    // 3. near-dup pairs → components → min-id keep over stage-2 survivors
    val d2 = dcf.join(ids2, Seq("doc_id"), "left_semi")
    val drop3 = Dedup.clusters(nearDupPairs(d2), "doc_a", "doc_b")
      .filter(!col("keep")).select(col("member").as("doc_id"))
    val ids3 = ckptN(ids2.join(drop3, Seq("doc_id"), "left_anti"))

    // 4. semantic (optional): SemDeDup the survivors' vectors; a doc with
    // no vector is kept — only ids that LOSE a semantic verdict drop.
    val ids4 = emb match {
      case None => ids3
      case Some(e) =>
        val vecs = e
          .select(col("vec_id"), col("embedding").cast("array<double>")
            .as("embedding"))
          .join(ids3.select(col("doc_id").as("vec_id")), Seq("vec_id"),
            "left_semi")
          .localCheckpoint()
        val keptVec = (semCentroids match {
          case Some(c) => SemDedup.semDedupCorpusWith(vecs, c, cosineThreshold)
          case None =>
            SemDedup.semDedupCorpus(vecs, cosineThreshold, nCentroids,
              lloydIters)
        }).select(col("vec_id").as("doc_id"))
        val drop4 = vecs.select(col("vec_id").as("doc_id"))
          .join(keptVec, Seq("doc_id"), "left_anti")
        ckptN(ids3.join(drop4, Seq("doc_id"), "left_anti"))
    }

    val stages =
      (if (quality.isDefined) Seq(("quality", ids0, idsQ)) else Nil) ++
      (if (decont.isDefined) Seq(("decont", idsQ, idsD)) else Nil) ++
      (if (lineClean.isDefined) Seq(("line_clean", idsD, idsL)) else Nil) ++
      (if (classFilter.isDefined) Seq(("class_filter", idsL, idsC))
       else Nil) ++
      Seq(("exact", idsC, ids1), ("substring", ids1, ids2),
        ("near_dup", ids2, ids3)) ++
      (if (emb.isDefined) Seq(("semantic", ids3, ids4)) else Nil)
    val ledger = ledgerOf(docs.sparkSession, stages, known)

    // kept text is the text the dedup stages judged — CLEANED when the
    // line stage is on (dl = dd otherwise)
    Result(dcf.join(ids4, Seq("doc_id"), "left_semi"), ledger)
  }

  /** Assemble the per-stage ledger from DRIVER-side counts of the stage
    * id sets (round 16, measured −10% on `curation_report` at sf0.1;
    * round 17: counts arrive pre-observed). EAGER CONTRACT (ADVICE r16,
    * documented): invoking [[curate]]/[[ingestShard]] runs the counting
    * as part of the stage jobs themselves — since round 17 every
    * boundary a caller's `known` map covers was observed on the stage's
    * own checkpoint job (zero extra actions; a discarded ledger costs
    * nothing new), and only uncovered boundaries (none on the declared
    * path) fall back to one tiny cached-block count each, memoized per
    * frame reference. Counts are k-bounded driver state (one long per
    * stage — the tokenizer-argmax discipline). */
  private def ledgerOf(spark: SparkSession,
      stages: Seq[(String, DataFrame, DataFrame)],
      known: java.util.IdentityHashMap[DataFrame, java.lang.Long] =
        new java.util.IdentityHashMap[DataFrame, java.lang.Long]())
      : DataFrame = {
    import spark.implicits._
    def n(df: DataFrame): Long = {
      val hit = known.get(df)
      if (hit != null) hit.longValue()
      else { val c = df.count(); known.put(df, Long.box(c)); c }
    }
    stages.zipWithIndex.map { case ((name, in, out), i) =>
      val (ni, no) = (n(in), n(out))
      (i + 1, name, ni, ni - no, no)
    }.toDF("stage_id", "stage", "n_in", "n_dropped", "n_out")
      .orderBy("stage_id")
  }

  /** The one-row release summary: corpus size, per-stage drops, final keep
    * count and fraction — a conditional-aggregation pivot of the ledger
    * (≤4 tiny rows). Declared as `curation_report` with the deterministic
    * stages only (emb = None, token-Jaccard detector). */
  def report(docs: DataFrame, emb: Option[DataFrame],
      nearDupPairs: DataFrame => DataFrame = minhashPairs(0.8)): DataFrame =
    curate(docs, emb, nearDupPairs = nearDupPairs).ledger.agg(
        sum(when(col("stage") === "exact", col("n_in"))).as("n_docs"),
        sum(when(col("stage") === "exact", col("n_dropped")))
          .as("exact_dropped"),
        sum(when(col("stage") === "substring", col("n_dropped")))
          .as("substring_dropped"),
        sum(when(col("stage") === "near_dup", col("n_dropped")))
          .as("neardup_dropped"),
        coalesce(sum(when(col("stage") === "semantic", col("n_dropped"))),
          lit(0L)).as("semantic_dropped"),
        max_by(col("n_out"), col("stage_id")).as("n_kept"))
      .withColumn("kept_frac", col("n_kept").cast("double") / col("n_docs"))

  // ------------------------------------------------------------------
  // incremental form: curate new shards against a persisted RELEASE
  // ------------------------------------------------------------------
  //
  // On-disk layout under `dir` — one sub-index per stage, each the stage's
  // own persisted-index format so every probe inherits that stage's proven
  // scale shape (static partition pruning, Bloom map-side prune, frozen
  // centroids). As of round 12 ALL four stage indexes are VERSIONED
  // ([[graft.core.Versioned]]: `_CURRENT` pointer + `v<N>` roots), so
  // compaction republishes atomically instead of overwriting in place —
  // the r11 crash-window fix:
  //
  //   dir/exact      versioned; (pb, th, doc_id) — xxhash64 text digests
  //                  of the release (one per digest, min doc_id),
  //                  partitioned by pb = th mod ExactParts
  //   dir/substring  versioned; the [[SubstringDedup.appendShingleIndex]]
  //                  gram table
  //   dir/minhash    versioned; the [[IncrementalDedup.writeIndex]] band
  //                  table
  //   dir/semantic   the [[SemDedup.writeIndex]] versioned IVF index
  //                  (only when the release has embeddings)
  //   dir/meta       one row (max_id) — the composition-level monotonic-id
  //                  high-water mark, checked and advanced on every ingest
  //
  // THE INDEX IS THE RELEASE. [[writeIndexes]] takes the already-curated
  // corpus ([[curate]]'s `kept`), and [[ingestShard]] folds in only the
  // shard rows that SURVIVE — deliberately unlike the single-stage ingest
  // helpers, which append the full probed shard so transitivity through a
  // dropped member keeps working. A release pipeline must not let
  // documents it DID NOT PUBLISH influence future verdicts: a shard doc
  // sharing spans only with a rejected doc is not duplicating the release.
  // The two contracts coincide on the initial write because a curated
  // corpus is a FIXPOINT of [[curate]] (exact: no equal texts survive;
  // substring: removing docs only shrinks budgets; near-dup/semantic: two
  // surviving reps of different clusters are non-dups by construction) —
  // it contains no internal dups, so "all corpus docs" and "kept docs"
  // are the same set, and each stage's probe-equality theorem applies
  // verbatim with the release as the corpus.
  //
  // CONTRACT (CurationIngestSpec pins both): under monotonic ids,
  //   ingestShard(shard) ≡ curate(release ∪ shard, semCentroids = frozen)
  // restricted to the shard's doc ids — and iterating ingest is
  // self-consistent because release ∪ kept stays a fixpoint. Corpus
  // verdicts are FROZEN (the published release is immutable); the one
  // batch-vs-incremental divergence that freezing creates is the
  // substring back-channel — a shard doc's spans can push a BATCH corpus
  // doc over budget — and it is exactly the behavior a release pipeline
  // must not have.

  private val ExactParts = 64

  import graft.core.Versioned

  /** One row per distinct text digest with the digest's kept doc_id (the
    * release is a [[curate]] fixpoint, so digest ↔ doc is 1:1) — the
    * doc_id is what makes a digest RETRACTABLE ([[retract]]). */
  private def digests(docs: DataFrame): DataFrame =
    docs.groupBy(xxhash64(col("text")).as("th"))
      .agg(min(col("doc_id")).as("doc_id"))
      .withColumn("pb", pmod(col("th"), lit(ExactParts)).cast("int"))

  private def metaOf(spark: SparkSession, dir: String): Long = {
    import spark.implicits._
    graft.core.Meta.read(spark, dir).select("max_id").as[Long].head()
  }

  private def writeMetaOf(spark: SparkSession, dir: String, maxId: Long): Unit = {
    import spark.implicits._
    // crash-safe retire-then-replace publish (core/Meta, ADVICE r12)
    graft.core.Meta.write(Seq(maxId).toDF("max_id"), dir)
  }

  /** Persist the per-stage release indexes for `release` (the `kept` of a
    * [[curate]] run — the fixpoint argument above is what makes building
    * from the kept rows sound). `emb` carries the release's embeddings;
    * `None` skips the semantic index and [[ingestShard]] then runs
    * stages 1–3. */
  def writeIndexes(release: DataFrame, emb: Option[DataFrame], dir: String,
      shingleK: Int = SubstringDedup.declaredK, nCentroids: Int = 16,
      lloydIters: Int = 3, pqM: Int = 0,
      lmQuality: Boolean = false): Unit = {
    val spark = release.sparkSession
    // each stage index writes a complete v1 and publishes it — the same
    // build-then-flip discipline as [[SemDedup.writeIndex]]
    def versioned(path: String)(build: String => Unit): Unit = {
      val version = Versioned.nextVersion(spark, path)
      build(s"$path/$version")
      Versioned.publish(spark, path, version)
    }
    versioned(s"$dir/exact") { root =>
      digests(release).write.mode("overwrite").partitionBy("pb").parquet(root)
    }
    // the gram table is append-only by design; the initial build IS the
    // first append
    versioned(s"$dir/substring") { root =>
      SubstringDedup.appendShingleIndex(release, shingleK, root)
    }
    versioned(s"$dir/minhash") { root =>
      IncrementalDedup.writeIndex(release, "doc_id", "text", root)
    }
    emb.foreach { e =>
      SemDedup.writeIndex(
        e.join(release.select(col("doc_id").as("vec_id")), Seq("vec_id"),
          "left_semi"),
        s"$dir/semantic", nCentroids, lloydIters, pqM = pqM)
    }
    // optional: the release LM for [[ingestShard]]'s stage-0 quality
    // gate — trained on the RELEASE (the-index-is-the-release: only
    // published survivors define "what the corpus sounds like"), its own
    // versioned index ([[graft.text.LmScore.writeLm]])
    if (lmQuality)
      graft.text.LmScore.writeLm(release.select("doc_id", "text"),
        s"$dir/lm")
    val maxId = release.agg(max(col("doc_id").cast("long"))).head() match {
      case r if r.isNullAt(0) => Long.MinValue
      case r                  => r.getLong(0)
    }
    writeMetaOf(spark, dir, maxId)
  }

  /** The release's tombstone set (doc_id), `None` before any
    * [[retract]]. Probes anti-join it; compaction physically drops the
    * tombstoned rows and clears it. */
  private def tombstonesOf(spark: SparkSession,
      dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Shard doc_ids whose digest is already in the release — exposed so the
    * spec can plan-gate the static `pb` pruning on exactly the join that
    * reads the exact index (the [[IncrementalDedup.corpusHits]]
    * discipline: an IN list over ≤ [[ExactParts]] driver-side values, so
    * a bare unfiltered shard still never scans the full digest table).
    * Retracted digests do not hit (tombstone anti-join on the index's
    * kept doc_id). */
  private[graft] def exactHits(spark: SparkSession, shard: DataFrame,
      dir: String): DataFrame = {
    val sh = shard
      .select(col("doc_id"), xxhash64(col("text")).as("th"),
        pmod(xxhash64(col("text")), lit(ExactParts)).cast("int").as("pb"))
      .localCheckpoint()
    val buckets = sh.select("pb").distinct().collect().map(_.getInt(0)).toSeq
    val idx0 = spark.read
      .parquet(Versioned.resolveRoot(spark, s"$dir/exact"))
      .filter(col("pb").isin(buckets: _*))
    val idx = tombstonesOf(spark, dir)
      .fold(idx0)(t => idx0.join(t, Seq("doc_id"), "left_anti"))
    sh.join(idx, Seq("th"), "left_semi").select("doc_id")
  }

  /** Curate one new shard against the persisted release at `dir`, at shard
    * cost, and fold the survivors in: probe → per-stage drop ledger →
    * append. Returns the same [[Result]] shape as [[curate]]. The kept
    * verdict is MATERIALIZED before any append (the
    * [[IncrementalDedup.ingestShard]] discipline — a lazy plan evaluated
    * after the fold-in would re-probe the grown index and every survivor
    * would match itself). `nprobe` widens the semantic corpus probe
    * ([[SemDedup.semDedupShard]]'s recall/cost knob). */
  def ingestShard(shard: DataFrame, emb: Option[DataFrame], dir: String,
      shingleK: Int = SubstringDedup.declaredK, maxDupFrac: Double = 0.5,
      minhashThreshold: Double = 0.8, cosineThreshold: Double = 0.99,
      nprobe: Int = 1, pqMargin: Option[Double] = None,
      lmMinScore: Option[Double] = None,
      decont: Option[Decont] = None,
      lineClean: Option[LineClean] = None,
      classFilter: Option[ClassFilter] = None,
      stageTimer: Option[(String, Double) => Unit] = None): Result = {
    val spark = shard.sparkSession
    // per-stage wall clock (CurationVolume's breakdown): every stage's
    // verdict ends in an EAGER localCheckpoint, so timing the block is
    // timing the stage's actual work, not lazy plan construction
    def timed[T](name: String)(f: => T): T = stageTimer match {
      case None => f
      case Some(cb) =>
        val t = System.nanoTime()
        val r = f
        cb(name, (System.nanoTime() - t) / 1e9)
        r
    }
    val maxSeen = metaOf(spark, dir)
    val bounds = shard.agg(min(col("doc_id").cast("long")),
      max(col("doc_id").cast("long"))).head()
    require(bounds.isNullAt(0) || bounds.getLong(0) > maxSeen,
      s"monotonic-id ingest contract violated: shard min id " +
        s"${bounds.getLong(0)} <= release high-water mark $maxSeen")
    val ids0 = shard.select("doc_id")
    val tomb = tombstonesOf(spark, dir)

    // 0. quality (optional) — the shard scored against the RELEASE LM at
    // `dir/lm` ([[writeIndexes]](lmQuality = true)), resolved BEFORE any
    // append so the verdict is against the pre-shard release; survivors'
    // counts fold in at the end, keeping the LM = the release's LM
    val (idsQ, sq) = timed("quality") {
      val i = lmMinScore.fold(ids0) { thr =>
        ids0.join(
            qualityDrops(shard, Quality(
              graft.text.LmScore.readLm(spark, s"$dir/lm"), thr)),
            Seq("doc_id"), "left_anti")
          .localCheckpoint()
      }
      (i, lmMinScore.fold(shard)(_ => shard.join(i, Seq("doc_id"),
        "left_semi").localCheckpoint()))
    }

    // 0b. decontamination (optional) — the shard probed against the
    // EXTERNAL benchmark gram index ([[Decont]]); nothing ever folds
    // back into it, so unlike the release LM there is no append step
    val (idsD, sd) = timed("decont") {
      val i = decont.fold(idsQ) { dc =>
        idsQ.join(decontDrops(sq, dc), Seq("doc_id"), "left_anti")
          .localCheckpoint()
      }
      (i, decont.fold(sq)(_ => shard.join(i, Seq("doc_id"),
        "left_semi").localCheckpoint()))
    }

    // 0c. line cleaning (optional) — the shard is REWRITTEN without its
    // boilerplate lines before any probe ([[LineClean]]): the release
    // indexes hold digests of CLEANED text, so the probe must compare
    // like with like. The line index is EXTERNAL ([[Decont]] posture) —
    // nothing folds into it here; the caller advances it per shard
    val (idsL, sl) = timed("line_clean") {
      lineClean.fold((idsD, sd))(lineCleanStage(sd, _))
    }

    // 0d. class filter (optional) — the frozen seed-set classifier
    // ([[ClassFilter]]), on the text as released; EXTERNAL like the
    // decont index, nothing ever folds into the model
    val (idsC, sc) = timed("class_filter") {
      val i = classFilter.fold(idsL) { cf =>
        idsL.join(classDrops(sl, cf), Seq("doc_id"), "left_anti")
          .localCheckpoint()
      }
      (i, classFilter.fold(sl)(_ => sl.join(i, Seq("doc_id"),
        "left_semi").localCheckpoint()))
    }

    // 1. exact — within-shard min-id per digest, minus release hits
    // (exactHits already honors the tombstones)
    val ids1 = timed("exact") {
      val within1 = sc
        .groupBy(xxhash64(col("text")).as("th"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      within1.join(exactHits(spark, sc, dir), Seq("doc_id"),
        "left_anti").localCheckpoint()
    }

    // 2. substring budget over corpus∪shard counts, shard cost (retracted
    // docs left NEGATIVE gram rows — the probe's per-gram sum already
    // excludes them, no tombstone plumbing needed)
    val ids2 = timed("substring") {
      val d1 = sc.join(ids1, Seq("doc_id"), "left_semi")
      SubstringDedup
        .shardDedupStats(d1, shingleK,
          Versioned.resolveRoot(spark, s"$dir/substring"), maxDupFrac)
        .filter(col("keep")).select("doc_id").localCheckpoint()
    }

    // 3. MinHash near-dup against the band index and within the shard
    val ids3 = timed("near_dup") {
      val d2 = sc.join(ids2, Seq("doc_id"), "left_semi").localCheckpoint()
      IncrementalDedup.dedupShard(spark, d2, "doc_id", "text",
          Versioned.resolveRoot(spark, s"$dir/minhash"), minhashThreshold,
          excludeIds = tomb.map(_.select(col("doc_id").as("id"))))
        .select("doc_id").localCheckpoint()
    }

    // 4. semantic probe of the survivors' vectors against the IVF index;
    // vectorless docs pass through ([[curate]]'s stage-4 contract)
    val ids4 = timed("semantic") { emb match {
      case None => ids3
      case Some(e) =>
        val vecs = e
          .select(col("vec_id"), col("embedding").cast("array<double>")
            .as("embedding"))
          .join(ids3.select(col("doc_id").as("vec_id")), Seq("vec_id"),
            "left_semi")
          .localCheckpoint()
        val keptVec = SemDedup.semDedupShard(spark, vecs, s"$dir/semantic",
            cosineThreshold, nprobe,
            excludeIds = tomb.map(_.select(col("doc_id").as("vec_id"))),
            pqMargin = pqMargin)
          .select(col("vec_id").as("doc_id"))
        val drop4 = vecs.select(col("vec_id").as("doc_id"))
          .join(keptVec, Seq("doc_id"), "left_anti")
        ids3.join(drop4, Seq("doc_id"), "left_anti").localCheckpoint()
    } }

    // fold the SURVIVORS into every index (the-index-is-the-release
    // contract above), verdict already materialized via localCheckpoint.
    // kept text is what the probes judged — CLEANED when the line stage
    // is on (sl = sd otherwise), so the folded digests match the release
    val kept = timed("fold_in") {
      val k = sc.join(ids4, Seq("doc_id"), "left_semi").localCheckpoint()
      digests(k).write.mode("append").partitionBy("pb")
        .parquet(Versioned.resolveRoot(spark, s"$dir/exact"))
      SubstringDedup.appendShingleIndex(k, shingleK,
        Versioned.resolveRoot(spark, s"$dir/substring"))
      IncrementalDedup.appendIndex(k, "doc_id", "text",
        Versioned.resolveRoot(spark, s"$dir/minhash"))
      emb.foreach { e =>
        SemDedup.appendIndex(
          e.join(k.select(col("doc_id").as("vec_id")), Seq("vec_id"),
            "left_semi"),
          s"$dir/semantic")
      }
      // survivors' n-gram counts fold into the release LM (mergeable
      // counts — [[graft.text.LmScore.appendLm]]), so the next shard is
      // judged against "the release including this shard", exactly like
      // every other stage index
      if (lmMinScore.isDefined)
        graft.text.LmScore.appendLm(k.select("doc_id", "text"),
          s"$dir/lm")
      if (!bounds.isNullAt(1)) writeMetaOf(spark, dir, bounds.getLong(1))
      k
    }

    val stages =
      (if (lmMinScore.isDefined) Seq(("quality", ids0, idsQ)) else Nil) ++
      (if (decont.isDefined) Seq(("decont", idsQ, idsD)) else Nil) ++
      (if (lineClean.isDefined) Seq(("line_clean", idsD, idsL)) else Nil) ++
      (if (classFilter.isDefined) Seq(("class_filter", idsL, idsC))
       else Nil) ++
      Seq(("exact", idsC, ids1), ("substring", ids1, ids2),
        ("near_dup", ids2, ids3)) ++
      (if (emb.isDefined) Seq(("semantic", ids3, ids4)) else Nil)
    Result(kept, ledgerOf(spark, stages))
  }

  /** Compact the release indexes after an ingest run — the loop's
    * maintenance step: every [[ingestShard]] appends one file set per
    * stage index, so after S shards each probe opens O(S) small files.
    *
    * As of round 12 every stage index is versioned, so each compaction
    * writes a complete `v<N+1>` from the still-live current version and
    * flips the pointer LAST ([[graft.core.Versioned]]) — a crash at any
    * point leaves the published version fully intact and the half-built
    * one as inert debris (CurationIngestSpec's crash-injection block pins
    * it), closing the r11 materialize-then-overwrite window. Exact and
    * MinHash rewrite row-identical with one file per `pb=` partition
    * (minus any tombstoned rows — see below); the substring gram table
    * additionally MERGES its per-append rows — probes SUM `nd` per gram,
    * so pre-summing duplicates is an identity the probe can no longer
    * tell apart, and both file count and row count shrink (fully
    * retracted grams sum to 0 and drop).
    *
    * Compaction is also where [[retract]]ion becomes PHYSICAL: the
    * tombstoned rows are dropped from the new exact/minhash/semantic
    * versions, and the tombstone set is cleared LAST — a crash mid-way
    * leaves some indexes compacted and the tombstones still present, so
    * probes keep excluding the retracted docs either way (the anti-join
    * is a no-op once the rows are gone). */
  def compactRelease(spark: SparkSession, dir: String): Unit = {
    val tomb = tombstonesOf(spark, dir).map(_.localCheckpoint())
    def compact(path: String, transform: DataFrame => DataFrame,
        partCol: Option[String]): Unit = {
      val root = Versioned.resolveRoot(spark, path)
      val version = Versioned.nextVersion(spark, path)
      val df = transform(spark.read.parquet(root))
      partCol match {
        case Some(c) => df.repartition(col(c)).write.mode("overwrite")
          .partitionBy(c).parquet(s"$path/$version")
        case None => df.coalesce(1).write.mode("overwrite")
          .parquet(s"$path/$version")
      }
      Versioned.publish(spark, path, version)
    }
    def dropTomb(on: String)(df: DataFrame): DataFrame =
      tomb.fold(df)(t =>
        df.join(t.select(col("doc_id").as(on)), Seq(on), "left_anti"))
    compact(s"$dir/exact", dropTomb("doc_id"), Some("pb"))
    // the minhash index is TWO tables under one versioned root (the
    // slim-bands layout, IncrementalDedup.withBucket note): compact both
    // into the same new version, one file per partition each, pointer
    // flip last
    locally {
      val path = s"$dir/minhash"
      val root = Versioned.resolveRoot(spark, path)
      val version = Versioned.nextVersion(spark, path)
      dropTomb("id")(spark.read.parquet(s"$root/bands"))
        .repartition(col("pb")).write.mode("overwrite")
        .partitionBy("pb").parquet(s"$path/$version/bands")
      dropTomb("id")(spark.read.parquet(s"$root/toks"))
        .repartition(col("pt")).write.mode("overwrite")
        .partitionBy("pt").parquet(s"$path/$version/toks")
      Versioned.publish(spark, path, version)
    }
    compact(s"$dir/substring",
      _.groupBy("gh").agg(sum(col("nd")).as("nd"))
        .filter(col("nd") =!= 0L),
      None)
    if (Versioned.isVersioned(spark, s"$dir/semantic"))
      SemDedup.compactIndex(spark, s"$dir/semantic",
        dropIds = tomb.map(_.select(col("doc_id").as("vec_id"))))
    // the release LM, when the quality gate is on: per-shard count rows
    // re-sum to one row per n-gram and zeroed rows (fully retracted
    // mass — [[retract]] appends NEGATED counts rather than using the id
    // tombstones, since the LM is a count summary, not a membership
    // structure) drop physically — both identities to the reader, which
    // aggregates anyway
    if (Versioned.isVersioned(spark, s"$dir/lm"))
      graft.text.LmScore.compactLm(spark, s"$dir/lm")
    // clear the tombstones LAST — their exclusions are now physical
    tomb.foreach { _ =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
  }

  /** Retract published documents from the release — the takedown path the
    * append-only contract cannot express by itself (r11 what's-missing
    * #3): after `retract(rows)`, no future probe verdict references the
    * retracted docs, so a NEW shard doc identical to a retracted one is
    * KEPT (it no longer duplicates anything the release still publishes).
    * `retracted` must carry the release rows being taken down (doc_id +
    * text — a takedown request has the content); `emb` is unused today
    * (vector exclusion rides on the id tombstones) but kept for signature
    * symmetry with [[ingestShard]].
    *
    * Mechanics per stage index:
    *  - exact / minhash / semantic: the doc_ids land in
    *    `dir/tombstones`; probes anti-join it ([[exactHits]],
    *    [[IncrementalDedup.dedupShard]], [[SemDedup.semDedupShard]])
    *    until the next [[compactRelease]] drops the rows physically and
    *    clears the set.
    *  - substring: the gram table stores per-gram COUNTS, not doc ids, so
    *    retraction appends the retracted docs' gram counts NEGATED
    *    ([[SubstringDedup.retractShingleIndex]]) — probes sum `nd` per
    *    gram, so the subtraction is exact under the disjoint-shard
    *    contract, and compaction drops the zeroed grams.
    * The high-water mark is untouched: retracted ids stay burned (a
    * re-ingest under an old id would violate monotonicity anyway).
    *
    * Idempotent at doc granularity: already-tombstoned ids are filtered
    * out first, so a replayed retraction cannot double-subtract gram
    * counts. Commit order is tombstones THEN gram negatives — a crash
    * between the two leaves the retracted docs' grams counted stale-high,
    * which errs CONSERVATIVE (a later identical doc may be over-dropped
    * by the substring budget, never under-dropped); a rebuild via
    * [[writeIndexes]] clears the residue. */
  def retract(retracted: DataFrame, emb: Option[DataFrame], dir: String,
      shingleK: Int = SubstringDedup.declaredK): Unit = {
    val spark = retracted.sparkSession
    val fresh = tombstonesOf(spark, dir)
      .fold(retracted)(t => retracted.join(t, Seq("doc_id"), "left_anti"))
      .localCheckpoint()
    fresh.select(col("doc_id").cast("long").as("doc_id"))
      .coalesce(1).write.mode("append").parquet(s"$dir/tombstones")
    SubstringDedup.retractShingleIndex(fresh, shingleK,
      Versioned.resolveRoot(spark, s"$dir/substring"))
    // release LM (quality gate on): subtract the retracted docs' n-gram
    // mass exactly by appending NEGATED count rows — readers sum, so
    // future quality verdicts stop reflecting the taken-down content;
    // replay-safe through the same `fresh` doc-level idempotence filter
    if (Versioned.isVersioned(spark, s"$dir/lm"))
      graft.text.LmScore.appendLm(fresh.select("doc_id", "text"),
        s"$dir/lm", negate = true)
  }

  /** One row per release-index component — the operational view of what
    * the ingest loop has built: row count, parquet file count (the
    * compaction trigger: files ≫ partitions means appends have fragmented
    * the index), bytes on disk, and the monotonic-id high-water mark.
    * Driver-side listing of index DIRECTORIES only (k-bounded — never
    * reads data PAGES); row counts come from the parquet FOOTERS of the
    * same files the listing already visits (r11 what's-wrong #3: the
    * earlier `spark.read.parquet(path).count()` re-listed and re-opened
    * every footer as a Spark job — exactly the O(files) tax the manifest
    * exists to expose). */
  def manifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    def stats(path: String): Option[(Long, Long, Long)] = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) None
      else {
        val it = fs.listFiles(p, true)
        var files = 0L; var bytes = 0L; var rows = 0L
        while (it.hasNext) {
          val f = it.next()
          if (f.getPath.getName.endsWith(".parquet")) {
            files += 1; bytes += f.getLen
            val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile
                .fromStatus(f, conf))
            try rows += rd.getRecordCount finally rd.close()
          }
        }
        Some((rows, files, bytes))
      }
    }
    // every stage index is versioned: list the PUBLISHED root only —
    // superseded versions are inert debris the probes never read
    def published(path: String): Option[String] =
      if (Versioned.isVersioned(spark, path))
        Some(Versioned.resolveRoot(spark, path))
      else None
    // reclaimable = bytes held by superseded/dead versions of the
    // component — what a Versioned.sweep of its family dir frees; the
    // retention decision becomes a column instead of a du(1) expedition
    val components =
      Seq(("exact", published(s"$dir/exact"), s"$dir/exact"),
        ("substring", published(s"$dir/substring"), s"$dir/substring"),
        ("minhash", published(s"$dir/minhash"), s"$dir/minhash"),
        ("semantic", published(s"$dir/semantic").map(r => s"$r/assigned"),
          s"$dir/semantic"),
        ("tombstones", Some(s"$dir/tombstones"), ""))
        .collect { case (name, Some(path), fam) => (name, path, fam) }
    val maxId = metaOf(spark, dir)
    components.flatMap { case (name, path, fam) =>
      stats(path).map { case (rows, files, bytes) =>
        val reclaimable =
          if (fam.isEmpty) 0L else Versioned.reclaimableBytes(spark, fam)
        (name, rows, files, bytes, maxId, reclaimable)
      }
    }.toDF("component", "n_rows", "n_files", "bytes", "max_id",
      "reclaimable_bytes")
  }

  /** Retention sweep over every versioned release component
    * ([[graft.core.Versioned.sweep]] per family): deletes superseded
    * versions and dead staging dirs that [[compactRelease]] and rebuilds
    * leave behind as crash fallbacks. Returns one (component, n_swept,
    * bytes) row per family. Run it AFTER the compacted version has been
    * probed in anger — until then the superseded version IS the
    * rollback. Single-writer contract as everywhere. */
  def sweepRelease(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Seq("exact", "substring", "minhash", "semantic", "lm")
      .map { c =>
        val (n, bytes) = Versioned.sweep(spark, s"$dir/$c")
        (c, n, bytes)
      }.toDF("component", "n_swept", "bytes")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // One-row curation dashboard over the three DETERMINISTIC stages
    // (exact → substring → token-Jaccard near-dup), hash-checked end to
    // end against a DuckDB rebuild of the same three stages — the
    // composition is what's under test here; each stage's own query
    // family (`dedup_exact`, `text_substring_dedup_filter`,
    // `dedup_clusters`) anchors its internals separately.
    "curation_report" -> ((s, d) =>
      report(Tables.documents(s, d), None,
        nearDupPairs = Similarity.tokenJaccardPairsOf(_)))
  )

  /** DuckDB rebuild of the three deterministic stages, composed from the
    * SAME CTE bodies the per-stage oracles use
    * ([[SubstringDedup.spanCteBodyOver]], [[Dedup.reachCteBodyOver]]) so
    * the stage semantics cannot drift between the standalone queries and
    * the composition. */
  def oracleSql: Map[String, String] = Map(
    "curation_report" ->
      s"""WITH RECURSIVE
         |k1 AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
         |d1 AS (SELECT d.* FROM documents d JOIN k1 USING (doc_id)),
         |${SubstringDedup.spanCteBodyOver("d1")},
         |per_doc AS (SELECT doc_id, CAST(SUM(span_len) AS BIGINT)
         |    AS dup_tokens FROM spans GROUP BY doc_id),
         |d2 AS (SELECT d.* FROM d1 d LEFT JOIN per_doc p USING (doc_id)
         |  WHERE CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE)
         |    / CAST(len(string_split(d.text, ' ')) AS DOUBLE) < 0.5),
         |${Dedup.reachCteBodyOver("d2")},
         |cl AS (SELECT id, MIN(root) AS cluster FROM reach GROUP BY id),
         |dropped3 AS (SELECT id FROM cl WHERE id <> cluster),
         |n0 AS (SELECT COUNT(*) AS n_docs FROM documents),
         |n1 AS (SELECT COUNT(*) AS c1 FROM d1),
         |n2 AS (SELECT COUNT(*) AS c2 FROM d2),
         |n3 AS (SELECT COUNT(*) AS d3 FROM dropped3)
         |SELECT n0.n_docs,
         |  n0.n_docs - n1.c1 AS exact_dropped,
         |  n1.c1 - n2.c2 AS substring_dropped,
         |  n3.d3 AS neardup_dropped,
         |  CAST(0 AS BIGINT) AS semantic_dropped,
         |  n2.c2 - n3.d3 AS n_kept,
         |  CAST(n2.c2 - n3.d3 AS DOUBLE) / n0.n_docs AS kept_frac
         |FROM n0, n1, n2, n3""".stripMargin
  )
}
