package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.Curation

/** Volume proof for the QUALITY-GATED RELEASE LOOP (SURVEY B9.36 + B9.42)
  * — the capstone: not one stage at volume (each already has its own
  * artifact) but the whole ingest loop, with EVERY planted drop accounted
  * for by name in the stage it must die in.
  *
  * Corpus: deterministic RANDOM WALKS over a fixed successor graph —
  * [[VocabSize]] words, [[Branch]] successors each, path bits from the
  * doc id. The construction separates the stages' sensitivities by
  * design: bigrams are massively repeated (every edge ≈ n·len/(V·B)
  * occurrences — the release LM knows the language), while 8-token
  * shingles live in a ~V·B⁷ ≈ 2×10⁹ path space, so incidental
  * cross-doc shingle duplication is negligible and the substring stage
  * only sees REAL copies. Per ingest shard the plants are:
  *
  *   - junk: globally-unique tokens → all-OOV against the release LM →
  *     dies at stage 0 (quality), score exactly 0.0
  *   - exact copies of release docs → stage 1 (digest)
  *   - 16-token PREFIXES of release docs → every one of their shingles
  *     is corpus-attested, dup_frac = 1.0 → stage 2 (substring) at
  *     maxDupFrac 0.99 (set high so ONLY near-total copies die here —
  *     the near-dups below sit at ≈ 0.96 and must reach stage 3)
  *   - release docs + ONE appended unique token → shingle Jaccard ≈ 0.95
  *     → stage 3 (MinHash). This stage's accounting is a measured
  *     RECALL GATE (≥ 99%), not an exact count: banded LSH recall is
  *     probabilistic in the signature hashing (deterministic per pair,
  *     but a walk with internally-repeated grams can sit just under a
  *     band's collision threshold — the 1M-doc DedupVolume measures the
  *     same modality at 0.9951), while quality/exact/substring are
  *     deterministic verdicts and stay EXACT
  *   - fresh walks → survive everything, fold into the release
  *
  * The artifact records build/ingest/compaction wall times and the
  * per-shard ledgers; the contract is the EXACT per-stage drop counts
  * across [[NShards]] shards, plus a post-compaction shard proving the
  * loop keeps running against the rewritten indexes.
  *
  * Usage: runMain graft.CurationVolume [releaseDocs] [shardDocs] [plants]
  */
object CurationVolume {

  val VocabSize = 1024
  val Branch = 8
  val DocLen = 24
  val PrefixLen = 16
  val NShards = 3
  val MaxDupFrac = 0.99
  val LmThr = 0.001

  /** One walk step: the successor graph succ(w, b) = hash(w, b) mod V is
    * FIXED (independent of the doc), only the branch choice b is
    * doc-specific. */
  private def step(w: Column, b: Column): Column =
    pmod(xxhash64(w, b), lit(VocabSize.toLong))

  /** The deterministic walk text of a doc id — reproducible anywhere, so
    * plants can reference release docs by id alone. */
  def walkText(id: Column): Column = {
    var w: Column = pmod(xxhash64(id, lit("start")), lit(VocabSize.toLong))
    var parts = List(concat(lit("w"), w))
    for (j <- 1 until DocLen) {
      val b = pmod(xxhash64(id, lit(j)), lit(Branch.toLong))
      w = step(w, b)
      parts = concat(lit("w"), w) :: parts
    }
    concat_ws(" ", parts.reverse: _*)
  }

  def releaseCorpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"), lit("rel").as("source"),
      walkText(col("id")).as("text"))

  /** One ingest shard: ids start at `base` (monotonic across shards);
    * `plants` docs per category reference release ids in DISJOINT ranges
    * (a copy and a near-dup of the same release doc would also pair with
    * each other and blur the accounting). */
  def shard(spark: SparkSession, base: Long, shardDocs: Long,
      plants: Int, shardIdx: Int): DataFrame = {
    val p = plants.toLong
    val rid = (col("id") - base) % 10000L + lit(shardIdx * 3L * p)
    val cat = col("id") - base // 0..shardDocs-1
    spark.range(base, base + shardDocs).select(
      col("id").as("doc_id"), lit("shard").as("source"),
      when(cat < p, // junk: unique tokens
          concat_ws(" ", (0 until 12).map(k =>
            concat(lit("j"), col("id") * 12 + k)): _*))
        .when(cat < 2 * p, walkText(rid)) // exact copy
        .when(cat < 3 * p, // prefix: first 16 tokens
          array_join(slice(split(walkText(rid + p), " "), 1, PrefixLen),
            " "))
        .when(cat < 4 * p, // near-dup: one appended unique token
          concat(walkText(rid + 2 * p), lit(" uq"), col("id")))
        .otherwise(walkText(col("id") + 5000000L)) // fresh walk
        .as("text"))
  }

  /** Ledger as (stage -> (n_in, n_dropped, n_out)). */
  def ledgerMap(ledger: DataFrame): Map[String, (Long, Long, Long)] =
    ledger.collect().map(r => r.getString(1) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  /** Run the loop; returns (buildSec, perShard ledgers+secs, compactSec,
    * postCompactLedger, allOk). */
  def run(spark: SparkSession, dir: String, releaseDocs: Long,
      shardDocs: Long, plants: Int):
      (Double, Seq[(Map[String, (Long, Long, Long)], Double)], Double,
        Map[String, (Long, Long, Long)], Boolean) = {
    val release = releaseCorpus(spark, releaseDocs).localCheckpoint()
    val t0 = System.nanoTime()
    Curation.writeIndexes(release, None, dir, lmQuality = true)
    val buildSec = (System.nanoTime() - t0) / 1e9

    def ingest(i: Int): (Map[String, (Long, Long, Long)], Double) = {
      val s = shard(spark, 1000000L * (i + 1), shardDocs, plants, i)
        .localCheckpoint()
      val t = System.nanoTime()
      val r = Curation.ingestShard(s, None, dir,
        maxDupFrac = MaxDupFrac, lmMinScore = Some(LmThr))
      val lm = ledgerMap(r.ledger)
      (lm, (System.nanoTime() - t) / 1e9)
    }
    val shards = (0 until NShards).map(ingest)
    val t1 = System.nanoTime()
    Curation.compactRelease(spark, dir)
    val compactSec = (System.nanoTime() - t1) / 1e9
    val post = ingest(NShards)._1

    val p = plants.toLong
    // quality/exact/substring are deterministic verdicts — EXACT counts;
    // near_dup is banded LSH — a measured ≥99% recall gate, with every
    // miss visible as a surviving fresh-count surplus (no false drops:
    // n_out must be exactly the fresh docs plus the misses)
    def okShard(lm: Map[String, (Long, Long, Long)]): Boolean = {
      val near = lm("near_dup")._2
      lm("quality")._2 == p && lm("exact")._2 == p &&
        lm("substring")._2 == p &&
        near >= (p * 99 + 99) / 100 && near <= p &&
        lm("near_dup")._3 == shardDocs - 3 * p - near
    }
    val ok = shards.forall(s => okShard(s._1)) && okShard(post)
    (buildSec, shards, compactSec, post, ok)
  }

  // ------------------------------------------------------------------
  // FULL-STACK variant (VERDICT r12 #5): ALL opt-in gates on — quality
  // 0a + decontamination 0b + line-clean 0c + the four dedup stages
  // (exact, substring, minhash, SEMANTIC) + training-shard export. The
  // pairwise compositions are spec-pinned (Lm/Decont/LineCurationSpec);
  // this is the single artifact proving the seven-stage loop at volume
  // with a planted kill per stage, ledger ordered 0a/0b/0c first.

  val Dim = 16
  val NBench = 200        // external benchmark battery (decont index)
  val DecontMinHits = 8   // exact benchmark copies score 20 distinct-gram
                          // hits; 8 puts incidental walk-gram collisions
                          // (P(hit/gram) ≈ 1e-3 on this graph) at
                          // binomial-tail-zero false-kill odds
  val NBoiler = 8         // distinct boilerplate lines (line index)
  val BoilerDf = 5        // docs per line in the external line corpus
  val LineMinDf = 3
  val CosThr = 0.99
  val NSeedPerClass = 50  // labeled seed docs per class (classifier)

  /** Deterministic quasi-random unit-free embedding of an id: 16 dims in
    * [-1, 1]. Independent ids give near-orthogonal vectors (16-dim
    * cosine concentration), so only PLANTED twins can reach the 0.99
    * semantic threshold. */
  def vecOf(id: Column): Column =
    array((0 until Dim).map(k =>
      ((pmod(xxhash64(id, lit(k)), lit(2001L)) - 1000L) / lit(1000.0))
        .cast("double")): _*)

  /** Benchmark battery: walks over the SAME successor graph (so they
    * pass the release-LM quality gate) in an id range disjoint from
    * release, shard, and fresh walks. */
  def benchCorpus(spark: SparkSession): DataFrame =
    spark.range(NBench).select(col("id").as("doc_id"),
      walkText(col("id") + 7000000L).as("text"))

  private def boilerLine(j: Column): Column = walkText(j + 8000000L)

  /** Spam vocabulary — disjoint from the walk vocabulary, so a spam doc
    * classifies off-domain with certainty and an in-domain doc carries
    * zero spam evidence. */
  private def spamText(seed: Column): Column =
    concat_ws(" ", (0 until 12).map(k =>
      concat(lit("buy"), pmod(xxhash64(seed, lit(k)), lit(40L)),
        lit("now"))): _*)

  /** Labeled seed corpora for the stage-0d classifier: "good" = walks
    * over the release graph (id range 9M+, disjoint from everything),
    * "spam" = the junk vocabulary. The trained model is EXTERNAL, the
    * [[graft.sim.Curation.Decont]] posture. */
  def seedCorpus(spark: SparkSession): DataFrame =
    spark.range(NSeedPerClass).select(col("id").as("doc_id"),
        lit("good").as("source"), walkText(col("id") + 9000000L).as("text"))
      .unionByName(spark.range(NSeedPerClass).select(
        (col("id") + NSeedPerClass).as("doc_id"), lit("spam").as("source"),
        spamText(col("id") + 500L).as("text")))

  /** External line-frequency corpus: each of the [[NBoiler]] boilerplate
    * lines appears as the full text of [[BoilerDf]] docs, so its df
    * crosses [[LineMinDf]]; every other line in the universe has df 0. */
  def lineCorpus(spark: SparkSession): DataFrame =
    spark.range(NBoiler.toLong * BoilerDf).select(col("id").as("doc_id"),
      boilerLine(col("id") % NBoiler).as("text"))

  /** Full-stack ingest shard: EIGHT planted categories (one per stage,
    * category ranges disjoint; reference ids disjoint per shard AND per
    * category) + fresh survivors. The semantic twin carries FRESH text
    * with a COPIED release vector — the only category whose kill is
    * invisible to every text stage. */
  def fullShard(spark: SparkSession, base: Long, shardDocs: Long,
      plants: Int, shardIdx: Int): (DataFrame, DataFrame) = {
    val p = plants.toLong
    // stride 8p, not 4p: the four ref-using categories read release ids
    // rid..rid+3p over cat∈[4p,8p), i.e. blocks {[4p,5p),[6p,7p),[8p,9p),
    // [10p,11p)}+stride·i — at stride 4p shard i's minhash block
    // coincided with shard i+1's exact block and its semantic block with
    // shard i+1's substring block (ADVICE r13); 8p keeps every block
    // disjoint across shards and categories, max ref id 35p ≪ releaseDocs
    val rid = (col("id") - base) % 10000L + lit(shardIdx * 8L * p)
    val cat = col("id") - base
    val docs = spark.range(base, base + shardDocs).select(
      col("id").as("doc_id"), lit("shard").as("source"),
      when(cat < p, // 0a quality: globally-unique tokens, all-OOV
          concat_ws(" ", (0 until 12).map(k =>
            concat(lit("j"), col("id") * 12 + k)): _*))
        .when(cat < 2 * p, // 0b decont: exact benchmark copy (20 hits)
          walkText((cat - p) % NBench + 7000000L))
        .when(cat < 3 * p, // 0c line-clean: a boilerplate-only doc
          boilerLine((cat - 2 * p) % NBoiler))
        .when(cat < 4 * p, // 0d class filter: spam-vocabulary doc.
          // NOTE it must NOT die earlier: spam words are unique to the
          // spam class but SHARED across spam docs, so the release LM —
          // which never folds them — scores them OOV... which is the
          // quality stage's kill. The spam text therefore rides ON TOP
          // of a fresh walk (in-graph bigrams dominate the LM score,
          // spam words dominate the classifier evidence).
          concat(walkText(col("id") + 300000000L), lit(" "),
            spamText(col("id"))))
        .when(cat < 5 * p, walkText(rid)) // 1 exact copy
        .when(cat < 6 * p, // 2 substring: 16-token prefix
          array_join(slice(split(walkText(rid + p), " "), 1, PrefixLen),
            " "))
        .when(cat < 7 * p, // 3 minhash: one appended unique token
          concat(walkText(rid + 2 * p), lit(" uq"), col("id")))
        .when(cat < 8 * p, // 4 semantic twin: FRESH text (vector below)
          walkText(col("id") + 200000000L))
        .otherwise(walkText(col("id") + 100000000L)) // fresh walk
        .as("text"))
    // walk-id universes are WIDELY separated (release 0..n, bench 7M+,
    // boiler 8M+, fresh 100M+, twins 200M+): shard ids run into the
    // millions, so a small offset would let one shard's fresh/twin walks
    // land inside the benchmark range and die at decont instead of their
    // own stage (the first cut of this harness lost exactly 20 semantic
    // twins that way)
    val emb = spark.range(base, base + shardDocs).select(
      col("id").as("vec_id"),
      when(cat >= 7 * p && cat < 8 * p, // twin: copy the target's vector
        vecOf(rid + 3 * p)).otherwise(vecOf(col("id"))).as("embedding"))
    (docs, emb)
  }

  /** One full-stack run's results: per-shard ledgers + wall times, the
    * MEAN per-stage seconds across shards (the 179-docs/s floor made
    * legible — VERDICT r13 #3), and the export/accounting verdicts. */
  final case class FullStack(buildSec: Double,
      shards: Seq[(Map[String, (Long, Long, Long)], Double)],
      stageSec: Seq[(String, Double)], compactSec: Double,
      post: Map[String, (Long, Long, Long)], exportDocs: Long,
      ok: Boolean)

  /** Run the eight-stage loop + export. `pqM > 0` builds the semantic
    * index with PQ codes and probes through the ADC prefilter at
    * `pqMargin` — margin 0.0 is LOSSLESS by the per-row qerr
    * certificates (SemDedup/Pq, B9.39), so the two modes must produce
    * IDENTICAL ledgers (CurationVolumeSpec gates that equality; the
    * artifact records both throughputs). */
  def runFullStack(spark: SparkSession, dir: String, releaseDocs: Long,
      shardDocs: Long, plants: Int, pqM: Int = 0,
      pqMargin: Option[Double] = None): FullStack = {
    import graft.text.{Classify, DecontIndex, LineIndex}
    val release = releaseCorpus(spark, releaseDocs).localCheckpoint()
    val relEmb = spark.range(releaseDocs).select(col("id").as("vec_id"),
      vecOf(col("id")).as("embedding")).localCheckpoint()
    val t0 = System.nanoTime()
    // checkpoint the synthetic corpora before any index build — fusing a
    // Range source into the same codegen stage as a fast-hashmap
    // aggregate trips a Janino nested-class protected-access bug
    // (IllegalAccessError on BufferedRowIterator.partitionIndex); the
    // checkpoint breaks the fusion exactly like releaseCorpus's does
    DecontIndex.writeIndex(benchCorpus(spark).localCheckpoint(),
      s"$dir/bench")
    LineIndex.writeIndex(lineCorpus(spark).localCheckpoint(),
      s"$dir/boiler")
    // materialize the frozen model ONCE (localCheckpoint returns a new
    // Dataset — build the Model from the checkpointed frames, ADVICE r13)
    // so the per-shard class_filter stage re-broadcasts cached rows
    // instead of re-deriving the centroids from the seed corpus
    val m0 = Classify.model(seedCorpus(spark).localCheckpoint())
    val classifier = Classify.Model(m0.classCounts.localCheckpoint(),
      m0.classMass.localCheckpoint())
    Curation.writeIndexes(release, Some(relEmb), s"$dir/rel",
      lmQuality = true, pqM = pqM)
    val buildSec = (System.nanoTime() - t0) / 1e9

    val stageAcc = scala.collection.mutable
      .LinkedHashMap.empty[String, Double]
    def ingest(i: Int): (Map[String, (Long, Long, Long)], Double,
        DataFrame) = {
      val (sdocs, semb) = fullShard(spark, 1000000L * (i + 1), shardDocs,
        plants, i)
      val sd = sdocs.localCheckpoint(); val se = semb.localCheckpoint()
      val t = System.nanoTime()
      val r = Curation.ingestShard(sd, Some(se), s"$dir/rel",
        maxDupFrac = MaxDupFrac, cosineThreshold = CosThr,
        pqMargin = pqMargin,
        lmMinScore = Some(LmThr),
        decont = Some(Curation.Decont(s"$dir/bench", DecontMinHits)),
        lineClean = Some(Curation.LineClean(s"$dir/boiler", LineMinDf)),
        classFilter = Some(Curation.ClassFilter(classifier, Set("good"))),
        stageTimer = Some((n, s) =>
          stageAcc(n) = stageAcc.getOrElse(n, 0.0) + s))
      (ledgerMap(r.ledger), (System.nanoTime() - t) / 1e9,
        r.kept.localCheckpoint())
    }
    val runs = (0 until NShards).map(ingest)
    val t1 = System.nanoTime()
    Curation.compactRelease(spark, s"$dir/rel")
    val compactSec = (System.nanoTime() - t1) / 1e9
    val postRun = ingest(NShards)
    val post = postRun._1

    // export the full release content (seed + every shard's kept docs)
    // as training shards; the manifest row sum must equal the re-read
    // count must equal the ledger-predicted size — the loop's OUTPUT is
    // itself verified, not just its drop accounting
    val allKept = (runs.map(_._3) :+ postRun._3)
      .foldLeft(release.select("doc_id", "source", "text"))(
        (acc, k) => acc.union(k.select("doc_id", "source", "text")))
    val manifest = graft.text.Export.writeShards(allKept, s"$dir/export")
    val manifestDocs = manifest.agg(sum("n_docs").cast("long"))
      .head().getLong(0)
    val reread = graft.text.Export.readShards(spark, s"$dir/export")
      .count()
    val expectedDocs = releaseDocs +
      (runs.map(_._1) :+ post).map(lm => lm("semantic")._3).sum

    val p = plants.toLong
    // seven stages are deterministic verdicts — EXACT counts; minhash is
    // the banded-LSH recall gate (≥99%); the ledger must arrive in the
    // 0a/0b/0c/0d-first stage order
    val order = Seq("quality", "decont", "line_clean", "class_filter",
      "exact", "substring", "near_dup", "semantic")
    def okShard(lm: Map[String, (Long, Long, Long)]): Boolean = {
      val near = lm("near_dup")._2
      lm.keySet == order.toSet &&
        lm("quality")._2 == p && lm("decont")._2 == p &&
        lm("line_clean")._2 == p && lm("class_filter")._2 == p &&
        lm("exact")._2 == p && lm("substring")._2 == p &&
        near >= (p * 99 + 99) / 100 && near <= p &&
        lm("semantic")._2 == p &&
        lm("semantic")._3 == shardDocs - 7 * p - near
    }
    val ok = runs.forall(r => okShard(r._1)) && okShard(post) &&
      manifestDocs == expectedDocs && reread == expectedDocs
    val nIngests = (NShards + 1).toDouble
    FullStack(buildSec, runs.map(r => (r._1, r._2)),
      stageAcc.toSeq.map { case (n, s) => (n, s / nIngests) },
      compactSec, post, manifestDocs, ok)
  }

  def main(args: Array[String]): Unit = {
    val releaseDocs = args.headOption.map(_.toLong).getOrElse(100000L)
    val shardDocs = args.lift(1).map(_.toLong).getOrElse(25000L)
    val plants = args.lift(2).map(_.toInt).getOrElse(600)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_curvol").toString
    val (buildSec, shards, compactSec, post, ok) =
      run(spark, dir, releaseDocs, shardDocs, plants)
    val meanIngest = shards.map(_._2).sum / shards.size
    val nearFound = (shards.map(_._1) :+ post)
      .map(_("near_dup")._2).sum
    val nearPlanted = plants.toLong * (shards.size + 1)

    val fsDir = java.nio.file.Files
      .createTempDirectory("graft_curvol_fs").toString
    val fs = runFullStack(spark, fsDir, releaseDocs, shardDocs, plants)
    val fsMean = fs.shards.map(_._2).sum / fs.shards.size
    val fsNear = (fs.shards.map(_._1) :+ fs.post)
      .map(_("near_dup")._2).sum

    // the same loop with the PQ accelerator ON (codes in the semantic
    // index, ADC prefilter at margin 0 — lossless by the per-row qerr
    // certificates): the ledgers must be IDENTICAL, only the time may
    // move (VERDICT r13 #3 — measure the accelerator, don't leave it off)
    val fsPqDir = java.nio.file.Files
      .createTempDirectory("graft_curvol_fspq").toString
    val fsPq = runFullStack(spark, fsPqDir, releaseDocs, shardDocs,
      plants, pqM = 4, pqMargin = Some(0.0))
    val fsPqMean = fsPq.shards.map(_._2).sum / fsPq.shards.size
    val modesAgree =
      fs.shards.map(_._1) == fsPq.shards.map(_._1) && fs.post == fsPq.post

    val line =
      f"""{"metric":"curation_ingest_docs_per_sec","value":${
        shardDocs / meanIngest}%.0f,"unit":"docs/s",""" +
      f""""release_docs":$releaseDocs,"shard_docs":$shardDocs,""" +
      f""""plants_per_stage":$plants,"n_shards":${shards.size},""" +
      f""""build_sec":$buildSec%.1f,""" +
      f""""ingest_sec":[${shards.map(s => f"${s._2}%.1f").mkString(",")}],""" +
      f""""compact_sec":$compactSec%.1f,""" +
      f""""near_recall":${nearFound.toDouble / nearPlanted}%.4f,""" +
      f""""post_compact_kept":${post("near_dup")._3},""" +
      s""""all_drops_accounted":$ok,""" +
      f""""full_stack":{"docs_per_sec":${shardDocs / fsMean}%.0f,""" +
      f""""stages":8,"build_sec":${fs.buildSec}%.1f,""" +
      f""""ingest_sec":[${
        fs.shards.map(s => f"${s._2}%.1f").mkString(",")}],""" +
      s""""stage_sec":{${fs.stageSec.map { case (n, s) =>
        f""""$n":$s%.1f""" }.mkString(",")}},""" +
      f""""compact_sec":${fs.compactSec}%.1f,""" +
      f""""near_recall":${fsNear.toDouble / nearPlanted}%.4f,""" +
      f""""export_docs":${fs.exportDocs},""" +
      s""""all_drops_accounted":${fs.ok}},""" +
      f""""full_stack_pq":{"pq_m":4,"pq_margin":0.0,""" +
      f""""docs_per_sec":${shardDocs / fsPqMean}%.0f,""" +
      f""""build_sec":${fsPq.buildSec}%.1f,""" +
      s""""stage_sec":{${fsPq.stageSec.map { case (n, s) =>
        f""""$n":$s%.1f""" }.mkString(",")}},""" +
      s""""ledgers_identical_to_float_mode":$modesAgree,""" +
      s""""all_drops_accounted":${fsPq.ok}}}"""
    println(line)
    Artifacts.write("curation_volume.json", line)
    spark.stop()
    if (!ok || !fs.ok || !fsPq.ok || !modesAgree) {
      shards.zipWithIndex.foreach { case ((lm, _), i) =>
        System.err.println(s"[curvol] shard $i ledger: $lm") }
      System.err.println(s"[curvol] post-compact ledger: $post")
      fs.shards.zipWithIndex.foreach { case ((lm, _), i) =>
        System.err.println(s"[curvol] full-stack shard $i ledger: $lm") }
      System.err.println(s"[curvol] full-stack post ledger: ${fs.post}")
      fsPq.shards.zipWithIndex.foreach { case ((lm, _), i) =>
        System.err.println(s"[curvol] PQ-mode shard $i ledger: $lm") }
      System.err.println(s"[curvol] PQ-mode post ledger: ${fsPq.post}")
      System.err.println("[curvol] CONTRACT MISS"); sys.exit(1)
    }
  }
}
