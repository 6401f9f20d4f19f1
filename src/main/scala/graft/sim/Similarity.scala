package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Similarity search and near-dup joins — SURVEY.md §2 B9.2–B9.4.
  *
  * Oracle-eligible members here are the exact ones: brute-force cosine top-k,
  * blocked levenshtein string-similarity join, blocked token-Jaccard join.
  * The approximate members (MinHash/LSH, SimHash, IVF ANN) are in
  * [[MinHash]] / [[Ann]] with property tests instead (hash-impl-specific
  * outputs can't be oracle'd — SURVEY §7.5.7).
  *
  * Determinism: dot products fold left-to-right from a 0.0 init on both
  * engines (Spark `aggregate` ≡ DuckDB `list_reduce`, since 0.0+x1 ≡ x1),
  * giving bit-identical IEEE results; all pair joins use blocking keys so
  * they scale (never an unblocked O(n²) cross join).
  */
object Similarity {

  import VectorMath.dot

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SQ8 scalar-quantization encode (round 12, [[Sq]]): per-dimension
    // affine params trained on the corpus, every vector coded to 8-bit
    // levels. Declared on the ENCODE step because its output is integer
    // codes — exactly comparable across engines (min/max need no
    // arithmetic, and (x−mn)/st → round → clamp is the same IEEE op
    // sequence in both), where the float SCORE would hash-diverge on
    // SQL SUM's unspecified summation order. The scan-side score kernel
    // (`sq_dot`) is TEST-gated in SqSpec instead. Output is SCALAR rows
    // (vec_id, pos, code) per SURVEY §7.5.5 — never a raw array column
    // in a declared query (round 12's one red row was exactly this).
    "sim_sq_encode" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Sq.encode(emb, Sq.train(emb))
        .select(col("vec_id"), posexplode(col("codes")).as(Seq("pos", "code")))
        .orderBy("vec_id", "pos")
    }),

    // Binary-quantization top-k (round 12, [[Bq]]): sign-bit signatures,
    // Hamming distance to the probe (vec_id 0), nearest 20. Declared on
    // the DISTANCE scan because Hamming is integer — exactly comparable
    // across engines with no float-summation-order hazard — while the
    // engine's packed-long representation stays an implementation detail
    // the oracle never sees (DuckDB recomputes the same distance as a
    // per-dimension sign-disagreement count). Scale shape: map-only
    // signature scan (bit_count(xor) per word, whole-stage codegen) +
    // TakeOrderedAndProject; the floats are never touched.
    "sim_bq_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val enc = Bq.encode(emb, 64)
      val probe = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      Bq.topK(enc.filter(col("vec_id") =!= 0), Bq.signature(probe), 20)
    }),

    // Brute-force exact cosine top-k against a probe vector (vec_id 0).
    // The broadcast probe keeps this a single narrow map over the corpus +
    // TakeOrderedAndProject — the right baseline shape at any scale.
    "sim_cosine_topk" -> ((s, d) => {
      // norms are precomputed per vector (one dot each) instead of inside
      // the pair expression (which would redo them per comparison)
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("norm", sqrt(dot(col("v"), col("v"))))
      val probe = broadcast(emb.filter(col("vec_id") === 0)
        .select(col("v").as("p"), col("norm").as("pnorm")))
      emb.filter(col("vec_id") =!= 0)
        .crossJoin(probe)
        .select(col("vec_id"),
          (dot(col("v"), col("p")) / (col("norm") * col("pnorm"))).as("cosine"))
        .orderBy(desc("cosine"), asc("vec_id"))
        .limit(20)
    }),

    // String-similarity self-join. Scale context (measured): the part
    // fixture's TRUE unblocked ed≤3 answer is itself quadratic — 122k
    // pairs at sf0.01 → 12.6M at sf0.1, its 92-word vocabulary saturates —
    // so this blocked variant stays declared as the cheap oracle twin, and
    // the exact unblocked edit join is declared on a corpus whose answer
    // scales (`sim_edit_join`, candidates ∝ answer via deletion
    // signatures; [[editDistancePairsSegments]] is the general-k exact
    // path). Blocking key = (first char, last token) —
    // an LSH-style block that keeps bucket sizes bounded at scale — plus a
    // length prefilter (|len diff| > 3 can't be within distance 3) and the
    // threshold variant of levenshtein, which early-exits once the distance
    // bound is exceeded instead of filling the full DP matrix.
    // NOTE on the char-histogram prefilter (graft.functions.CharHist —
    // ed ≥ l1_diff(char_hist)/2, a provable superset gate for the banded
    // levenshtein): measured on THIS corpus it passes 100% of the 3.1M
    // same-block candidates (part names are permutations of one small word
    // vocabulary — near-identical char multisets), so wiring it here is
    // pure overhead and it is deliberately NOT used. It is the right
    // prefilter for natural-text corpora, where char distributions of
    // random pairs diverge; kept as registered, spec-proven library
    // surface (CharHistSpec).
    "sim_string_join" -> ((s, d) => {
      val p = Tables.part(s, d)
        .select(col("p_partkey").as("key"), col("p_name").as("name"),
          concat(substring(col("p_name"), 1, 1),
            element_at(split(col("p_name"), " "), -1)).as("block"))
      p.alias("a").join(p.alias("b"),
          col("a.block") === col("b.block")
            && col("a.key") < col("b.key")
            && abs(length(col("a.name")) - length(col("b.name"))) <= 3
            && levenshtein(col("a.name"), col("b.name"), 3) =!= -1)
        .select(col("a.key").as("key_a"), col("b.key").as("key_b"),
          col("a.name").as("name_a"), col("b.name").as("name_b"),
          levenshtein(col("a.name"), col("b.name")).as("dist"))
        .orderBy("key_a", "key_b")
    }),

    // Token-set Jaccard near-dup join, blocked by (source, log-length).
    // Three scale tricks: (1) tokens are encoded as xxhash64(tok) — a
    // deterministic, sort-free 64-bit id, so the pair join shuffles compact
    // long arrays instead of strings with NO vocabulary pass at all (the
    // round-1 sorted-vocab row_number() forced the whole vocabulary through
    // one task — a global-window anti-pattern at 100 TB). Jaccard only needs
    // intersection *sizes*, which xxhash64 preserves assuming no 64-bit
    // collision within a block (not injectivity — a true collision would
    // inflate one intersection; probability ≈ pairs·2⁻⁶⁴, negligible even
    // at 100 TB), so the oracle intersects the raw string sets and gets
    // identical counts. (2) size-ratio prefilter — J(A,B) ≤
    // min(|A|,|B|)/max(|A|,|B|) < 0.8 rejects pairs before any intersection.
    // (3) the ratio bound is ALSO an equi-join key: ratio ≥ 0.8 forces
    // log₁.₃(n) buckets to differ by ≤ 1 (ln1.25/ln1.3 ≈ 0.85 < 1, the
    // margin absorbing any fp wobble in the floor), so side a fans out to
    // its 3 adjacent buckets and the join hash-partitions on
    // (source, bucket) — each qualifying pair matches on exactly ONE key,
    // making the candidate stage an exact superset, not an approximation.
    // Blocking by source alone left per-block pairs growing quadratically
    // with corpus size; the length dimension subdivides each source block.
    // Honest limit: the bucket count is bounded by the corpus's length
    // RANGE, so once every (source, length) cell is populated further
    // growth is quadratic again within cells — this exact-oracle query is
    // fixture-honest, and the unbounded-growth path is MinHash banding
    // (MinHash.nearDupPairs: candidate volume tracks true near-dup density,
    // not corpus size) with this query's exact-Jaccard verify on top.
    "sim_ngram_jaccard" -> ((s, d) =>
      tokenJaccardPairs(s, d).orderBy("doc_a", "doc_b")),

    // Exact UNBLOCKED edit-distance self-join (entity-resolution shape:
    // "records one typo apart") via the deletion-neighborhood signature —
    // candidates are an equi-join on ≤k-deletion variants, whose buckets
    // only collide when strings genuinely nearly match, so candidate
    // volume tracks the TRUE pair count on ANY corpus (measured: the
    // positional-segment alternative degenerates to all C(n,2) pairs here
    // because every name shares the constant "Customer#" segment — see
    // [[editDistancePairsSegments]]). Declared on customer names at k=1
    // because that answer is scale-safe (each name has a bounded one-typo
    // neighbor set — measured 1.3k pairs/150 rows → 262k/15k rows,
    // near-linear); part names' answer is itself quadratic at every k
    // (122k pairs at sf0.01 → 12.6M at sf0.1 for k=3 — vocabulary
    // saturation), so no candidate scheme makes an exact unblocked join
    // on part cheap: that fixture's ANSWER saturates, not the algorithm.
    "sim_edit_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_custkey").as("key"), col("c_name").as("name"))
      editDistancePairsDeletions(c, "key", "name", 1).orderBy("key_a", "key_b")
    }),

    // Batch k-NN GRAPH construction — each vector's top-3 cosine neighbors
    // (the input artifact for graph-based clustering, dedup aggregation,
    // and diversity sampling; a per-vector generalization of the
    // single-probe `sim_cosine_topk`). Blocked by label like
    // `dedup_near_embedding` and exact within the block — the same
    // fixture-honesty trade documented there (this corpus is measured
    // unblockable at background angles), so this stays the oracle twin
    // while the scale path is [[Ann.knnGraph]] (round 8): IVF candidates
    // feeding the SAME per-vector top-k window, recall-gated vs this
    // exact graph in SemDedupSpec. Plan shape: the per-vector top-3 must
    // prune inside the window (WindowGroupLimit, plan-gated) rather than
    // rank-then-filter the full neighbor list.
    "sim_knn_graph" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("norm", sqrt(dot(col("v"), col("v"))))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(desc("cosine"), asc("nbr_id"))
      // HALF-PAIRING (round 17, the graph.Graph.knnOrderedPairs shape):
      // enumerate a < b only — half the dot products — and mirror via
      // explode(array(struct…)) inside the same stage, upstream of the
      // rank window's exchange. Bit-identical: per-element IEEE multiply
      // commutes and the fold order over dimensions is unchanged, so the
      // mirrored cosine is the same double the two-sided join computed.
      emb.alias("a").join(emb.alias("b"),
          col("a.label") === col("b.label")
            && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
          (dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")))
            .as("cosine"))
        .select(explode(array(
          struct(col("ia").as("vec_id"), col("ib").as("nbr_id"),
            col("cosine")),
          struct(col("ib").as("vec_id"), col("ia").as("nbr_id"),
            col("cosine")))).as("x"))
        .select(col("x.vec_id").as("vec_id"), col("x.nbr_id").as("nbr_id"),
          col("x.cosine").as("cosine"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .orderBy("vec_id", "rank")
    }),

    // Embedding-cosine near-duplicate pairs, blocked by label. Exact and
    // deterministic (identical fold-order dot products on both engines) —
    // which is why THIS query stays label-blocked and oracle-eligible: it is
    // the exact small-block twin whose hashes gate the verification math.
    // Its θ≈66° (cosine 0.4) regime is measured-unblockable on this corpus,
    // not merely argued: the fixture vectors are unit-norm (norm ∈ {1.0} at
    // every SF — a norm/magnitude bucket subdivides NOTHING), and an IVF
    // multi-assignment block (k=16 random centers, top-4 lists, 64-dim)
    // needs 72% of ALL pairs as candidates to reach 0.94 recall of the
    // cosine-0.4 pairs at sf0.1 — concentration of measure: random 64-dim
    // unit vectors all sit ~90°±7° from any fixed direction, so no
    // data-independent partition separates 66° from background. Scale paths
    // therefore live at the thresholds where pruning is mathematically
    // possible and are property-tested, not oracle'd (SURVEY §7.5.7):
    // [[Ann.lshNearDupPairs]] for the realistic near-dup regime
    // (cosine ≥ ~0.85, where 32×16-bit sign-LSH admits ~0.05% of random
    // pairs at ~0.94+ recall), and IVF multi-probe as the recall/cost dial
    // for moderate thresholds. The declared CLUSTER pipeline
    // (`dedup_clusters`, [[Dedup]]) feeds from the token-Jaccard pair stage,
    // whose (source × length-bucket) block subdivides with the corpus.
    "dedup_near_embedding" -> ((s, d) =>
      embeddingNearDupPairs(s, d).orderBy("vec_a", "vec_b"))
  )

  /** The pair stage of the token-Jaccard near-dup join, UNORDERED — shared
    * by the `sim_ngram_jaccard` oracle query (which adds the declared total
    * ORDER BY) and the `dedup_clusters` pipeline in [[Dedup]] (which feeds
    * the pairs straight into connected components and must not inherit a
    * pointless global sort — the components loop immediately
    * localCheckpoints an unordered projection). */
  private[graft] def tokenJaccardPairs(s: SparkSession, d: String,
      minJaccard: Double = 0.8): DataFrame =
    tokenJaccardPairsOf(Tables.documents(s, d), minJaccard)

  /** [[tokenJaccardPairs]] over an ARBITRARY document set (same schema as
    * the documents table) — the form [[Curation]]'s near-dup stage needs,
    * where the input is the survivors of the upstream exact + substring
    * stages rather than the raw table. The (s, d) form above delegates
    * here so the two can never drift. */
  private[graft] def tokenJaccardPairsOf(docs: DataFrame,
      minJaccard: Double = 0.8): DataFrame =
    tokenJaccardCandidatesOf(docs)
      // |A∪B| = |A|+|B|-|A∩B| — never materialize the union array. The
      // intersection is the custom codegen'd merge scan over the sorted
      // id arrays (SortedIntersectSizeExpr): array_intersect would build
      // a hash set per candidate PAIR — 325k+ allocations at sf0.1 —
      // where the merge scan is allocation-free and sorts once per DOC.
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        graft.functions.SortedIntersect
          .sorted_intersect_size(col("a.toks"), col("b.toks")).as("inter"),
        (col("a.n") + col("b.n")).as("sum_n"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("sum_n") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)

  /** The CANDIDATE stage of [[tokenJaccardPairs]] — the (source ×
    * length-bucket, size-ratio) block join, before the Jaccard verify.
    * Exposed so tests can assert candidate volume directly (candidates ≪
    * C(n,2) is the property that makes the dedup subquadratic; the verify
    * threshold can't hide a bloated block). */
  private[graft] def tokenJaccardCandidates(s: SparkSession, d: String): DataFrame =
    tokenJaccardCandidatesOf(Tables.documents(s, d))

  private[graft] def tokenJaccardCandidatesOf(input: DataFrame): DataFrame = {
    val docs = input
      .select(col("doc_id"), col("source"),
        array_sort(transform(array_distinct(split(col("text"), " ")),
          t => xxhash64(t))).as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("lb", floor(log(col("n").cast("double")) / math.log(1.3)))
    val fanout = docs.withColumn("lbk",
      explode(array(col("lb") - 1, col("lb"), col("lb") + 1)))
    fanout.alias("a").join(docs.alias("b"),
        col("a.source") === col("b.source") && col("a.lbk") === col("b.lb")
          && col("a.doc_id") < col("b.doc_id")
          && least(col("a.n"), col("b.n")).cast("double")
            / greatest(col("a.n"), col("b.n")) >= 0.8)
  }

  /** Exact edit-distance self-join via the deletion-neighborhood signature
    * (the FastSS / SymSpell family — public algorithm, re-expressed as
    * Spark relational ops): each string emits every variant reachable by
    * deleting ≤ k characters; if ed(s,t) ≤ k then an optimal alignment
    * yields a common subsequence obtained by ≤ k deletions from EACH side
    * (a substitution deletes one char from both, an insert/delete one char
    * from one), so the pair shares a variant and the candidate stage is an
    * equi-join on the variant string. Unlike positional-segment schemes,
    * a variant bucket only collides when strings are near-copies of each
    * other, so candidate volume tracks the TRUE answer on any corpus —
    * including shared-template ID corpora ("Customer#0000…"), where a
    * constant aligned segment makes [[editDistancePairsSegments]] admit
    * all of C(n,2). The trade is fan-out: (len choose ≤k) variants per
    * string (×(len+1) at k=1), each nearly full-length — linear in n and
    * cheap for short entity strings, but prefer the segment scheme for
    * long, content-distributed strings where fan-out ~(k+1)² tiny
    * segments. Verify = banded `levenshtein(a, b, k)` (sharing a variant
    * does not imply ed ≤ k: "ab"/"ba" share variants "a" and "b" at k=1
    * but sit at distance 2). */
  private[graft] def editDistancePairsDeletions(df: DataFrame, keyCol: String,
      strCol: String, k: Int): DataFrame =
    verifyEditPairs(editDistanceDeletionCandidates(df, keyCol, strCol, k), k)

  /** Candidate stage of [[editDistancePairsDeletions]]: distinct key pairs
    * sharing a ≤k-deletion variant. Exposed for the candidate-volume
    * property tests. */
  private[graft] def editDistanceDeletionCandidates(df: DataFrame,
      keyCol: String, strCol: String, k: Int): DataFrame = {
    val base = df.filter(col(strCol).isNotNull)
      .select(col(keyCol).as("key"), col(strCol).as("s"))
    // level r = all variants with exactly ≤ r deletions; deleting one char
    // of every level-(r−1) variant enumerates every r-subset (repeatedly —
    // the per-key distinct collapses the duplicates)
    var lvl = base.select(col("key"), col("s"), col("s").as("v"))
    var all = lvl
    for (_ <- 1 to k) {
      lvl = lvl.filter(length(col("v")) > 0)
        .withColumn("q", explode(sequence(lit(0), length(col("v")) - 1)))
        .select(col("key"), col("s"),
          concat(col("v").substr(lit(1), col("q")),
            col("v").substr(col("q") + 2, length(col("v")) - col("q") - 1))
            .as("v"))
      all = all.union(lvl)
    }
    // three scale moves before anything shuffles: (1) variants travel as
    // xxhash64 digests — 8-byte exchange keys instead of near-full-length
    // strings, and a (vanishingly rare) digest collision only admits a
    // junk CANDIDATE that the exact verify kills, so exactness is
    // untouched; (2) the per-key distinct is load-bearing, not cosmetic —
    // deleting any char of a same-char run yields ONE variant ("…000…" has
    // 7 zeros but one deletion result), and collapsing those here is what
    // keeps the bucket join from multiplying run-length × run-length rows
    // per true pair on run-heavy corpora (exactly the templated-ID shape
    // this scheme is declared on); (3) the SOURCE STRING does not ride
    // the variant shuffle (round 16, measured −21% at sf0.1): the
    // self-join and candidate distinct run over slim (key, vh) rows and
    // the strings re-attach AFTER via two equi-joins against the
    // base-sized table — the guide §2.3 shuffle-keys-not-payloads move,
    // which is also what makes the scheme safe for long entity strings.
    // The ≤2k length gap bound (tightened to k — free given a shared
    // variant) moves into the post-attach filter, before the verify.
    val variants = all
      .select(col("key"), xxhash64(col("v")).as("vh"))
      .distinct()
    val slim = base.select(col("key"), col("s"))
    variants.alias("a").join(variants.alias("b"),
        col("a.vh") === col("b.vh") && col("a.key") < col("b.key"))
      .select(col("a.key").as("key_i"), col("b.key").as("key_p"))
      .distinct()
      .join(slim.select(col("key").as("key_i"), col("s").as("s_i")), "key_i")
      .join(slim.select(col("key").as("key_p"), col("s").as("s_p")), "key_p")
      .filter(abs(length(col("s_i")) - length(col("s_p"))) <= k)
  }

  /** Banded-levenshtein verify + (key_a < key_b) normalization shared by
    * both exact edit-join candidate schemes. */
  private def verifyEditPairs(cand: DataFrame, k: Int): DataFrame = {
    val verified = cand
      .withColumn("dist", levenshtein(col("s_i"), col("s_p"), k))
      .filter(col("dist") =!= -1)
    // normalize to key_a < key_b: the segment scheme indexes the
    // (len, key)-smaller side, which is NOT always the key-smaller
    val aFirst = col("key_i") < col("key_p")
    verified.select(
      when(aFirst, col("key_i")).otherwise(col("key_p")).as("key_a"),
      when(aFirst, col("key_p")).otherwise(col("key_i")).as("key_b"),
      when(aFirst, col("s_i")).otherwise(col("s_p")).as("name_a"),
      when(aFirst, col("s_p")).otherwise(col("s_i")).as("name_b"),
      col("dist"))
  }

  /** Exact edit-distance self-join, PassJoin-style segment signatures
    * (partition scheme of Li/Deng/Feng, PASS-JOIN, VLDB 2011 — public
    * algorithm, re-derived for Spark's declarative planner).
    *
    * Pigeonhole: split every string into k+1 segments; k edits touch at
    * most k of them, so any pair within distance k shares ≥1 segment
    * VERBATIM — and the surviving segment's position shifts by at most
    * the insertions/deletions before it. With d = len(long) − len(short),
    * #del ≤ ⌊(k−d)/2⌋ and #ins ≤ ⌊(k+d)/2⌋ (they must cancel to d within
    * budget k), so the probe enumerates only that [−⌊(k−d)/2⌋, +⌊(k+d)/2⌋]
    * start-position window. Candidates are then an EQUI-join on
    * (segment, segment-index, indexed-length): hash-partitionable, no
    * theta/nested-loop anywhere, fan-out a small constant
    * ((k+1 lengths)×(k+1 segments)×(≤k+1 window) per probe row), and
    * candidate volume tracks the true pair count — the optimal shape for
    * an exact join, since the verify must touch every true pair anyway.
    * Each unordered pair is generated exactly once: the (length, key)-
    * lexicographically smaller string is the indexed side, and the
    * pigeonhole applies to ITS segmentation regardless of which side is
    * longer.
    *
    * Verify = built-in banded `levenshtein(a, b, k)` (early-exits past k).
    * 100 TB note: strings ride the candidate shuffle because the fixtures'
    * are short (≤25 B); for document-length strings, project to (key, seg)
    * and re-join the two string columns after the distinct instead.
    * Degenerate inputs: strings shorter than k+1 chars produce empty
    * segments, which match every same-(i,l) probe — correct (the pair
    * class is length-bounded) but wide; the probe's indexed-length
    * enumeration floors at 0 so pairs involving EMPTY strings are
    * generated too (a floor of 1 silently missed ("", "a") at k=1);
    * nulls are dropped. HONEST LIMIT
    * (measured, and why the declared query uses the deletion scheme): a
    * constant ALIGNED region spanning a whole segment — e.g. the
    * "Customer#" prefix shared by every c_name — puts all n rows in one
    * signature bucket and the candidate stage degenerates to C(n,2);
    * positional segments need the discriminative content spread through
    * the string (true of natural text, false of templated IDs). */
  private[graft] def editDistancePairsSegments(df: DataFrame, keyCol: String,
      strCol: String, k: Int): DataFrame =
    verifyEditPairs(editDistanceSegmentCandidates(df, keyCol, strCol, k), k)

  /** The candidate stage of [[editDistancePairsSegments]] — distinct key
    * pairs sharing an aligned segment signature, before the levenshtein
    * verify. Exposed so tests can pin candidate volume against the true
    * pair count. */
  private[graft] def editDistanceSegmentCandidates(df: DataFrame,
      keyCol: String, strCol: String, k: Int): DataFrame = {
    val nseg = k + 1
    val base = df.filter(col(strCol).isNotNull)
      .select(col(keyCol).as("key"), col(strCol).as("s"),
        length(col(strCol)).as("len"))
    // even split, remainder spread over the LAST (len mod nseg) segments:
    // seg i has length base+(i ≥ nseg−rem ? 1 : 0), start i·base+max(0, i−(nseg−rem))
    def segLen(l: Column, i: Int): Column =
      (floor(l / nseg) + when(lit(i) >= lit(nseg) - pmod(l, lit(nseg)), 1)
        .otherwise(0)).cast("int")
    def segPos(l: Column, i: Int): Column =
      (lit(i) * floor(l / nseg) +
        greatest(lit(0), lit(i) - (lit(nseg) - pmod(l, lit(nseg)))))
        .cast("int")
    val segStructs = (0 until nseg).map { i =>
      struct(lit(i).as("i"), segPos(col("l"), i).as("p"),
        segLen(col("l"), i).as("sl"))
    }
    val idx = base
      .withColumn("l", col("len").cast("int"))
      .select(col("key").as("key_i"), col("s").as("s_i"), col("l"),
        explode(array(segStructs: _*)).as("g"))
      .select(col("key_i"), col("s_i"), col("l"), col("g.i").as("i"),
        col("s_i").substr(col("g.p") + lit(1), col("g.sl")).as("seg"))
    val d = col("m") - col("l")
    val delLim = floor((lit(k) - d) / 2).cast("int")
    val insLim = floor((lit(k) + d) / 2).cast("int")
    val lo = greatest(lit(0), col("g.p") - delLim)
    val hi = least(col("m") - col("g.sl"), col("g.p") + insLim)
    val probes = base
      .withColumn("m", col("len").cast("int"))
      .withColumn("l", explode(sequence(greatest(col("m") - k, lit(0)), col("m"))))
      .withColumn("g", explode(array(segStructs: _*)))
      .withColumn("q", explode(when(lo <= hi, sequence(lo, hi))
        .otherwise(array().cast("array<int>"))))
      .select(col("key").as("key_p"), col("s").as("s_p"), col("m"),
        col("l"), col("g.i").as("i"),
        col("s").substr(col("q") + lit(1), col("g.sl")).as("seg"))
    idx.join(probes,
        idx("seg") === probes("seg") && idx("i") === probes("i")
          && idx("l") === probes("l")
          // indexed = (len, key)-lexicographically smaller (l ≤ m by
          // construction, so only the equal-length tie needs the key)
          && (probes("m") > idx("l") || idx("key_i") < probes("key_p")))
      .select(col("key_i"), col("key_p"), col("s_i"), col("s_p"))
      .distinct()
  }

  /** The pair stage of the embedding dedup, unordered — feeds the
    * `dedup_near_embedding` oracle query above. */
  private[graft] def embeddingNearDupPairs(s: SparkSession, d: String,
      minCos: Double = 0.4): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
    emb.alias("a").join(emb.alias("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")))
          .as("cosine"))
      .filter(col("cosine") >= minCos)
  }

  def oracleSql: Map[String, String] = Map(
    // positional zip via DuckDB's aligned multi-unnest; params per dim
    // need no arithmetic (min/max) and the encode is the identical IEEE
    // sequence — (val−mn)/st, round (both engines round half-up on the
    // non-negative domain), clamp, int cast — so the integer codes match
    // exactly. Scalar rows (pos 0-based to match Spark's posexplode).
    "sim_sq_encode" ->
      """WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |e AS (SELECT vec_id, unnest(v) AS val,
        |    unnest(range(1, len(v) + 1)) AS pos FROM x),
        |d AS (SELECT pos, min(val) AS mn,
        |    (max(val) - min(val)) / 255.0 AS st FROM e GROUP BY pos),
        |c AS (SELECT vec_id, pos,
        |    CASE WHEN st = 0 THEN 0 ELSE CAST(least(greatest(
        |      round((val - mn) / st, 0), 0.0), 255.0) AS INT) END AS code
        |  FROM e JOIN d USING (pos))
        |SELECT vec_id, CAST(pos - 1 AS INT) AS pos, code
        |FROM c ORDER BY vec_id, pos""".stripMargin,

    // the oracle never sees the packed longs: Hamming distance is
    // recomputed as a per-dimension sign-disagreement count over the raw
    // arrays ((a_i >= 0) <> (p_i >= 0)) — integer output, no float
    // summation anywhere
    "sim_bq_topk" ->
      """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |probe AS (SELECT v AS p FROM emb WHERE vec_id = 0)
        |SELECT vec_id,
        |  CAST(len(list_filter(range(1, 65),
        |    i -> (v[i] >= 0) <> (p[i] >= 0))) AS INTEGER) AS hamming
        |FROM emb CROSS JOIN probe WHERE vec_id <> 0
        |ORDER BY hamming ASC, vec_id ASC LIMIT 20""".stripMargin,

    "sim_cosine_topk" ->
      """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |normed AS (SELECT vec_id, v,
        |    sqrt(list_reduce(list_transform(list_zip(v, v), z -> z[1] * z[2]),
        |      (acc, x) -> acc + x)) AS norm FROM emb),
        |probe AS (SELECT v AS p, norm AS pnorm FROM normed WHERE vec_id = 0),
        |scored AS (
        |  SELECT vec_id,
        |    list_reduce(list_transform(list_zip(v, p), z -> z[1] * z[2]),
        |      (acc, x) -> acc + x) / (norm * pnorm) AS cosine
        |  FROM normed CROSS JOIN probe WHERE vec_id <> 0)
        |SELECT vec_id, cosine FROM scored
        |ORDER BY cosine DESC, vec_id ASC LIMIT 20""".stripMargin,

    "sim_string_join" ->
      """WITH p AS (SELECT p_partkey AS key, p_name AS name,
        |    substring(p_name, 1, 1) || string_split(p_name, ' ')[-1] AS block
        |  FROM part)
        |SELECT a.key AS key_a, b.key AS key_b, a.name AS name_a, b.name AS name_b,
        |  levenshtein(a.name, b.name) AS dist
        |FROM p a JOIN p b ON a.block = b.block AND a.key < b.key
        |  AND abs(length(a.name) - length(b.name)) <= 3
        |  AND levenshtein(a.name, b.name) <= 3
        |ORDER BY key_a, key_b""".stripMargin,

    "sim_edit_join" ->
      """WITH c AS (SELECT c_custkey AS key, c_name AS name FROM customer)
        |SELECT a.key AS key_a, b.key AS key_b,
        |  a.name AS name_a, b.name AS name_b,
        |  levenshtein(a.name, b.name) AS dist
        |FROM c a JOIN c b ON a.key < b.key
        |  AND abs(length(a.name) - length(b.name)) <= 1
        |  AND levenshtein(a.name, b.name) <= 1
        |ORDER BY key_a, key_b""".stripMargin,

    "sim_ngram_jaccard" ->
      """WITH docs AS (SELECT doc_id, source,
        |    list_distinct(string_split(text, ' ')) AS toks,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter,
        |    a.n + b.n AS sum_n
        |  FROM docs a JOIN docs b ON a.source = b.source AND a.doc_id < b.doc_id
        |    AND CAST(least(a.n, b.n) AS DOUBLE) / greatest(a.n, b.n) >= 0.8)
        |SELECT doc_a, doc_b,
        |  CAST(inter AS DOUBLE) / (sum_n - inter) AS jaccard
        |FROM pairs
        |WHERE CAST(inter AS DOUBLE) / (sum_n - inter) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,

    "sim_knn_graph" ->
      """WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |normed AS (SELECT vec_id, label, v,
        |    sqrt(list_reduce(list_transform(list_zip(v, v), z -> z[1] * z[2]),
        |      (acc, x) -> acc + x)) AS norm FROM emb),
        |pairs AS (
        |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
        |    list_reduce(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2]),
        |      (acc, x) -> acc + x) / (a.norm * b.norm) AS cosine
        |  FROM normed a JOIN normed b
        |    ON a.label = b.label AND a.vec_id <> b.vec_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY cosine DESC, nbr_id ASC) AS rank FROM pairs)
        |SELECT vec_id, nbr_id, cosine, rank FROM r WHERE rank <= 3
        |ORDER BY vec_id, rank""".stripMargin,

    "dedup_near_embedding" ->
      """WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |normed AS (SELECT vec_id, label, v,
        |    sqrt(list_reduce(list_transform(list_zip(v, v), z -> z[1] * z[2]),
        |      (acc, x) -> acc + x)) AS norm FROM emb),
        |pairs AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    list_reduce(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2]),
        |      (acc, x) -> acc + x) / (a.norm * b.norm) AS cosine
        |  FROM normed a JOIN normed b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, cosine FROM pairs
        |WHERE cosine >= 0.4 ORDER BY vec_a, vec_b""".stripMargin
  )
}
