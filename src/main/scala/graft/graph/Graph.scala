package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Graph centrality over similarity graphs (SURVEY §2 B9.71): PageRank
  * (Page et al. 1999) and personalized PageRank (the seed-restart random
  * walk — Haveliwala 2002's topic-sensitive form) as relational
  * operators over an (src, dst) edge table. The data-pipeline use is
  * graph-diffusion data selection: rank documents by centrality in the
  * k-NN similarity graph (representative-sample mining), or diffuse a
  * trusted seed set outward (the graph sibling of the Rocchio seed-set
  * classifier) — both published curation recipes.
  *
  * Determinism discipline: a PageRank iteration is per-node float SUMS
  * over in-neighbors, whose order no SQL engine specifies. The ORACLED
  * forms below fold each node's in-flow in src order (collect_list →
  * array_sort → aggregate ≡ DuckDB `list_reduce(list(... ORDER BY
  * src))` — the eval_ndcg discipline), so every iteration is bit-exact
  * cross-engine. The fold materializes each node's in-neighbor list, so
  * its cost is in-degree-bounded — fine on bounded-degree similarity
  * graphs (k-NN in-degree concentrates near k), wrong on a web graph
  * with 10⁷-in-degree hubs; [[pageRankFast]] is the production form
  * (plain mergeable SUM — map-side combine, no list), spec-pinned to
  * rank identically and agree within float-accumulation noise.
  *
  * Dangling nodes: every node of the declared k-NN graph has out-degree
  * ≥ 1 by construction (each vector emits k edges), so no dangling mass
  * exists on the declared keys. The operators implement the LEAKING
  * variant (no dangling redistribution — a node with in-edges only
  * contributes nothing), the documented choice that keeps each
  * iteration one join + one fold with no global float reduction; the
  * total-mass invariant is asserted in the spec on dangling-free input.
  */
object Graph {

  private val Damping = 0.85

  /** (1-d)/n teleport share — both engines compute the SAME IEEE tree
    * (1 - 0.85 in doubles, then the divide), never a pre-folded 0.15
    * literal (a shortest-decimal 0.15 is a DIFFERENT double than the
    * subtraction's result). */
  private def teleport(nCol: Column, d: Double): Column =
    (lit(1.0) - lit(d)) / nCol.cast("double")

  /** src-ordered deterministic fold of per-edge contributions into each
    * dst's in-flow.
    *
    * PRECONDITION (ADVICE r14): the edge table must be (src, dst)-DISTINCT
    * for the cross-engine bit-exactness claim — the sort key is
    * struct(src, contrib), so duplicate (src, dst) edges tie-break by
    * contrib VALUE here while the DuckDB mirror `list(contrib ORDER BY
    * src)` leaves tie order unspecified. The declared k-NN edge sets are
    * (src, dst)-distinct by construction (one ranked edge per ordered
    * pair); a caller bringing a multigraph must `distinct()` (or
    * pre-aggregate parallel edges) first. This binds [[pageRank]],
    * [[personalizedPageRank]] and [[pageRankWeighted]] alike. */
  private def inflowFold: Column =
    aggregate(
      transform(array_sort(collect_list(struct(col("src"), col("contrib")))),
        x => x.getField("contrib")),
      lit(0.0), (acc, x) => acc + x).as("inflow")

  /** Node table (id) = distinct src ∪ dst, and the in-plan node count —
    * a one-row broadcast, no driver round-trip. */
  private def nodesAndCount(edges: DataFrame): (DataFrame, DataFrame) = {
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    (nodes, nodes.agg(count(lit(1)).as("n")))
  }

  /** Deterministic PageRank: `iters` exact power iterations at damping
    * `d`, r₀ = 1/n, rₜ₊₁(v) = (1-d)/n + d·Σ_{u→v} rₜ(u)/outdeg(u) with
    * the sum folded in src order. Returns (id, pr). Per iteration: one
    * broadcast-able (outdeg, rank) attach on src, one groupBy(dst) fold,
    * one left join back to nodes — shuffle ∝ |E| on dst, never
    * all-pairs. `edges` must be (src, dst)-distinct — see [[inflowFold]]'s
    * precondition. */
  def pageRank(edges: DataFrame, iters: Int,
      d: Double = Damping): DataFrame = {
    val es = edges.localCheckpoint() // one edge materialization per run
    val (nodes, cnt) = nodesAndCount(es)
    val out = es.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = nodes.crossJoin(broadcast(cnt))
      .select(col("id"), (lit(1.0) / col("n").cast("double")).as("pr"))
    for (_ <- 1 to iters) {
      val contribs = es
        .join(out, "src")
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), col("src"),
          (col("pr") / col("outdeg")).as("contrib"))
      val inflow = contribs.groupBy("dst").agg(inflowFold)
      ranks = nodes.crossJoin(broadcast(cnt))
        .join(inflow.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (teleport(col("n"), d) +
            lit(d) * coalesce(col("inflow"), lit(0.0))).as("pr"))
    }
    ranks
  }

  /** Personalized PageRank: the teleport mass restarts at the SEED SET
    * instead of uniformly — rₜ₊₁(v) = (1-d)·t(v) + d·inflow with
    * t(v) = 1/|S| on seeds, 0 elsewhere; r₀ = t. Diffusion distance
    * from a trusted set, the curation seed-expansion primitive. `seeds`
    * is one `id` column; the seed share rides a one-row broadcast. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int,
      d: Double = Damping): DataFrame = {
    val es = edges.localCheckpoint() // one edge materialization per run
    val (nodes, _) = nodesAndCount(es)
    val out = es.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val sCnt = seeds.agg(count(lit(1)).as("ns"))
    val seeded = nodes
      .join(seeds.select(col("id"), lit(1).as("is_seed")), Seq("id"), "left")
      .crossJoin(broadcast(sCnt))
      .select(col("id"),
        when(col("is_seed").isNotNull,
          lit(1.0) / col("ns").cast("double"))
          .otherwise(lit(0.0)).as("t"))
    var ranks = seeded.select(col("id"), col("t").as("pr"))
    for (_ <- 1 to iters) {
      val contribs = es
        .join(out, "src")
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), col("src"),
          (col("pr") / col("outdeg")).as("contrib"))
      val inflow = contribs.groupBy("dst").agg(inflowFold)
      ranks = seeded
        .join(inflow.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          ((lit(1.0) - lit(d)) * col("t") +
            lit(d) * coalesce(col("inflow"), lit(0.0))).as("pr"))
    }
    ranks
  }

  /** Weighted PageRank: edges carry a positive weight and each source
    * distributes its rank proportionally — rₜ₊₁(v) = (1-d)/n +
    * d·Σ_{u→v} rₜ(u)·w(u→v)/W(u) with W(u) = Σ w(u→·). Both the
    * per-source outflow W and the per-target inflow are folded in
    * neighbor order (dst order and src order respectively — both
    * degree-bounded), so every iteration stays bit-exact cross-engine.
    * `edges` is (src, dst, w) with w > 0 (the declared key maps cosine
    * to 1 + cos ∈ (0, 2] — one mirrored IEEE add) and must be
    * (src, dst)-distinct — see [[inflowFold]]'s precondition. */
  def pageRankWeighted(edges: DataFrame, iters: Int,
      d: Double = Damping): DataFrame = {
    val es = edges.localCheckpoint() // one edge materialization per run
    val (nodes, cnt) = nodesAndCount(es)
    val outW = es.groupBy("src").agg(
      aggregate(
        transform(array_sort(collect_list(struct(col("dst"), col("w")))),
          x => x.getField("w")),
        lit(0.0), (acc, x) => acc + x).as("wout"))
    var ranks = nodes.crossJoin(broadcast(cnt))
      .select(col("id"), (lit(1.0) / col("n").cast("double")).as("pr"))
    for (_ <- 1 to iters) {
      val contribs = es
        .join(outW, "src")
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), col("src"),
          (col("pr") * col("w") / col("wout")).as("contrib"))
      val inflow = contribs.groupBy("dst").agg(inflowFold)
      ranks = nodes.crossJoin(broadcast(cnt))
        .join(inflow.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (teleport(col("n"), d) +
            lit(d) * coalesce(col("inflow"), lit(0.0))).as("pr"))
    }
    ranks
  }

  /** Degree-bounded deterministic fold of `contrib` over each group,
    * ordered by `orderKey` (unique per group — one edge per endpoint
    * pair). */
  private def orderedFold(orderKey: String): Column =
    aggregate(
      transform(
        array_sort(collect_list(struct(col(orderKey), col("contrib")))),
        x => x.getField("contrib")),
      lit(0.0), (acc, x) => acc + x)

  /** HITS (Kleinberg 1999): authority(v) = Σ hub of in-neighbors,
    * hub(u) = Σ authority of out-neighbors, renormalized each step. The
    * determinism recipe: per-node sums are degree-bounded neighbor-
    * ordered folds (src order into authorities, dst order into hubs),
    * and normalization is L∞ — MAX is order-independent and exact
    * where the textbook L1/L2 norms are corpus-sized float sums with
    * no canonical order, so the L∞ choice is what keeps every
    * iteration bit-exact cross-engine (scores land in [0, 1] with the
    * top node at exactly 1; the RANKING is the same as under any
    * positive rescaling). Returns (id, hub, auth). */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    // CONTRACT (ADVICE r16): `iters >= 1` — the lean shape seeds scores
    // on edge endpoints only, so the degenerate iters = 0 would return
    // 0.0 rows for sink-only nodes where the r15 all-ones init returned
    // 1.0. Also EAGER: construction runs jobs (the per-half-iteration
    // checkpoints and the 1-row L∞ head()), not just plan-building.
    require(iters >= 1, s"hits needs iters >= 1 (got $iters)")
    // materialize the (possibly expensive) edge plan ONCE — each of the
    // 3 iterations references edges twice, and without this the k-NN
    // subtree re-evaluates ~19 times inside one action
    // (measured: 5.8 s -> checkpointed, the Dedup discipline)
    val es = edges.localCheckpoint()
    var hubs = es.select(col("src").as("id")).distinct()
      .select(col("id"), lit(1.0).as("hub"))
    var auths: DataFrame = hubs.select(col("id"), lit(1.0).as("auth"))
    for (_ <- 1 to iters) {
      // Each L∞ normalization references its raw table TWICE (the max
      // aggregate and the divide), so the raw table is checkpointed
      // per half-iteration: without this the plan DOUBLES per
      // normalization (~2^iters subtree growth — the r14 verdict's one
      // watch-item); with it the per-iteration plan is CONSTANT-size
      // and hits(edges, 20) is as safe as pageRankFast. Values are
      // untouched (a checkpoint replays nothing).
      //
      // LEAN SHAPE (round 16, measured −34% at sf0.1): intermediate
      // score tables carry only nodes with in- (resp. out-) edges —
      // a zero-score node contributes an exact-0.0 term to the next
      // fold, and acc + 0.0 ≡ acc in IEEE for the non-negative left
      // folds here, so dropping those rows is bit-identical; the
      // missing zeros are re-attached ONCE in the final projection.
      // That removes the per-half-iteration nodes attach (a join
      // stage inside every checkpoint job). The L∞ max rides a 1-row
      // driver head() off the checkpointed raw table (k-bounded, the
      // tokenizer-argmax discipline) instead of a broadcast-exchange
      // crossJoin — same double, two fewer plan stages per half-step.
      val aRaw = es
        .join(hubs.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), col("src"), col("hub").as("contrib"))
        .groupBy("dst").agg(orderedFold("src").as("raw"))
        .localCheckpoint()
      auths = aRaw.select(col("dst").as("id"),
        (col("raw") / lit(maxOf(aRaw))).as("auth"))
      val hRaw = es
        .join(auths.withColumnRenamed("id", "dst"), "dst")
        .select(col("src"), col("dst"), col("auth").as("contrib"))
        .groupBy("src").agg(orderedFold("dst").as("raw"))
        .localCheckpoint()
      hubs = hRaw.select(col("src").as("id"),
        (col("raw") / lit(maxOf(hRaw))).as("hub"))
    }
    finalAttach(es, hubs, auths)
  }

  /** Final zero re-attach: ONE groupBy over a union replaces the r16
    * nodes-distinct + two left joins (round 17, plan-verified: the
    * union's single exchange subsumes the distinct exchange and both
    * join stages). Node ids enter as null-score rows — no distinct
    * needed, the groupBy dedups; hubs/auths each contribute their one
    * non-null row per id, `max` picks it (bit-identical: max over one
    * non-null double), coalesce fills the zeros. */
  private def finalAttach(es: DataFrame, hubs: DataFrame,
      auths: DataFrame): DataFrame = {
    val nullD = lit(null).cast("double")
    es.select(col("src").as("id")).union(es.select(col("dst").as("id")))
      .select(col("id"), nullD.as("hub"), nullD.as("auth"))
      .union(hubs.select(col("id"), col("hub"), nullD.as("auth")))
      .union(auths.select(col("id"), nullD.as("hub"), col("auth")))
      .groupBy("id")
      .agg(coalesce(max("hub"), lit(0.0)).as("hub"),
        coalesce(max("auth"), lit(0.0)).as("auth"))
  }

  /** L∞ norm of a checkpointed (…, raw) score table as a driver double —
    * 1-row, k-bounded; 1.0 on an empty table (degenerate empty graph,
    * where no row ever divides by it). */
  private def maxOf(raw: DataFrame): Double = {
    val r = raw.agg(max("raw")).head()
    if (r.isNullAt(0)) 1.0 else r.getDouble(0)
  }

  /** Production HITS: the [[pageRankFast]] discipline applied to
    * [[hits]] — plain mergeable SUMs (map-side combine, no per-node
    * list — the hub-safe shape on graphs where in-degree doesn't
    * concentrate) with the same per-half-iteration checkpoint keeping
    * the plan constant-size at any iteration count. Float-accumulation
    * order is engine-chosen, so this form is TEST-gated (§7.5.7):
    * GraphSpec pins it to [[hits]] within accumulation noise and
    * rank-identical on the fixtures. */
  def hitsFast(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"hitsFast needs iters >= 1 (got $iters)") // see hits
    // the lean shape of [[hits]] (see there): no per-half-iteration
    // nodes attach, driver-side L∞ max — same plain-SUM in-flows
    val es = edges.localCheckpoint()
    var hubs = es.select(col("src").as("id")).distinct()
      .select(col("id"), lit(1.0).as("hub"))
    var auths: DataFrame = hubs.select(col("id"), lit(1.0).as("auth"))
    for (_ <- 1 to iters) {
      val aRaw = es
        .join(hubs.withColumnRenamed("id", "src"), "src")
        .groupBy("dst").agg(sum(col("hub")).as("raw"))
        .localCheckpoint()
      auths = aRaw.select(col("dst").as("id"),
        (col("raw") / lit(maxOf(aRaw))).as("auth"))
      val hRaw = es
        .join(auths.withColumnRenamed("id", "dst"), "dst")
        .groupBy("src").agg(sum(col("auth")).as("raw"))
        .localCheckpoint()
      hubs = hRaw.select(col("src").as("id"),
        (col("raw") / lit(maxOf(hRaw))).as("hub"))
    }
    finalAttach(es, hubs, auths)
  }

  /** Production PageRank: plain SUM in-flows (mergeable partial
    * aggregates, map-side combine, no per-node list — the hub-safe
    * shape) + `localCheckpoint` every 5 iterations to bound lineage on
    * long runs. Float-accumulation order is engine-chosen, so this form
    * is TEST-gated (§7.5.7): GraphSpec pins it to [[pageRank]] within
    * accumulation noise and rank-identical on the fixture. */
  def pageRankFast(edges: DataFrame, iters: Int,
      d: Double = Damping): DataFrame = {
    val es = edges.localCheckpoint() // one edge materialization per run
    val (nodes, cnt) = nodesAndCount(es)
    val out = es.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = nodes.crossJoin(broadcast(cnt))
      .select(col("id"), (lit(1.0) / col("n").cast("double")).as("pr"))
    for (i <- 1 to iters) {
      val contribs = es
        .join(out, "src")
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), (col("pr") / col("outdeg")).as("contrib"))
      val inflow = contribs.groupBy("dst")
        .agg(sum(col("contrib")).as("inflow"))
      ranks = nodes.crossJoin(broadcast(cnt))
        .join(inflow.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (teleport(col("n"), d) +
            lit(d) * coalesce(col("inflow"), lit(0.0))).as("pr"))
      if (i % 5 == 0) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Per-node triangle counts of the UNDIRECTED graph: canonicalize to
    * u < v (each undirected edge once), enumerate ordered triangles
    * a < b < c via the standard edge-iterator join chain — (a,b)⋈(b,c)
    * closed by (a,c) — then credit each corner. Candidate volume is
    * Σ deg² (bounded on a k-NN graph where in-degree concentrates near
    * k), every join an equi-join on edge endpoints; exact integers end
    * to end. The data-pipeline read: a document in many triangles sits
    * in a densely-connected similarity neighborhood — a cluster core,
    * the complement of the centrality signal. */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val tri = und.select(col("u").as("a"), col("v").as("b"))
      .join(und.select(col("u").as("b2"), col("v").as("c")),
        col("b") === col("b2"))
      .join(und.select(col("u").as("a3"), col("v").as("c3")),
        col("a") === col("a3") && col("c") === col("c3"), "left_semi")
      .select(col("a"), col("b"), col("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
  }

  /** Local clustering coefficient (Watts & Strogatz 1998):
    * cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) over the undirected distinct
    * neighborhood — "how close is v's neighborhood to a clique". All
    * integers up to ONE exactly-rounded IEEE division, so the
    * coefficient is oracle-able; nodes of degree ≤ 1 are excluded (their
    * coefficient is undefined — 0/0). Composition of the degree
    * aggregate and [[triangles]]: one extra groupBy + one broadcast-able
    * join over the triangle table. */
  def clusteringCoef(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = und.select(col("u").as("id"))
      .unionByName(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    deg.filter(col("deg") >= 2L)
      .join(triangles(edges), Seq("id"), "left")
      .na.fill(0L, Seq("n_tri"))
      .select(col("id"), col("deg"), col("n_tri"),
        ((col("n_tri") * 2L).cast("double") /
          (col("deg") * (col("deg") - 1L)).cast("double")).as("coef"))
  }

  /** All ORDERED within-label pairs with their cosine, each UNORDERED
    * pair's dot product computed ONCE (round 17 half-pairing, the r16
    * knnEdges candidate): the self-join enumerates a < b only — half
    * the dominant dot-product volume — and the mirror rides an
    * explode(array(struct…)) INSIDE the same stage, upstream of the
    * rank window's exchange, so no extra job or checkpoint (what killed
    * the r16 attempt). Bit-identical to the two-sided join: IEEE
    * multiply is commutative per element, the fold order over
    * dimensions is unchanged, and the norm product commutes — so
    * cosine(a,b) is the same double in both directions (probe witness:
    * except() empty both ways, weights included). */
  private def knnOrderedPairs(s: SparkSession, d: String): DataFrame = {
    val dot = graft.sim.VectorMath.dot _
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
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
  }

  private def knnRankWindow = org.apache.spark.sql.expressions.Window
    .partitionBy("vec_id").orderBy(desc("cosine"), asc("nbr_id"))

  /** The declared edge set: the `sim_knn_graph` k=3 label-blocked exact
    * k-NN graph (Similarity.scala) projected to (src, dst) — the one
    * similarity graph whose edge list is already proven bit-exact
    * cross-engine. */
  private[graph] def knnEdges(s: SparkSession, d: String): DataFrame =
    knnOrderedPairs(s, d)
      .withColumn("rank", row_number().over(knnRankWindow))
      .filter(col("rank") <= 3)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))

  /** The weighted declared edge set: [[knnEdges]] keeping the cosine,
    * mapped to w = 1 + cos ∈ (0, 2] (one mirrored IEEE add — PageRank
    * weights must be positive and label-blocked k-NN cosines can go
    * negative). */
  private[graph] def knnEdgesW(s: SparkSession, d: String): DataFrame =
    knnOrderedPairs(s, d)
      .withColumn("rank", row_number().over(knnRankWindow))
      .filter(col("rank") <= 3)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"),
        (lit(1.0) + col("cosine")).as("w"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // 3 power iterations of deterministic PageRank over the k-NN
    // similarity graph — centrality-ranked vectors, bit-exact both
    // engines (every float op mirrored, in-flows folded in src order).
    "graph_pagerank" -> ((s, d) =>
      pageRank(knnEdges(s, d), iters = 3)
        .select(col("id").as("vec_id"), col("pr"))
        .orderBy("vec_id")),

    // Personalized PageRank from the md5-nibble-0 seed set (the sampler
    // discipline — both engines derive the identical seeds): diffusion
    // affinity to a trusted set through the similarity graph.
    "graph_ppr" -> ((s, d) => {
      val edges = knnEdges(s, d)
      val seeds = Tables.embeddings(s, d).select(col("vec_id").as("id"))
        .filter(substring(md5(col("id").cast("string")), 1, 1) === "0")
      personalizedPageRank(edges, seeds, iters = 3)
        .select(col("id").as("vec_id"), col("pr"))
        .orderBy("vec_id")
    }),

    // Connected components of the (undirected) k-NN graph — the PROVEN
    // Dedup min-label propagation reused verbatim on a new edge source;
    // integer-exact, oracled against a recursive reachability CTE.
    "graph_components" -> ((s, d) =>
      graft.sim.Dedup.connectedComponents(knnEdges(s, d), "src", "dst")
        .select(col("id").as("vec_id"), col("label"))
        .orderBy("vec_id")),

    // The O(log n)-round production twin DECLARED in its own right
    // (round 16): identical labels by construction, identical oracle —
    // the correctness gate now covers the star-alternation path
    // end-to-end, not only via the spec equality pin.
    "graph_components_fast" -> ((s, d) =>
      graft.sim.Dedup.componentsFast(knnEdges(s, d), "src", "dst")
        .select(col("id").as("vec_id"), col("label"))
        .orderBy("vec_id")),

    // Per-node triangle counts — density of the similarity neighborhood.
    "graph_triangles" -> ((s, d) =>
      triangles(knnEdges(s, d))
        .select(col("id").as("vec_id"), col("n_tri"))
        .orderBy("vec_id")),

    // Watts–Strogatz local clustering coefficient — integers to one
    // exactly-rounded division, so it stays oracle-able.
    "graph_clustering_coef" -> ((s, d) =>
      clusteringCoef(knnEdges(s, d))
        .select(col("id").as("vec_id"), col("deg"), col("n_tri"),
          col("coef"))
        .orderBy("vec_id")),

    // Similarity-weighted PageRank: each vector distributes rank in
    // proportion to edge cosine (mapped positive) — nearer neighbors
    // carry more centrality mass than the unweighted walk.
    "graph_pagerank_weighted" -> ((s, d) =>
      pageRankWeighted(knnEdgesW(s, d), iters = 3)
        .select(col("id").as("vec_id"), col("pr"))
        .orderBy("vec_id")),

    // HITS hubs/authorities — on a k-NN graph authorities are the
    // vectors many neighborhoods point AT (cluster centers), hubs the
    // vectors whose out-neighborhood is authoritative.
    "graph_hits" -> ((s, d) =>
      hits(knnEdges(s, d), iters = 3)
        .select(col("id").as("vec_id"), col("hub"), col("auth"))
        .orderBy("vec_id"))
  )

  // ------------------------------------------------------------ oracle

  /** The shared edge-set CTE prefix — the sim_knn_graph chain verbatim,
    * projected to (src, dst), plus nodes = distinct src ∪ dst and the
    * node count. */
  private val edgeCtes =
    """WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |normed AS (SELECT vec_id, label, v,
      |    sqrt(list_reduce(list_transform(list_zip(v, v), z -> z[1] * z[2]),
      |      (acc, x) -> acc + x)) AS norm FROM emb),
      |prs AS (
      |  SELECT a.vec_id AS src, b.vec_id AS dst,
      |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
      |      list_reduce(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2]),
      |        (acc, x) -> acc + x) / (a.norm * b.norm) DESC,
      |      b.vec_id ASC) AS rank
      |  FROM normed a JOIN normed b
      |    ON a.label = b.label AND a.vec_id <> b.vec_id),
      |edges AS (SELECT src, dst FROM prs WHERE rank <= 3),
      |outd AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
      |nodes AS (SELECT DISTINCT src AS id FROM edges
      |  UNION SELECT DISTINCT dst FROM edges),
      |cnt AS (SELECT COUNT(*) AS n FROM nodes)""".stripMargin

  /** The weighted edge-set prefix: the same chain keeping the cosine,
    * w = 1 + cos, plus the dst-ordered per-source outflow fold. */
  private val edgeCtesW =
    """WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |normed AS (SELECT vec_id, label, v,
      |    sqrt(list_reduce(list_transform(list_zip(v, v), z -> z[1] * z[2]),
      |      (acc, x) -> acc + x)) AS norm FROM emb),
      |pairsw AS (
      |  SELECT a.vec_id AS src, b.vec_id AS dst,
      |    list_reduce(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2]),
      |      (acc, x) -> acc + x) / (a.norm * b.norm) AS cos
      |  FROM normed a JOIN normed b
      |    ON a.label = b.label AND a.vec_id <> b.vec_id),
      |prsw AS (SELECT src, dst, cos, row_number() OVER (
      |    PARTITION BY src ORDER BY cos DESC, dst ASC) AS rank
      |  FROM pairsw),
      |edges AS (SELECT src, dst, CAST(1 AS DOUBLE) + cos AS w
      |  FROM prsw WHERE rank <= 3),
      |outw AS (SELECT src, list_reduce(list(w ORDER BY dst),
      |    (acc, x) -> acc + x) AS wout FROM edges GROUP BY src),
      |nodes AS (SELECT DISTINCT src AS id FROM edges
      |  UNION SELECT DISTINCT dst FROM edges),
      |cnt AS (SELECT COUNT(*) AS n FROM nodes)""".stripMargin

  /** The weighted iteration template — contrib = r·w/W(u). */
  private def iterCtesW(i: Int, rankExpr: String): String =
    s"""c$i AS (SELECT e.dst, e.src, r${i - 1}.pr * e.w / o.wout AS contrib
       |  FROM edges e JOIN outw o ON e.src = o.src
       |  JOIN r${i - 1} ON e.src = r${i - 1}.id),
       |i$i AS (SELECT dst, list_reduce(list(contrib ORDER BY src),
       |    (acc, x) -> acc + x) AS inflow FROM c$i GROUP BY dst),
       |r$i AS (SELECT id, ${rankExpr} AS pr
       |  FROM base LEFT JOIN i$i ON base.id = i$i.dst)""".stripMargin

  /** One unrolled iteration (contribs → src-ordered fold → rank update)
    * reading r${i-1}, producing r$i; `rank` is the per-node update
    * expression with `COALESCE(inflow, CAST(0 AS DOUBLE))` spliced as
    * `IN`. */
  private def iterCtes(i: Int, rankExpr: String): String =
    s"""c$i AS (SELECT e.dst, e.src, r${i - 1}.pr / outd.outdeg AS contrib
       |  FROM edges e JOIN outd ON e.src = outd.src
       |  JOIN r${i - 1} ON e.src = r${i - 1}.id),
       |i$i AS (SELECT dst, list_reduce(list(contrib ORDER BY src),
       |    (acc, x) -> acc + x) AS inflow FROM c$i GROUP BY dst),
       |r$i AS (SELECT id, ${rankExpr} AS pr
       |  FROM base LEFT JOIN i$i ON base.id = i$i.dst)""".stripMargin

  private val In = "COALESCE(inflow, CAST(0 AS DOUBLE))"

  def oracleSql: Map[String, String] = Map(
    "graph_pagerank" -> {
      val upd = "(CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / CAST(n AS DOUBLE)" +
        s" + CAST(0.85 AS DOUBLE) * $In"
      s"""$edgeCtes,
         |base AS (SELECT id, n FROM nodes CROSS JOIN cnt),
         |r0 AS (SELECT id, CAST(1 AS DOUBLE) / CAST(n AS DOUBLE) AS pr
         |  FROM base),
         |${(1 to 3).map(i => iterCtes(i, upd)).mkString(",\n")}
         |SELECT id AS vec_id, pr FROM r3 ORDER BY vec_id""".stripMargin
    },
    "graph_ppr" -> {
      val upd = "(CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * t" +
        s" + CAST(0.85 AS DOUBLE) * $In"
      s"""$edgeCtes,
         |seeds AS (SELECT vec_id AS id FROM embeddings
         |  WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '0'),
         |scnt AS (SELECT COUNT(*) AS ns FROM seeds),
         |base AS (SELECT nodes.id,
         |    CASE WHEN seeds.id IS NOT NULL
         |      THEN CAST(1 AS DOUBLE) / CAST(ns AS DOUBLE)
         |      ELSE CAST(0 AS DOUBLE) END AS t
         |  FROM nodes LEFT JOIN seeds ON nodes.id = seeds.id
         |  CROSS JOIN scnt),
         |r0 AS (SELECT id, t AS pr FROM base),
         |${(1 to 3).map(i => iterCtes(i, upd)).mkString(",\n")}
         |SELECT id AS vec_id, pr FROM r3 ORDER BY vec_id""".stripMargin
    },

    "graph_pagerank_weighted" -> {
      val upd = "(CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / CAST(n AS DOUBLE)" +
        s" + CAST(0.85 AS DOUBLE) * $In"
      s"""$edgeCtesW,
         |base AS (SELECT id, n FROM nodes CROSS JOIN cnt),
         |r0 AS (SELECT id, CAST(1 AS DOUBLE) / CAST(n AS DOUBLE) AS pr
         |  FROM base),
         |${(1 to 3).map(i => iterCtesW(i, upd)).mkString(",\n")}
         |SELECT id AS vec_id, pr FROM r3 ORDER BY vec_id""".stripMargin
    },

    // HITS unrolled: per-iteration authority fold (src order) → L∞
    // normalize → hub fold (dst order) → L∞ normalize. Two
    // blowup-avoidance rules learned the hard way (the first cut of
    // this oracle re-evaluated the all-pairs k-NN chain combinatorially
    // — 2 references per level over 12 levels — and filled the disk
    // with DuckDB spill): the expensive prefix is AS MATERIALIZED, and
    // normalization is MAX() OVER () (one scan) instead of a scalar
    // subquery (a second reference per level).
    "graph_hits" -> {
      def it(i: Int): String =
        s"""ar$i AS (SELECT e.dst, list_reduce(list(h.hub ORDER BY e.src),
           |    (acc, x) -> acc + x) AS raw
           |  FROM edges e JOIN h${i - 1} h ON e.src = h.id GROUP BY e.dst),
           |a$i AS MATERIALIZED (SELECT id,
           |    COALESCE(raw, CAST(0 AS DOUBLE))
           |      / MAX(COALESCE(raw, CAST(0 AS DOUBLE))) OVER () AS auth
           |  FROM nodes LEFT JOIN ar$i ON nodes.id = ar$i.dst),
           |hr$i AS (SELECT e.src, list_reduce(list(a.auth ORDER BY e.dst),
           |    (acc, x) -> acc + x) AS raw
           |  FROM edges e JOIN a$i a ON e.dst = a.id GROUP BY e.src),
           |h$i AS MATERIALIZED (SELECT id,
           |    COALESCE(raw, CAST(0 AS DOUBLE))
           |      / MAX(COALESCE(raw, CAST(0 AS DOUBLE))) OVER () AS hub
           |  FROM nodes LEFT JOIN hr$i ON nodes.id = hr$i.src)""".stripMargin
      s"""${edgeCtes
            .replace("edges AS (", "edges AS MATERIALIZED (")
            .replace("nodes AS (", "nodes AS MATERIALIZED (")},
         |h0 AS (SELECT id, CAST(1 AS DOUBLE) AS hub FROM nodes),
         |${(1 to 3).map(it).mkString(",\n")}
         |SELECT h3.id AS vec_id, h3.hub, a3.auth
         |FROM h3 JOIN a3 ON h3.id = a3.id ORDER BY vec_id""".stripMargin
    },

    // reachability to fixpoint — the Dedup oracle pattern on the k-NN
    // edge set, symmetrized
    "graph_components" ->
      s"""${edgeCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |und AS (SELECT src AS u, dst AS v FROM edges
         |  UNION SELECT dst, src FROM edges),
         |reach(id, root) AS (
         |  SELECT DISTINCT u, u FROM und
         |  UNION
         |  SELECT e.v, r.root FROM reach r JOIN und e ON e.u = r.id)
         |SELECT id AS vec_id, MIN(root) AS label FROM reach
         |GROUP BY id ORDER BY vec_id""".stripMargin,

    // same fixpoint oracle as graph_components — the twin must land on
    // the identical label table
    "graph_components_fast" ->
      s"""${edgeCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |und AS (SELECT src AS u, dst AS v FROM edges
         |  UNION SELECT dst, src FROM edges),
         |reach(id, root) AS (
         |  SELECT DISTINCT u, u FROM und
         |  UNION
         |  SELECT e.v, r.root FROM reach r JOIN und e ON e.u = r.id)
         |SELECT id AS vec_id, MIN(root) AS label FROM reach
         |GROUP BY id ORDER BY vec_id""".stripMargin,

    "graph_triangles" ->
      s"""$edgeCtes,
         |und AS (SELECT DISTINCT least(src, dst) AS u,
         |    greatest(src, dst) AS v
         |  FROM edges WHERE src <> dst),
         |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
         |  FROM und e1 JOIN und e2 ON e1.v = e2.u
         |  WHERE EXISTS (SELECT 1 FROM und e3
         |    WHERE e3.u = e1.u AND e3.v = e2.v)),
         |corners AS (SELECT a AS id FROM tri
         |  UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
         |SELECT id AS vec_id, COUNT(*) AS n_tri FROM corners
         |GROUP BY id ORDER BY vec_id""".stripMargin,

    "graph_clustering_coef" ->
      s"""$edgeCtes,
         |und AS (SELECT DISTINCT least(src, dst) AS u,
         |    greatest(src, dst) AS v
         |  FROM edges WHERE src <> dst),
         |deg AS (SELECT id, COUNT(*) AS deg FROM (
         |    SELECT u AS id FROM und UNION ALL SELECT v FROM und)
         |  GROUP BY id),
         |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
         |  FROM und e1 JOIN und e2 ON e1.v = e2.u
         |  WHERE EXISTS (SELECT 1 FROM und e3
         |    WHERE e3.u = e1.u AND e3.v = e2.v)),
         |ntri AS (SELECT id, COUNT(*) AS n_tri FROM (
         |    SELECT a AS id FROM tri
         |    UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
         |  GROUP BY id)
         |SELECT deg.id AS vec_id, deg.deg,
         |  COALESCE(ntri.n_tri, 0) AS n_tri,
         |  CAST(COALESCE(ntri.n_tri, 0) * 2 AS DOUBLE)
         |    / CAST(deg.deg * (deg.deg - 1) AS DOUBLE) AS coef
         |FROM deg LEFT JOIN ntri ON deg.id = ntri.id
         |WHERE deg.deg >= 2 ORDER BY vec_id""".stripMargin
  )
}
