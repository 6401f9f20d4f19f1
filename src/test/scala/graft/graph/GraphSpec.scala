package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // 1→2, 2→1, 2→3, 3→1 — outdegs 1/2/1, no dangling nodes
  private def tinyEdges = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
  }

  /** Driver replay with the same fold order (in-neighbors ascending) and
    * the same per-node teleport ADDEND expression as the engine —
    * `tele(v)` must be computed by the caller with the engine's exact
    * IEEE tree ((1-d)/n for uniform, (1-d)·t(v) for personalized; the
    * two differ in the last ulp). */
  private def replay(edges: Seq[(Long, Long)], iters: Int, d: Double,
      r0: Map[Long, Double], tele: Map[Long, Double]): Map[Long, Double] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = r0
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).view.mapValues { es =>
        var acc = 0.0
        es.sortBy(_._1).foreach { case (u, _) => acc += r(u) / out(u) }
        acc
      }.toMap
      r = r0.keys.map { v =>
        v -> (tele(v) + d * inflow.getOrElse(v, 0.0))
      }.toMap
    }
    r
  }

  test("pageRank ≡ a driver replay bit-for-bit; mass conserved on a " +
      "dangling-free graph") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L))
    val n = 3
    val r0 = (1L to 3L).map(_ -> 1.0 / n).toMap
    val tele = (1L to 3L).map(_ -> (1.0 - 0.85) / n).toMap
    val want = replay(edges, 3, 0.85, r0, tele)
    val got = Graph.pageRank(tinyEdges, 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === want)
    assert(math.abs(got.values.sum - 1.0) < 1e-12,
      "every node has out-edges, so no mass leaks")
    // node 1 receives from both 2 and 3 — it must outrank 3 (one weak
    // in-edge from the shared-out node 2)
    assert(got(1L) > got(3L))
  }

  test("pageRankFast agrees with the oracled form within accumulation " +
      "noise and ranks identically") {
    val det = Graph.pageRank(tinyEdges, 7).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fast = Graph.pageRankFast(tinyEdges, 7).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(det.keySet === fast.keySet)
    det.foreach { case (k, v) =>
      assert(math.abs(fast(k) - v) < 1e-12, s"node $k drifted") }
    assert(det.toSeq.sortBy(-_._2).map(_._1) ===
      fast.toSeq.sortBy(-_._2).map(_._1))
  }

  test("personalized PageRank: converged mass decays with distance from " +
      "the seed; unreachable components receive nothing; ≡ driver replay") {
    import spark.implicits._
    // cycle 1→2→3→4→1 (stationary PPR decays as d^distance along it)
    // plus an isolated pair 5⇄6, unreachable from the seed
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (5L, 6L),
      (6L, 5L))
    val seeds = Seq(1L).toDF("id")
    val got = Graph.personalizedPageRank(es.toDF("src", "dst"), seeds, 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(2L) && got(2L) > got(3L) && got(3L) > got(4L),
      s"diffusion must decay with distance: $got")
    assert(got(5L) === 0.0 && got(6L) === 0.0,
      "unreachable components receive nothing")
    // and ≡ the driver replay with the seed teleport
    val t = (1L to 6L).map(v => v -> (if (v == 1L) 1.0 else 0.0)).toMap
    val tele = t.map { case (v, tv) => v -> (1.0 - 0.85) * tv }
    assert(got === replay(es, 20, 0.85, t, tele))
  }

  test("weighted pageRank ≡ a driver replay bit-for-bit; weights steer " +
      "mass where the unweighted walk splits it evenly") {
    import spark.implicits._
    // 1 splits 9:1 between 2 and 3; both return everything to 1
    val es = Seq((1L, 2L, 9.0), (1L, 3L, 1.0), (2L, 1L, 1.0),
      (3L, 1L, 1.0))
    val got = Graph.pageRankWeighted(es.toDF("src", "dst", "w"), 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // driver replay: same fold orders (outflow in dst order, inflow in
    // src order), same IEEE trees
    val outW = es.groupBy(_._1).view.mapValues { xs =>
      var acc = 0.0; xs.sortBy(_._2).foreach(acc += _._3); acc }.toMap
    val n = 3
    var r = (1L to 3L).map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val inflow = es.groupBy(_._2).view.mapValues { xs =>
        var acc = 0.0
        xs.sortBy(_._1).foreach { case (u, _, w) => acc += r(u) * w / outW(u) }
        acc
      }.toMap
      r = (1L to 3L).map { v =>
        v -> ((1.0 - 0.85) / n + 0.85 * inflow.getOrElse(v, 0.0))
      }.toMap
    }
    assert(got === r)
    assert(got(2L) > got(3L), "the heavy edge must carry more mass")
    // non-vacuity: the unweighted walk ties 2 and 3 exactly
    val un = Graph.pageRank(
        es.map(e => (e._1, e._2)).toDF("src", "dst"), 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(un(2L) === un(3L))
  }

  test("reduction theorem: weighted pageRank at w = 1 equals the " +
      "uniform walk bit-for-bit") {
    import spark.implicits._
    // r·1.0/Σ1.0 and r/outdeg are the same IEEE division when the
    // outflow fold of small integers is exact — equal weights MUST
    // reduce to the uniform walk exactly, not approximately
    val es = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 2L))
    val uni = Graph.pageRank(es.toDF("src", "dst"), 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w1 = Graph.pageRankWeighted(
        es.map(e => (e._1, e._2, 1.0)).toDF("src", "dst", "w"), 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w1 === uni)
  }

  test("HITS ≡ a driver replay bit-for-bit; the star center takes " +
      "authority 1.0 and the spokes are the unit hubs") {
    import spark.implicits._
    val es = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 1L))
    val got = Graph.hits(es.toDF("src", "dst"), 3).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap

    // driver replay: same fold orders, same L∞ normalization
    val nodes = (1L to 4L)
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      val araw = nodes.map { v =>
        var acc = 0.0
        es.filter(_._2 == v).sortBy(_._1).foreach(e => acc += hub(e._1))
        v -> acc
      }.toMap
      val amax = araw.values.max
      auth = araw.view.mapValues(_ / amax).toMap
      val hraw = nodes.map { u =>
        var acc = 0.0
        es.filter(_._1 == u).sortBy(_._2).foreach(e => acc += auth(e._2))
        u -> acc
      }.toMap
      val hmax = hraw.values.max
      hub = hraw.view.mapValues(_ / hmax).toMap
    }
    assert(got === nodes.map(v => v -> ((hub(v), auth(v)))).toMap)
    assert(got(4L)._2 === 1.0, "the star center is THE authority")
    assert(Seq(1L, 2L, 3L).forall(got(_)._1 === 1.0),
      "the spokes are the unit hubs")
    assert(got(4L)._1 < 1.0 && got(1L)._2 < 1.0)
  }

  test("hitsFast agrees with the oracled hits within accumulation noise " +
      "and ranks identically; deep runs keep a constant-size plan") {
    import spark.implicits._
    // the star fixture plus a second cluster so raw sums have real
    // accumulation work: 5,6,7 -> 8, 8 -> 5, cross-link 4 -> 8
    val es = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 1L), (5L, 8L),
      (6L, 8L), (7L, 8L), (8L, 5L), (4L, 8L)).toDF("src", "dst")
    def toMapHA(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val det = toMapHA(Graph.hits(es, 3))
    val fast = toMapHA(Graph.hitsFast(es, 3))
    assert(det.keySet === fast.keySet)
    det.foreach { case (k, (h, a)) =>
      assert(math.abs(fast(k)._1 - h) < 1e-12, s"hub drifted at $k")
      assert(math.abs(fast(k)._2 - a) < 1e-12, s"auth drifted at $k")
    }
    assert(det.toSeq.sortBy { case (k, (h, _)) => (-h, k) }.map(_._1) ===
      fast.toSeq.sortBy { case (k, (h, _)) => (-h, k) }.map(_._1))
    assert(det.toSeq.sortBy { case (k, (_, a)) => (-a, k) }.map(_._1) ===
      fast.toSeq.sortBy { case (k, (_, a)) => (-a, k) }.map(_._1))

    // the r14 watch-item closed: per-half-iteration checkpoints keep the
    // logical plan CONSTANT-size in the iteration count (pre-fix it
    // doubled per normalization), so a 20-iteration run is safe
    def planSize(iters: Int) =
      Graph.hits(es, iters).queryExecution.logical
        .collect { case p => p }.size
    assert(planSize(6) === planSize(2),
      "hits plan must not grow with iteration count")
    val deep = toMapHA(Graph.hits(es, 20))
    // at convergence node 8 (4 in-edges) out-authorities node 4 (3)
    assert(deep(8L)._2 === 1.0, "the max-in-degree hub converges to " +
      "authority 1 under L-inf normalization")
    val deepFast = toMapHA(Graph.hitsFast(es, 20))
    assert(deep.keySet === deepFast.keySet)
    deep.foreach { case (k, (h, a)) =>
      assert(math.abs(deepFast(k)._1 - h) < 1e-9 &&
        math.abs(deepFast(k)._2 - a) < 1e-9, s"deep drift at $k")
    }
  }

  test("triangles: exact per-node counts on a known graph — shared " +
      "edges credit all member triangles, bridges credit none") {
    import spark.implicits._
    // two triangles sharing edge (2,3): {1,2,3} and {2,3,4};
    // a pendant edge 4→5 and a directed duplicate 3→2 (must canonicalize)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (3L, 4L),
      (3L, 2L), (4L, 5L)).toDF("src", "dst")
    val got = Graph.triangles(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L),
      s"got $got")
  }

  test("components: reused Dedup propagation labels the k-NN graph; " +
      "a two-component fixture separates") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val got = graft.sim.Dedup.connectedComponents(edges, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
      11L -> 10L))
  }

  test("componentsFast ≡ connectedComponents on the DECLARED k-NN " +
      "graph — the graph_components key's input, label for label") {
    val edges = Graph.knnEdges(spark, sfDir)
    def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val slow = labels(
      graft.sim.Dedup.connectedComponents(edges, "src", "dst"))
    val fast = labels(graft.sim.Dedup.componentsFast(edges, "src", "dst"))
    assert(fast === slow)
    assert(slow.nonEmpty)
  }

  test("clustering coefficient: exact fractions on a known graph, " +
      "degree-1 nodes excluded, triangle-free nodes at 0") {
    import spark.implicits._
    // triangle {1,2,3} + pendant 3→4 + a path node 5—6—7 (no triangles)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 6L),
      (6L, 7L)).toDF("src", "dst")
    val got = Graph.clusteringCoef(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got(1L) === ((2L, 1L, 1.0)))
    assert(got(2L) === ((2L, 1L, 1.0)))
    assert(got(3L) === ((3L, 1L, 2.0 / 6.0)))
    assert(got(6L) === ((2L, 0L, 0.0)), "triangle-free hub scores 0")
    assert(!got.contains(4L) && !got.contains(5L) && !got.contains(7L),
      "degree-1 nodes have no defined coefficient")
  }

  test("declared keys run non-trivially on the testdata graph") {
    val pr = Graph.queries("graph_pagerank")(spark, sfDir)
    val rows = pr.collect()
    assert(rows.length > 0)
    val prs = rows.map(_.getDouble(1))
    assert(prs.distinct.length > 1, "centrality must separate nodes")
    assert(math.abs(prs.sum - 1.0) < 1e-9,
      "k-NN graph is dangling-free: mass conserved")
    val ppr = Graph.queries("graph_ppr")(spark, sfDir).collect()
    assert(ppr.map(_.getDouble(1)).count(_ > 0) > 0)
  }
}
