package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.Graph

/** Volume proof for the graph-centrality family ([[graft.graph.Graph]],
  * SURVEY B9.71/B9.72) — four claims at a million edges:
  *
  *  1. PAGERANK THROUGHPUT: [[Graph.pageRankFast]] (the hub-safe
  *     plain-SUM production form) over the full graph — edges/s/iter.
  *  2. FAST ≡ DETERMINISTIC PARITY: on a subgraph, the production form
  *     agrees with the oracled src-ordered-fold form within float
  *     accumulation noise (≤1e-12 per node).
  *  3. COMPONENTS ARE A THEOREM: the planted graph is 5-cliques
  *     star-linked in groups of 8 → components are exactly 40
  *     consecutive node ids, so every label must equal v − v mod 40 —
  *     an exact check over ALL nodes, not a sampled recall.
  *  4. TRIANGLES ARE A THEOREM: star links between clique minima create
  *     no triangles (no two link endpoints are adjacent), so every node
  *     sits in exactly C(4,2) = 6 triangles — again checked exactly.
  *
  * The graph is a pure function of the node id (clique g owns nodes
  * 5g..5g+4; pair index decodes from a literal table) — nothing is
  * collected to build it.
  *
  * Usage: runMain graft.GraphVolume [nCliques]
  */
object GraphVolume {

  /** (i, j) pairs of the within-clique K5, as two literal lookup
    * tables indexed by pair id 0..9. */
  private val PairI = Seq(0, 0, 0, 0, 1, 1, 1, 2, 2, 3)
  private val PairJ = Seq(1, 2, 3, 4, 2, 3, 4, 3, 4, 4)

  /** nCliques 5-cliques (10 edges each) + a star link from every clique
    * minimum to its group-of-8 leader's minimum. */
  def edges(spark: SparkSession, nCliques: Long): DataFrame = {
    val clique = spark.range(nCliques * 10).select(
      (col("id") / 10).cast("long").as("g"),
      (col("id") % 10).cast("int").as("p"))
      .select(
        (col("g") * 5 +
          element_at(typedLit(PairI), col("p") + 1)).as("src"),
        (col("g") * 5 +
          element_at(typedLit(PairJ), col("p") + 1)).as("dst"))
    val links = spark.range(nCliques)
      .filter(col("id") % 8 =!= 0)
      .select((col("id") * 5).as("src"),
        ((col("id") - col("id") % 8) * 5).as("dst"))
    clique.unionByName(links)
  }

  /** The whole run at a parameterized size — shared with the CI-sized
    * spec gate. Returns the artifact JSON line. */
  def run(spark: SparkSession, nCliques: Long): String = {
    val n = nCliques * 5
    val es = edges(spark, nCliques).localCheckpoint()
    val nEdges = es.count()

    // 1. production PageRank throughput over the full graph
    val PrIters = 5
    val t0 = System.nanoTime()
    val pr = Graph.pageRankFast(es, PrIters).localCheckpoint()
    val nPr = pr.count()
    val prSec = (System.nanoTime() - t0) / 1e9
    require(nPr == n, s"pagerank covered $nPr of $n nodes")

    // 2. fast ≡ deterministic parity on a subgraph
    val subCliques = math.min(nCliques, 2000L)
    val sub = edges(spark, subCliques).localCheckpoint()
    val det = Graph.pageRank(sub, 3).withColumnRenamed("pr", "pr_det")
    val fast = Graph.pageRankFast(sub, 3).withColumnRenamed("pr", "pr_fast")
    val parity = det.join(fast, "id")
      .agg(max(abs(col("pr_det") - col("pr_fast"))).as("d"))
      .head().getDouble(0)

    // 3. components: label must equal v - v % 40, for every node
    val t1 = System.nanoTime()
    val cc = graft.sim.Dedup.connectedComponents(es, "src", "dst")
      .localCheckpoint()
    val ccSec = (System.nanoTime() - t1) / 1e9
    val ccWrong = cc.filter(col("label") =!=
      (col("id") - col("id") % 40)).count()
    val ccNodes = cc.count()

    // 4. triangles: every node in exactly 6
    val t2 = System.nanoTime()
    val tri = Graph.triangles(es).localCheckpoint()
    val triSec = (System.nanoTime() - t2) / 1e9
    val triWrong = tri.filter(col("n_tri") =!= 6L).count()
    val triNodes = tri.count()

    f"""{"metric":"graph_pagerank_edges_per_sec_iter",""" +
    f""""value":${nEdges.toDouble * PrIters / prSec}%.0f,"unit":"edges/s/iter",""" +
    f""""n_nodes":$n,"n_edges":$nEdges,"pr_iters":$PrIters,""" +
    f""""pr_sec":$prSec%.2f,"parity_max_abs_diff":$parity%.3e,""" +
    f""""cc_sec":$ccSec%.2f,"cc_nodes":$ccNodes,"cc_wrong":$ccWrong,""" +
    f""""tri_sec":$triSec%.2f,"tri_nodes":$triNodes,"tri_wrong":$triWrong}"""
  }

  def main(args: Array[String]): Unit = {
    val nCliques = args.headOption.map(_.toLong).getOrElse(100000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val line = run(spark, nCliques)
    println(line)
    Artifacts.write("graph_volume.json", line)
    spark.stop()
    def num(k: String): Double =
      ("\"" + k + "\":([0-9.eE+\\-]+)").r.findFirstMatchIn(line).get
        .group(1).toDouble
    // cc/tri node counts must equal the graph's n — without this the
    // wrong-count checks pass vacuously on an empty result (ADVICE r14)
    if (num("cc_wrong") != 0 || num("tri_wrong") != 0 ||
        num("cc_nodes") != num("n_nodes") ||
        num("tri_nodes") != num("n_nodes") ||
        num("parity_max_abs_diff") > 1e-9) {
      System.err.println("[graphvol] THEOREM CHECK VIOLATED")
      sys.exit(1)
    }
  }
}
