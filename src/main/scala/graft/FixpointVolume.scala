package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.Dedup

/** Scale evidence for the fixpoint loops (VERDICT r16 "next round" #9):
  * at sf0.1 the dedup/curation component loops are orchestration-bound
  * (c8/c32 ≈ 1), so the local bench cannot show what the adaptive
  * pointer-jump gate buys or costs. This volume plants two graph shapes
  * at half a million nodes each and measures the SAME production loop
  * body ([[Dedup.connectedComponentsWithStats]]) under all three jump
  * gates, recording rounds, jump rounds, seconds and SHUFFLE BYTES
  * (task-metric totals via a listener):
  *
  *  - CLIQUES (the dedup-family shape, diameter 1): the adaptive gate
  *    must never jump — same rounds and bytes as the jump-free loop —
  *    while the r16 `round >= 3` gate pays the |V| label self-join on
  *    the convergence-detection round (the measured r16 regression,
  *    here visible as extra shuffle bytes at any scale).
  *  - CHAINS (long diameter): one-hop needs ~length rounds (measured on
  *    the 64-chain); the jump collapses that to O(log length) — on the
  *    4096-chain the jump-free loop would need ~4096 rounds ≈ hours, so
  *    only the two jumping gates and [[Dedup.componentsFast]] run there.
  *
  * Labels are checked EXACTLY against the planted theorem for every run
  * (clique component = id − id%5; chain component = its head id).
  *
  * Usage: runMain graft.FixpointVolume [nNodesPerGraph]
  */
object FixpointVolume {

  /** Star-linked 5-cliques ([[GraphVolume.edges]] — groups of 8 cliques
    * share a leader): component(v) = v − v%40, and min-label needs 3
    * one-hop rounds + the detection round, exactly the depth where the
    * r16 `round >= 3` gate started paying the jump on the REAL dedup
    * graphs (pure disjoint cliques converge at round 1 and never expose
    * the gate difference — measured here first). */
  def cliqueEdges(spark: SparkSession, n: Long): DataFrame =
    GraphVolume.edges(spark, n / 5)

  /** n/len chains of `len` nodes: component(v) = v − v%len. */
  def chainEdges(spark: SparkSession, n: Long, len: Long): DataFrame =
    spark.range(n).filter(col("id") % len =!= (len - 1))
      .select(col("id").as("src"), (col("id") + 1).as("dst"))

  private final class ShuffleTally extends SparkListener {
    val read = new AtomicLong
    val written = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
  }

  final case class Run(tag: String, rounds: Int, jumps: Int, sec: Double,
      shuffleMb: Double, wrong: Long) {
    def json: String =
      f""""$tag":{"rounds":$rounds,"jumps":$jumps,"sec":$sec%.2f,""" +
      f""""shuffle_mb":$shuffleMb%.1f,"wrong":$wrong}"""
  }

  /** Run one components variant, tally shuffle bytes over exactly its
    * jobs, and check every label against the planted `mod`-block rule. */
  private def measure(spark: SparkSession, tag: String, edges: DataFrame,
      mod: Long, body: DataFrame => (DataFrame, Int, Int)): Run = {
    val es = edges.localCheckpoint() // build the graph OUTSIDE the tally
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    val t0 = System.nanoTime()
    val (labels, rounds, jumps) = body(es)
    val pinned = labels.localCheckpoint()
    val n = pinned.count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(600) // let the listener bus drain the last task events
    spark.sparkContext.removeSparkListener(tally)
    val wrong = pinned.filter(col("label") =!=
      (col("id") - col("id") % mod)).count()
    require(n > 0, s"$tag produced no labels")
    Run(tag, rounds, jumps, sec,
      (tally.read.get() + tally.written.get()) / 1e6, wrong)
  }

  def run(spark: SparkSession, n: Long): String = {
    def gated(mode: Int)(es: DataFrame): (DataFrame, Int, Int) = {
      val (l, st) = Dedup.connectedComponentsWithStats(es, "src", "dst", mode)
      (l, st.rounds, st.jumps)
    }
    def fast(es: DataFrame): (DataFrame, Int, Int) = {
      val (l, r) = Dedup.componentsFastWithRounds(es, "src", "dst")
      (l, r, 0)
    }

    val cliq = cliqueEdges(spark, n)
    // 4-node paths: the MINIMAL r16-regression shape. Changed counts
    // halve exactly (2k → k → 0), so convergence is DETECTED at round 3
    // — where the r16 `round >= 3` gate pays the |V| label self-join on
    // a graph that never needed it, while the adaptive stall test
    // (changed·2 > prev fails at equality) stays one-hop. This is the
    // dedup-family regression VERDICT r16 measured, reproduced at half a
    // million nodes with its shuffle bytes on the ledger.
    val p4 = chainEdges(spark, n, 4)
    val c64 = chainEdges(spark, n, 64)
    val c4k = chainEdges(spark, n, 4096)
    // JIT/codegen warmup outside every tally window, so the first
    // measured run does not carry cold-compile seconds (the bytes and
    // round counts are load-independent either way)
    Dedup.connectedComponents(cliqueEdges(spark, 4000), "src", "dst")
      .write.format("noop").mode("overwrite").save()
    val runs = Seq(
      measure(spark, "cliques_never", cliq, 40, gated(Dedup.JumpNever)),
      measure(spark, "cliques_r16", cliq, 40, gated(Dedup.JumpFromRound3)),
      measure(spark, "cliques_adaptive", cliq, 40,
        gated(Dedup.JumpAdaptive)),
      measure(spark, "cliques_fast", cliq, 40, fast),
      measure(spark, "path4_never", p4, 4, gated(Dedup.JumpNever)),
      measure(spark, "path4_r16", p4, 4, gated(Dedup.JumpFromRound3)),
      measure(spark, "path4_adaptive", p4, 4, gated(Dedup.JumpAdaptive)),
      measure(spark, "chain64_never", c64, 64, gated(Dedup.JumpNever)),
      measure(spark, "chain64_r16", c64, 64, gated(Dedup.JumpFromRound3)),
      measure(spark, "chain64_adaptive", c64, 64, gated(Dedup.JumpAdaptive)),
      measure(spark, "chain64_fast", c64, 64, fast),
      measure(spark, "chain4096_r16", c4k, 4096, gated(Dedup.JumpFromRound3)),
      measure(spark, "chain4096_adaptive", c4k, 4096,
        gated(Dedup.JumpAdaptive)),
      measure(spark, "chain4096_fast", c4k, 4096, fast))
    runs.foreach(r => println(s"[fixpointvol] ${r.json}"))

    val by = runs.map(r => r.tag -> r).toMap
    // the volume's gates — each one is a claim OPTIMIZATION_r17 makes:
    require(runs.forall(_.wrong == 0), "planted labels violated")
    // 1. adaptive never jumps on short-diameter graphs and matches the
    //    jump-free loop's rounds AND bytes (the r16 regression is gone)
    for (g <- Seq("cliques", "path4")) {
      require(by(s"${g}_adaptive").jumps == 0 &&
        by(s"${g}_adaptive").rounds == by(s"${g}_never").rounds,
        s"adaptive gate paid the jump on the short-diameter $g graph")
    }
    // 2. the r16 gate DID pay it on the detection round (the
    //    before-evidence: extra jump rounds and extra shuffle bytes on a
    //    graph whose one-hop rounds were already done)
    require(by("path4_r16").jumps > 0 &&
      by("path4_r16").shuffleMb > 1.1 * by("path4_adaptive").shuffleMb,
      "r16 gate detection-round cost no longer reproduces")
    // 3. on the long chain the adaptive jump collapses ~4096 one-hop
    //    rounds to O(log): anything under 40 is a >100x round win
    require(by("chain4096_adaptive").rounds <= 40,
      "adaptive jump failed to collapse the long-diameter round count")
    // 4. the 64-chain shows the crossover measurably: jump-free needs
    //    ~64 rounds, the jumping gates far fewer
    require(by("chain64_never").rounds > 2 * by("chain64_adaptive").rounds,
      "64-chain round counts did not diverge")

    s"""{"metric":"fixpoint_rounds","unit":"rounds","n_nodes":$n,""" +
      s""""runs":{${runs.map(_.json).mkString(",")}}}"""
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(524288L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val line = run(spark, n)
    println(line)
    Artifacts.write("fixpoint_volume.json", line)
    spark.stop()
  }
}
