package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Volume proof for the exact edit-distance join: runs
  * [[Similarity.editDistancePairsDeletions]] on TPC-H-shaped customer names
  * at the sf0.1 size and at 10× it, and reports wall time, answer size, and
  * candidate size per scale. The two claims this measures:
  *
  *  - correctness of the generator: at n=15,000 the answer must equal the
  *    262,500 pairs measured on the real sf0.1 customer.parquet (c_name is
  *    exactly `Customer#%09d` of c_custkey 0..14999), so the 10× point
  *    extends the same corpus, not a lookalike;
  *  - the scale law: candidates/answer stays bounded as n grows 10×
  *    (deletion-signature buckets only collide for near-copies), so the
  *    join's cost is driven by the answer the user asked for — the
  *    output-optimal shape for an exact join — not by C(n,2), which grows
  *    100×.
  *
  * Usage: runMain graft.EditJoinBench [n1] [n2]
  */
object EditJoinBench {
  def main(args: Array[String]): Unit = {
    val n1 = args.headOption.map(_.toInt).getOrElse(15000)
    val n2 = args.lift(1).map(_.toInt).getOrElse(150000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm codegen + shuffle machinery so the n1 point isn't startup-skewed
    spark.range(1000000).selectExpr("sum(id)").collect()

    val points = Seq(n1, n2).map { n =>
      val names = spark.range(0, n).select(col("id").as("key"),
        format_string("Customer#%09d", col("id")).as("name"))
      val t0 = System.nanoTime()
      val answer = Similarity
        .editDistancePairsDeletions(names, "key", "name", 1).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val cand = Similarity
        .editDistanceDeletionCandidates(names, "key", "name", 1).count()
      println(f"[editjoin] n=$n%d answer=$answer%d candidates=$cand%d " +
        f"ratio=${cand.toDouble / answer}%.2f sec=$sec%.2f")
      (n, answer, cand, sec)
    }
    val json = points.map { case (n, a, c, s) =>
      f"""{"n":$n,"answer":$a,"candidates":$c,"sec":$s%.2f}"""
    }.mkString("[", ",", "]")
    val line = s"""{"metric":"editjoin_scale","points":$json}"""
    println(line)
    Artifacts.write("editjoin_bench.json", line)
    spark.stop()
  }
}
