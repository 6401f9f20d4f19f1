package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Embedding evaluation + hard-negative mining (SURVEY B9.45–B9.47,
  * [[Eval]]): every declared query is re-derived by a brute-force driver
  * model (same IEEE fold order, so equality is exact); the metric reducer
  * is proven reusable over the ANN index's batched probe output (the
  * 100 TB path); and the plan keeps the broadcast-probe + WindowGroupLimit
  * shape with no sort-merge join.
  */
class EvalSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // driver-side corpus mirror: (vec_id, label, vector)
  private lazy val all: Seq[(Long, Int, Array[Double])] =
    graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .sortBy(_._1).toSeq

  private def dotL(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
  private def normOf(a: Array[Double]): Double = math.sqrt(dotL(a, a))

  private lazy val probes = all.filter(_._1 % Eval.ProbeMod == 0)
  private lazy val corpus = all.filter(_._1 % Eval.ProbeMod != 0)

  /** Per-probe corpus ranking by (cosine desc, vec_id asc) — the model. */
  private def rankedFor(p: (Long, Int, Array[Double]))
      : Seq[(Long, Int, Double)] = {
    val pn = normOf(p._3)
    corpus.map { case (id, lab, v) =>
      (id, lab, dotL(v, p._3) / (normOf(v) * pn))
    }.sortBy { case (id, _, c) => (-c, id) }
  }

  private def runQuery(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("eval_retrieval matches the brute-force metric model exactly") {
    val per = probes.map { p =>
      val top10 = rankedFor(p).take(10)
      val firstRel = top10.indexWhere(_._2 == p._2) + 1 // 0 = miss
      val relIn10 = top10.count(_._2 == p._2)
      (firstRel, relIn10)
    }
    val nProbes = per.size.toLong
    val nHit = per.count(_._1 > 0).toLong
    val rrScaled = per.filter(_._1 > 0).map(x => 2520L / x._1).sum
    val nRel = per.map(_._2.toLong).sum

    val row = runQuery("eval_retrieval").collect()(0)
    assert(row.getAs[Long]("n_probes") === nProbes)
    assert(row.getAs[Long]("n_hit") === nHit)
    assert(row.getAs[Long]("rr_scaled") === rrScaled)
    assert(row.getAs[Long]("n_rel_top10") === nRel)
    assert(row.getAs[Double]("mrr") === rrScaled / (2520.0 * nProbes))
    assert(row.getAs[Double]("precision_at_10") === nRel / (10.0 * nProbes))
    // non-vacuity: the labeled fixture must make the metric informative
    assert(nProbes > 0 && nHit > 0)
  }

  test("eval_ndcg matches the brute-force nDCG model exactly") {
    val model = probes.map { p =>
      val r = rankedFor(p)
      val nRel = r.count(_._2 == p._2).toLong
      // the SAME fold order as the query: gains in rank order from 0.0
      var dcg = 0.0
      r.take(10).zipWithIndex.foreach { case ((_, lab, _), i) =>
        if (lab == p._2) dcg += Eval.ndcgGains(i)
      }
      val idcg = Eval.idcgTable(math.min(nRel, 10L).toInt)
      val ndcg = if (idcg > 0.0) dcg / idcg else 0.0
      (p._1, nRel, dcg, ndcg)
    }.sortBy(_._1)

    val got = runQuery("eval_ndcg").collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("n_rel"),
        r.getAs[Double]("dcg"), r.getAs[Double]("ndcg"))).toSeq
    assert(got === model)
    // non-vacuity: the metric must separate probes (not all 0 or all 1)
    assert(got.map(_._4).distinct.size > 1)
    assert(got.forall(x => x._4 >= 0.0 && x._4 <= 1.0))
  }

  test("eval_knn_accuracy matches the brute-force majority-vote model") {
    val model = probes.map { p =>
      val top5 = rankedFor(p).take(5)
      val votes = top5.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val (pred, v) = votes.toSeq.minBy { case (lab, n) => (-n, lab) }
      (p._1, p._2, pred, v, if (pred == p._2) 1 else 0)
    }
    val got = runQuery("eval_knn_accuracy").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getInt(4))).toSeq
    assert(got === model)
    // both correct and incorrect predictions present (informative fixture)
    assert(model.map(_._5).toSet === Set(0, 1))
  }

  test("mine_hard_negatives matches the brute-force triple model") {
    val model = probes.flatMap { p =>
      val r = rankedFor(p)
      r.find(_._2 == p._2).toSeq.flatMap { pos =>
        r.filter(_._2 != p._2).take(3).zipWithIndex.map {
          case ((nid, _, nc), i) =>
            (p._1, pos._1, pos._3, nid, nc, i + 1)
        }
      }
    }
    val got = runQuery("mine_hard_negatives").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getInt(5))).toSeq
    assert(got === model)
    assert(model.nonEmpty)
    // a hard negative is hard: some negative outscores the positive
    // somewhere in the fixture (the reason the op exists)
    assert(model.exists { case (_, _, pc, _, nc, _) => nc > pc })
  }

  test("the metric reducer runs unchanged over the ANN index's batched " +
      "probe output — the 100 TB serving path") {
    // unit-normalize (the PqSpec posture): ADC ranks by dot, cosine is
    // scale-invariant, so normalized-dot and raw-cosine grade the same
    // ground truth
    val v = col("embedding").cast("array<double>")
    val norm = sqrt(VectorMath.dot(v, v))
    val normed = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        transform(v, x => x / norm).as("embedding"))
      .localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_eval_pq").toString
    Pq.writeIndex(normed.filter(col("vec_id") % Eval.ProbeMod =!= 0),
      dir, mSub = 8, k = 16, nCentroids = 16)

    val probesDf = normed.filter(col("vec_id") % Eval.ProbeMod === 0)
    val labels = normed.select(col("vec_id"), col("label"))
    val annTop10 = Pq.probeIndexTopKBatch(spark, dir,
        probesDf.select("vec_id", "embedding"), k = 10, nprobe = 4)
      .join(labels, "vec_id")
      .join(broadcast(labels.select(col("vec_id").as("probe_id"),
        col("label").as("probe_label"))), "probe_id")

    val ann = Eval.retrievalMetrics(annTop10).collect()(0)
    val exact = runQuery("eval_retrieval").collect()(0)
    assert(ann.schema.fieldNames === exact.schema.fieldNames)
    assert(ann.getAs[Long]("n_probes") === exact.getAs[Long]("n_probes"))
    // the coarse-quantized shortlist still finds relevant neighbors for
    // most probes (measured ~parity with exact on this fixture; the gate
    // guards collapse, not the measured value)
    assert(ann.getAs[Long]("n_hit") >= exact.getAs[Long]("n_hit") / 2)
    assert(ann.getAs[Double]("mrr") > 0.0)
    assert(ann.getAs[Double]("precision_at_10") <= 1.0)
  }

  test("plan shape: broadcast probe fan-out + WindowGroupLimit, no " +
      "sort-merge join") {
    val plan = runQuery("eval_retrieval")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "probe set must ride a broadcast")
    assert(plan.contains("WindowGroupLimit"),
      "rank<=k must prune map-side before the probe exchange")
    assert(!plan.contains("SortMergeJoin"),
      "nothing in the eval plan should shuffle-sort a join")
  }
}
