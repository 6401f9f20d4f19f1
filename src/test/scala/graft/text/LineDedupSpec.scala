package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Line-level corpus dedup (CCNet boilerplate removal): drop lines seen in
  * ≥ minDf distinct docs, keep every other line in original order. The
  * declared `text_line_dedup`/`text_boilerplate` queries hash-match DuckDB
  * on the derived-line corpus; this spec owns the operator CONTRACT on a
  * corpus with real newlines — planted boilerplate, order preservation,
  * the all-lines-dropped edge, and the minDf knob.
  */
class LineDedupSpec extends SparkSpec {
  import TextOps.{boilerplateLines, lineDedup}

  // a real multi-line corpus: "footer" in 4 docs, "nav bar" in 3,
  // "twice" in only 2 (must survive at minDf=3); every u<i> line unique
  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, "u0 a\nfooter\nu0 b"),
      (1L, "footer\nnav bar\nu1 a"),
      (2L, "u2 a\ntwice\nnav bar\nfooter"),
      (3L, "nav bar\nfooter"),            // all lines boilerplate
      (4L, "u4 a\ntwice\nu4 b"),
      (5L, "u5 only")
    ).toDF("doc_id", "text")
  }

  test("boilerplate = exactly the lines in >= minDf distinct docs") {
    val bp = boilerplateLines(corpus, minDf = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(bp.keySet === Set("footer", "nav bar"))
    assert(bp("footer") === ((4L, 4L)))
    assert(bp("nav bar") === ((3L, 3L)))
  }

  test("cleaned docs: boilerplate dropped, order kept, empties accounted") {
    val out = lineDedup(corpus, minDf = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(0L) === ((3L, 2L, "u0 a u0 b")))
    assert(out(1L) === ((3L, 1L, "u1 a")))
    assert(out(2L) === ((4L, 2L, "u2 a twice")))  // order preserved
    assert(out(3L) === ((2L, 0L, "")))            // fully-boilerplate doc stays on the ledger
    assert(out(4L) === ((3L, 3L, "u4 a twice u4 b")))
    assert(out(5L) === ((1L, 1L, "u5 only")))
    assert(out.size === 6)
  }

  test("minDf above any df keeps everything verbatim") {
    val out = lineDedup(corpus, minDf = 99)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val want = corpus.collect()
      .map(r => r.getLong(0) -> r.getString(1).split('\n').mkString(" "))
      .toMap
    assert(out === want)
  }

  test("matches a reference implementation on a randomized corpus") {
    import spark.implicits._
    val rng = new scala.util.Random(0x11de)
    // hot pool repeats across docs (df ≫ minDf), cold pool mostly stays
    // under it — both sides of the threshold are populated by design
    val hot = (0 until 20).map(i => s"hot $i")
    val cold = (0 until 500).map(i => s"cold $i")
    val docs = (0L until 120L).map { id =>
      val n = 1 + rng.nextInt(6)
      (id, Seq.fill(n)(
        if (rng.nextBoolean()) hot(rng.nextInt(hot.size))
        else cold(rng.nextInt(cold.size))).mkString("\n"))
    }
    val minDf = 4
    val df = docs.toDF("doc_id", "text")
    // reference: df counts DISTINCT docs (a line twice in one doc counts once)
    val dfCount = docs.flatMap { case (id, t) => t.split('\n').distinct.map(_ -> id) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.size }
    val bpRef = dfCount.filter(_._2 >= minDf).keySet
    val wantClean = docs.map { case (id, t) =>
      id -> t.split('\n').filterNot(bpRef).mkString(" ") }.toMap
    val got = lineDedup(df, minDf = minDf)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got === wantClean)
    val gotBp = boilerplateLines(df, minDf = minDf)
      .collect().map(_.getString(0)).toSet
    assert(gotBp === bpRef)
    // non-vacuity: the random draw produced both dropped and kept lines
    assert(bpRef.nonEmpty && bpRef.size < dfCount.size)
  }

  test("Bloom-prefiltered cleaning ≡ the broadcast form — fixture, " +
      "randomized corpus, saturated filter, and with broadcast joins " +
      "disabled entirely (the beyond-broadcast contract)") {
    import spark.implicits._
    type R = (Long, Long, Long, String)
    def rows(df: org.apache.spark.sql.DataFrame): Set[R] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    def check(docs: org.apache.spark.sql.DataFrame, minDf: Int): Unit = {
      val bp = boilerplateLines(docs, minDf)
      val want = rows(TextOps.cleanAgainstBoilerplate(docs, bp))
      assert(rows(TextOps.cleanAgainstBoilerplateBloom(docs, bp)) === want)
      // saturated filter: 16 bits ⇒ nearly every line is a candidate —
      // the exact semi-join must carry correctness alone
      assert(rows(TextOps.cleanAgainstBoilerplateBloom(docs, bp,
        numBits = 16L)) === want)
    }
    check(corpus, 3)
    check(corpus, 99) // empty boilerplate set: bloom over zero items
    val rng = new scala.util.Random(0xb100)
    val hot = (0 until 15).map(i => s"hot $i")
    val cold = (0 until 300).map(i => s"cold $i")
    val rand = (0L until 90L).map { id =>
      (id, Seq.fill(1 + rng.nextInt(5))(
        if (rng.nextBoolean()) hot(rng.nextInt(hot.size))
        else cold(rng.nextInt(cold.size))).mkString("\n"))
    }.toDF("doc_id", "text")
    check(rand, 4)

    // the contract that motivates the variant: with broadcast joins
    // fully unavailable the operator still runs and still agrees — no
    // node of the plan materializes the membership set on the driver
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thr)
    spark.conf.set(thr, "-1")
    try {
      val bp = boilerplateLines(corpus, 3)
      val q = TextOps.cleanAgainstBoilerplateBloom(corpus, bp)
      assert(rows(q) ===
        rows(TextOps.cleanAgainstBoilerplate(corpus, bp)))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"map-side Bloom kill must be in the plan:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"beyond-broadcast path must not broadcast anything:\n$plan")
    } finally spark.conf.set(thr, prev)
  }

  test("streaming twin: per-batch cleaning equals the batch body, and a " +
      "republished boilerplate set takes effect at the next batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("bp_set").toString
    // v1 set: only "footer" is boilerplate
    Seq("footer").toDF("line").write.mode("overwrite").parquet(dir)
    def clean(rows: Seq[(Long, String)], bp: Seq[String]) =
      TextOps.cleanAgainstBoilerplate(rows.toDF("doc_id", "text"),
          bp.toDF("line"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
    val b1 = Seq((10L, "u a\nfooter\nu b"), (11L, "footer"))
    val b2 = Seq((12L, "u c\nfooter\nnav bar"))
    val sunk = scala.collection.mutable
      .ArrayBuffer[Set[(Long, Long, Long, String)]]()
    val stream = MemoryStream[(Long, String)](97, spark, None)
    val q = graft.stream.Streaming.streamLineClean(
        stream.toDF().toDF("doc_id", "text"), dir,
        (df, _) => sunk += df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getString(3))).toSet)
      .start()
    stream.addData(b1); q.processAllAvailable()
    // republish: the freshly-mined set adds "nav bar"
    Seq("footer", "nav bar").toDF("line").write.mode("overwrite").parquet(dir)
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    assert(sunk.size === 2)
    assert(sunk(0) === clean(b1, Seq("footer")))
    assert(sunk(1) === clean(b2, Seq("footer", "nav bar")))
    // the republish actually mattered for batch 2
    assert(sunk(1) !== clean(b2, Seq("footer")))
  }
}
