package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftexpr.MaskSpansExpr

import graft.SparkSpec

/** The codegen'd span-mask sweep must be EXACTLY the lambda form it
  * replaced — `filter(toks, (t, i) => !exists(spans, covering))` — or the
  * `text_substring_mask` oracle hash silently shifts. */
class MaskSpansSpec extends SparkSpec {

  private def lambdaForm = {
    val toks = split(col("text"), " ")
    filter(toks, (_, i) =>
      !exists(col("spans"), sp =>
        (i + 1 >= sp.getField("span_start")) &&
          (i + 1 < sp.getField("span_start") + sp.getField("span_len"))))
  }

  test("equals the interpreted lambda form on randomized spans") {
    import spark.implicits._
    // random token lists with random span lists: unsorted, overlapping,
    // out-of-range and zero-length spans all included — the expression
    // must agree with the lambda on every corner, not just the disjoint
    // sorted islands dupSpans produces
    val rng = new scala.util.Random(0xa11d)
    val rows = (1 to 300).map { id =>
      val n = rng.nextInt(12)
      val text = Seq.fill(n)(s"t${rng.nextInt(5)}").mkString(" ")
      val spans = Seq.fill(rng.nextInt(4))(
        (rng.nextInt(14) - 1, rng.nextInt(5)))
      (id, text, spans)
    }
    val df = rows.toDF("id", "text", "raw")
      .withColumn("spans", transform(col("raw"), sp =>
        struct(sp.getField("_1").as("span_start"),
          sp.getField("_2").as("span_len"))))
    val got = df.select(col("id"),
        MaskSpansExpr.column(split(col("text"), " "), col("spans")).as("kept"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    val want = df.select(col("id"), lambdaForm.as("kept"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    rows.foreach { case (id, _, _) =>
      assert(got(id) === want(id), s"row $id") }
    // fixture sanity: some rows actually mask something, some keep all
    assert(rows.exists { case (id, text, _) =>
      text.nonEmpty && got(id).size < text.split(' ').length })
    assert(rows.exists { case (id, text, _) =>
      got(id).mkString(" ") === text })
  }

  test("null arrays propagate; empty spans keep everything") {
    import spark.implicits._
    val df = Seq(
      (1, Option("a b c"), Option(Seq((1, 2)))),
      (2, Option("a b c"), None),
      (3, None: Option[String], Option(Seq((1, 2)))),
      (4, Option("a b c"), Option(Seq.empty[(Int, Int)]))
    ).toDF("id", "text", "raw")
      .withColumn("spans", transform(col("raw"), sp =>
        struct(sp.getField("_1").as("span_start"),
          sp.getField("_2").as("span_len"))))
    val out = df.select(col("id"),
        MaskSpansExpr.column(split(col("text"), " "), col("spans")).as("kept"))
      .collect().map(r => r.getInt(0) ->
        Option(r.get(1)).map(_ => r.getSeq[String](1))).toMap
    assert(out(1) === Some(Seq("c")))
    assert(out(2) === None && out(3) === None)
    assert(out(4) === Some(Seq("a", "b", "c")))
  }

  test("null span elements/fields mirror the lambda's tri-state: keep nothing") {
    import spark.implicits._
    // a null span (or null field) makes the lambda's exists-predicate null
    // for every token it doesn't positively match — !exists is never true,
    // filter keeps nothing. The kernel must return the EMPTY array (not
    // NPE, not treat the null as a 0-length span) on both codegen paths.
    val df = Seq(1, 2, 3).toDF("id")
      .withColumn("text", lit("a b c d"))
      .withColumn("spans", expr(
        """CASE id
          |  WHEN 1 THEN array(named_struct('span_start', 2, 'span_len', 1),
          |                    CAST(NULL AS STRUCT<span_start: INT, span_len: INT>))
          |  WHEN 2 THEN array(named_struct('span_start', CAST(NULL AS INT),
          |                    'span_len', 2))
          |  ELSE array(named_struct('span_start', 1,
          |             'span_len', CAST(NULL AS INT)))
          |END""".stripMargin))
    def run(): Map[Int, (Seq[String], Seq[String])] = df.select(col("id"),
        MaskSpansExpr.column(split(col("text"), " "), col("spans")).as("got"),
        lambdaForm.as("want"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getSeq[String](1), r.getSeq[String](2))))
      .toMap
    val on = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val off = try run()
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    Seq(on, off).foreach { out =>
      (1 to 3).foreach { id =>
        assert(out(id)._1 === out(id)._2, s"row $id diverges from lambda")
        assert(out(id)._1 === Seq.empty, s"row $id")
      }
    }
  }

  test("codegen and interpreted paths agree (whole-stage on, off)") {
    import spark.implicits._
    val df = Seq((1L, "x y z w v", Seq((2, 2), (5, 1))))
      .toDF("id", "text", "raw")
      .withColumn("spans", transform(col("raw"), sp =>
        struct(sp.getField("_1").as("span_start"),
          sp.getField("_2").as("span_len"))))
    def run(): Seq[String] = df.select(
        MaskSpansExpr.column(split(col("text"), " "), col("spans")).as("k"))
      .collect().head.getSeq[String](0)
    val on = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() === on && on === Seq("x", "w"))
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
