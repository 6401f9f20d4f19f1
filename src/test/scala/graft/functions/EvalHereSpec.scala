package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftexpr.EvalHereExpr

import graft.SparkSpec

/** `eval_here` — the evaluation pin (see EvalHereExpr scaladoc). Its value
  * contract is pure identity; its plan contract is "the wrapped projection
  * is never substituted into a moved predicate". Both are pinned here; the
  * fw-specific enforcement (matcher-once counting) lives in ExplainAudit.
  */
class EvalHereSpec extends SparkSpec {
  import spark.implicits._

  test("identity on values and nulls, codegen and interpreted") {
    val df = Seq[(java.lang.Long, String)]((1L, "x"), (2L, null),
      (null, "z")).toDF("a", "b")
    def wrapped = df.select(
      EvalHereExpr.column(col("a") * 2).as("a2"),
      EvalHereExpr.column(upper(col("b"))).as("ub"))
    val plain = df.select((col("a") * 2).as("a2"), upper(col("b")).as("ub"))
      .collect().toSeq
    assert(wrapped.collect().toSeq === plain)

    // interpreted path: Nondeterministic.eval requires initialize() — a
    // wrong initializeInternal surfaces only here, never under codegen
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(wrapped.collect().toSeq === plain)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("blocks filter push-through-Project; unwrapped control pushes") {
    val base = spark.range(100).toDF("id")
    def q(wrap: Boolean) = {
      val c = pow(col("id") + 1, 3)
      base.select(col("id"),
          (if (wrap) EvalHereExpr.column(c) else c).as("y"))
        .where(col("y") > 8.0)
    }
    // control: Catalyst pushes the deterministic projection's filter below,
    // substituting the expression (POWER appears in the Filter's condition)
    val ctl = q(wrap = false).queryExecution.optimizedPlan.toString
    assert(ctl.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("POWER")),
      s"control must show the substituted pushed filter:\n$ctl")
    // pinned: the filter stays above, testing the computed attribute — no
    // second POWER anywhere in a Filter
    val pin = q(wrap = true).queryExecution.optimizedPlan.toString
    assert(!pin.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("POWER")),
      s"pinned projection must not be substituted into the filter:\n$pin")
    assert(q(wrap = true).count() === q(wrap = false).count())
  }
}
