package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** The SQL front end of the engine: queries submitted as ANSI SQL over temp
  * views, exercising Catalyst's subquery machinery — correlated scalar
  * subqueries (RewriteCorrelatedScalarSubquery → left outer join),
  * IN-subqueries (RewritePredicateSubquery → left semi join), and
  * correlated EXISTS. The oracle SQL is the *same* ANSI text, so these
  * also prove the two engines agree on subquery semantics.
  *
  * Averages inside the scalar subquery use the decimal-sum→double÷count
  * pattern (SURVEY §7.5) so the correlated threshold is bit-identical in
  * both engines.
  */
object SqlFrontend {

  private val views = Seq("customer", "orders", "lineitem", "nation",
    "region", "supplier", "part")

  private def sql(s: SparkSession, d: String, query: String): DataFrame = {
    views.foreach(t => Tables(s, d, t).createOrReplaceTempView(t))
    s.sql(query)
  }

  private val scalarCorr =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
      |WHERE o_totalprice > 2 * (
      |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
      |         / COUNT(*)
      |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  private val inSubq =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_nationkey IN (
      |  SELECT s_nationkey FROM supplier
      |  GROUP BY s_nationkey HAVING COUNT(*) >= 5)
      |ORDER BY c_custkey""".stripMargin

  private val existsCorr =
    """SELECT p_partkey, p_name FROM part p
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 50)
      |ORDER BY p_partkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "subq_scalar_corr" -> ((s, d) => sql(s, d, scalarCorr)),
    "subq_in" -> ((s, d) => sql(s, d, inSubq)),
    "subq_exists_corr" -> ((s, d) => sql(s, d, existsCorr))
  )

  /** Same ANSI text — both engines run the identical query. */
  def oracleSql: Map[String, String] = Map(
    "subq_scalar_corr" -> scalarCorr,
    "subq_in" -> inSubq,
    "subq_exists_corr" -> existsCorr
  )
}
