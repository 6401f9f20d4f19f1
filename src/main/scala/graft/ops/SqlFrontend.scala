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
    "region", "supplier", "part", "events")

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

  /** Staged conversion funnel (view → click within 1h → purchase within
    * 1h), the product-analytics staple: each stage is a min-timestamp
    * aggregation joined forward with a time-bounded condition, so the whole
    * funnel is joins + group-bys — no per-user sequence scan. MIN(ts) picks
    * source values verbatim (no arithmetic to diverge); the INTERVAL bound
    * is exact timestamp addition in both engines. */
  private val funnel =
    """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e
      |  JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t_view
      |    AND e.ts <= v.t_view + INTERVAL 1 HOUR GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(e.ts) AS t_buy FROM events e
      |  JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      |    AND e.ts <= c.t_click + INTERVAL 1 HOUR GROUP BY e.user_id)
      |SELECT (SELECT COUNT(*) FROM v) AS n_view,
      |       (SELECT COUNT(*) FROM c) AS n_view_click,
      |       (SELECT COUNT(*) FROM p) AS n_full_funnel""".stripMargin

  /** Value-based time frame: trailing-1-hour event count per user. RANGE
    * on a timestamp ORDER BY with an INTERVAL bound — frame membership
    * depends only on values, so ts ties are harmless; the output ORDER BY
    * still carries the event_id tiebreaker for row order. */
  private val winRangeTime =
    """SELECT user_id, event_id, ts,
      |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
      |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      |    AS n_last_hour
      |FROM events ORDER BY user_id, ts, event_id""".stripMargin

  /** Correlated LATERAL derived table (B3.11): per-nation top-2 customers
    * by balance. Catalyst plans the correlated ORDER BY+LIMIT subquery via
    * its lateral-join machinery (DecorrelateInnerQuery); DuckDB runs the
    * identical ANSI text, so the agreement proves LATERAL semantics, not
    * just the window-function rewrite the `topk_per_group` query already
    * covers. Inner lateral: nations with no customers drop on both
    * engines. c_acctbal is a source DOUBLE — compared verbatim, no
    * arithmetic to diverge. */
  private val lateralTopPerGroup =
    """SELECT n.n_name, t.c_name, t.c_acctbal
      |FROM nation n, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin

  /** Recursive CTE (Spark 4.x `UnionLoop`): per-seed iteration of the
    * Collatz map from `nation`-derived seeds — per-branch state carried
    * through a UNION ALL recursion, termination by predicate, the
    * rollup outside the loop (aggregation is illegal inside a recursive
    * term in BOTH engines, so the shape is forced and portable).
    * UNION ALL recursion only: Spark's recursive CTEs don't dedup
    * between steps, so cyclic-graph closure stays with the iterative
    * operators ([[graft.sim.Dedup.clusters]]); this is the
    * DAG/iteration slice of the surface. Integer arithmetic throughout
    * (the ÷2 round-trips through DOUBLE exactly — n < 2⁵³); max depth 23
    * from these seeds, far under the default recursion limit. Identical
    * ANSI text both engines. */
  private val recursiveIter =
    """WITH RECURSIVE c(start, n, steps) AS (
      |  SELECT n_nationkey + 1, CAST(n_nationkey + 1 AS BIGINT), 0
      |  FROM nation
      |  UNION ALL
      |  SELECT start,
      |    CASE WHEN n % 2 = 0 THEN CAST(n / 2 AS BIGINT)
      |         ELSE 3 * n + 1 END,
      |    steps + 1
      |  FROM c WHERE n > 1)
      |SELECT start, MAX(steps) AS n_steps, MAX(n) AS peak
      |FROM c GROUP BY start ORDER BY start""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_recursive_cte" -> ((s, d) => sql(s, d, recursiveIter)),
    "subq_scalar_corr" -> ((s, d) => sql(s, d, scalarCorr)),
    "subq_in" -> ((s, d) => sql(s, d, inSubq)),
    "subq_exists_corr" -> ((s, d) => sql(s, d, existsCorr)),
    "funnel_conversion" -> ((s, d) => sql(s, d, funnel)),
    "win_range_time" -> ((s, d) => sql(s, d, winRangeTime)),
    "join_lateral" -> ((s, d) => sql(s, d, lateralTopPerGroup))
  )

  /** Same ANSI text — both engines run the identical query. */
  def oracleSql: Map[String, String] = Map(
    "subq_scalar_corr" -> scalarCorr,
    "subq_in" -> inSubq,
    "subq_exists_corr" -> existsCorr,
    "funnel_conversion" -> funnel,
    "win_range_time" -> winRangeTime,
    "join_lateral" -> lateralTopPerGroup,
    "sql_recursive_cte" -> recursiveIter
  )
}
