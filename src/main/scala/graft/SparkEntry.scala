package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query inventories; every key here has either a
  * DuckDB oracle (oracleSql) or lives in tests instead (SURVEY §7.5.7). */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's headline output: per-rule usage report incl. never-hit
    * rules (12 rows by construction). */
  def entry(spark: SparkSession): DataFrame =
    domain.Fw.usageReport(spark, "/root/testdata/sf0.001")

  private def modules = Seq(
    domain.Fw.queries,
    ops.Relational.queries,
    ops.Windows.queries,
    ops.SqlFrontend.queries,
    ops.Scalars.queries,
    text.TextOps.queries,
    text.Classify.queries,
    text.Bpe.queries,
    text.ByteBpe.queries,
    text.Unigram.queries,
    text.WordPiece.queries,
    text.LexIndex.queries,
    text.DecontIndex.queries,
    text.SubstringDedup.queries,
    sim.Similarity.queries,
    sim.Ann.queries,
    sim.EmbedFp.queries,
    sim.Dedup.queries,
    sim.Curation.queries,
    sim.Eval.queries,
    graph.Graph.queries
  )

  private def oracleModules = Seq(
    domain.Fw.oracleSql,
    ops.Relational.oracleSql,
    ops.Windows.oracleSql,
    ops.SqlFrontend.oracleSql,
    ops.Scalars.oracleSql,
    text.TextOps.oracleSql,
    text.Classify.oracleSql,
    text.Bpe.oracleSql,
    text.ByteBpe.oracleSql,
    text.Unigram.oracleSql,
    text.WordPiece.oracleSql,
    text.LexIndex.oracleSql,
    text.DecontIndex.oracleSql,
    text.SubstringDedup.oracleSql,
    sim.Similarity.oracleSql,
    sim.Ann.oracleSql,
    sim.EmbedFp.oracleSql,
    sim.Dedup.oracleSql,
    sim.Curation.oracleSql,
    sim.Eval.oracleSql,
    graph.Graph.oracleSql
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = oracleModules.reduce(_ ++ _)
}
