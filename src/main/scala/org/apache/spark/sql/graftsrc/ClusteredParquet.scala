package org.apache.spark.sql.graftsrc

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.{DataSource, FileFormat, FileStatusCache, InMemoryFileIndex, NoopCache, PartitionDirectory, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileDataSourceV2
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** FILE-level statistics skipping for clustered layouts (SURVEY §2
  * B1.9; the round-15 verdict's top item) — the missing level of the
  * B1.7/B1.8 story: vanilla Spark prunes a Z-order/Hilbert layout at
  * the parquet ROW-GROUP level only, so at 100 TB every file is still
  * listed, scheduled and opened even when its footer then excludes all
  * row groups. The fix every lakehouse ships (Delta/Iceberg data
  * skipping) is per-FILE min/max statistics consulted BEFORE task
  * creation.
  *
  * Architecture — the Delta arrangement on stock Spark machinery: a
  * DataSource V2 provider ([[ClusteredParquet]]) whose table is the
  * built-in v2 [[ParquetTable]] with ONE substitution — the file index
  * is a [[StatsFileIndex]], an [[InMemoryFileIndex]] that loads the
  * layout's per-file min/max manifest (written at layout time from the
  * parquet FOOTERS — metadata-only, no data re-read) and drops
  * statistically-excluded files inside `listFiles`, which the v2
  * `FileScan` calls before `planInputPartitions` — files prune before
  * a single task exists. Everything downstream (schema inference,
  * filter pushdown, vectorized reading, AQE) is the battle-tested
  * built-in parquet path: the provider adds a file-pruning decision,
  * not a reader.
  *
  * Pruning is CONSERVATIVE by construction: only conjuncts of the form
  * `col {<,<=,>,>=,=} integerLiteral` over manifest-covered columns
  * prune; any other predicate shape, any file absent from the manifest,
  * and any non-integer comparison keep the file. Spark re-applies ALL
  * pushed filters over the surviving files (the index only ever
  * REMOVES provably-empty work), so correctness never depends on the
  * manifest — LayoutDsv2Spec pins v2 results ≡ vanilla parquet reads
  * under every query shape, manifest present or absent.
  *
  * The declared layout keys (`fn_zorder`, `fn_hilbert`) stay on the
  * oracled vanilla path; this provider is the production twin
  * (TEST-gated per SURVEY §7.5.7), measured in dev/layout_volume.json:
  * files-read fractions beside the row-group fractions. */
class ClusteredParquet extends FileDataSourceV2 {

  override def fallbackFileFormat: Class[_ <: FileFormat] =
    classOf[ParquetFileFormat]

  override def shortName(): String = "graft-clustered"

  override def getTable(options: CaseInsensitiveStringMap): Table = {
    val paths = getPaths(options)
    new ClusteredParquetTable(getTableName(options, paths), sparkSession,
      getOptionsWithoutPaths(options), paths, None, fallbackFileFormat)
  }

  override def getTable(options: CaseInsensitiveStringMap,
      schema: StructType): Table = {
    val paths = getPaths(options)
    new ClusteredParquetTable(getTableName(options, paths), sparkSession,
      getOptionsWithoutPaths(options), paths, Some(schema),
      fallbackFileFormat)
  }
}

/** The built-in v2 parquet table with the stats-pruning file index
  * substituted — every other behavior inherited. */
class ClusteredParquetTable(
    name: String,
    sparkSession: SparkSession,
    options: CaseInsensitiveStringMap,
    paths: Seq[String],
    userSpecifiedSchema: Option[StructType],
    fallbackFileFormat: Class[_ <: FileFormat])
  extends ParquetTable(name, sparkSession, options, paths,
    userSpecifiedSchema, fallbackFileFormat) {

  override lazy val fileIndex: PartitioningAwareFileIndex = {
    import scala.jdk.CollectionConverters._
    // mirror FileTable's path resolution (round 16, ADVICE): glob
    // expansion + existence checks + the shared FileStatusCache, so
    // glob paths and missing-path errors behave exactly like the
    // vanilla v2 parquet path; only the index CLASS differs
    val caseSensitiveMap = options.asCaseSensitiveMap.asScala.toMap
    val hadoopConf =
      sparkSession.sessionState.newHadoopConfWithOptions(caseSensitiveMap)
    val enableGlobbing = caseSensitiveMap
      .getOrElse(DataSource.GLOB_PATHS_KEY, "true") == "true"
    val rootPathsSpecified = DataSource.checkAndGlobPathIfNecessary(
      paths, hadoopConf, checkEmptyGlobPath = true, checkFilesExist = true,
      enableGlobbing = enableGlobbing)
    new StatsFileIndex(sparkSession, rootPathsSpecified,
      caseSensitiveMap, userSpecifiedSchema,
      FileStatusCache.getOrCreate(sparkSession))
  }
}

/** [[InMemoryFileIndex]] + the layout's per-file min/max manifest:
  * `listFiles` drops files whose stats prove the data filters
  * unsatisfiable. Missing manifest → behaves exactly like the parent. */
class StatsFileIndex(
    spark: SparkSession,
    roots: Seq[Path],
    parameters: Map[String, String],
    schemaOpt: Option[StructType],
    fileStatusCache: FileStatusCache = NoopCache)
  extends InMemoryFileIndex(spark, roots, parameters, schemaOpt,
    fileStatusCache) {

  /** fileName → column → (min, max); loaded once per index instance
    * from every root's `_graft_stats/stats.tsv` (absent → empty). */
  private lazy val stats: Map[String, Map[String, (Long, Long)]] = {
    val conf = spark.sessionState.newHadoopConf()
    roots.flatMap { root =>
      val p = new Path(root, StatsFileIndex.ManifestPath)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else {
        val in = fs.open(p)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        text.linesIterator.filter(_.nonEmpty).map { l =>
          val Array(file, col, mn, mx) = l.split('\t')
          (file, col, mn.toLong, mx.toLong)
        }.toSeq
      }
    }.groupBy(_._1).map { case (f, rows) =>
      f -> rows.map { case (_, c, mn, mx) => c -> ((mn, mx)) }.toMap
    }
  }

  /** Scheme-qualified roots for relative-key lookups. */
  private lazy val qualifiedRoots: Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    roots.map(r => r.getFileSystem(conf).makeQualified(r).toString)
  }

  /** True only for a genuinely legacy (pre-r15, flat) manifest: no
    * '/'-keyed entry anywhere. Gates the bare-name fallback below so a
    * root-relative manifest can never mis-attach another directory's
    * stats through a colliding basename (round 16, ADVICE). */
  private lazy val legacyFlatManifest: Boolean =
    stats.nonEmpty && !stats.keysIterator.exists(_.contains('/'))

  /** Manifest key of a listed file: its path relative to the owning
    * root (partition subdirectories included). Pre-r15 manifests keyed
    * by bare file name still resolve via the fallback — but only when
    * the whole manifest is flat (legacy); a mixed lookup is refused. */
  private def statsOf(p: Path): Option[Map[String, (Long, Long)]] = {
    val full = p.toString
    qualifiedRoots.collectFirst {
      case r if full.startsWith(r + "/") =>
        full.substring(r.length + 1)
    }.flatMap(stats.get)
      .orElse(if (legacyFlatManifest) stats.get(p.getName) else None)
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val dirs = super.listFiles(partitionFilters, dataFilters)
    val total = dirs.map(_.files.size).sum
    val bounds = dataFilters.flatMap(StatsFileIndex.conjuncts)
      .flatMap(StatsFileIndex.boundOf)
    val pruned =
      if (bounds.isEmpty || stats.isEmpty) dirs
      else dirs
        .map(pd => pd.copy(files = pd.files.filter(f =>
          StatsFileIndex.survives(statsOf(f.getPath), bounds))))
        .filter(_.files.nonEmpty)
    val kept = pruned.map(_.files.size).sum
    if (StatsFileIndex.recordPrunes)
      StatsFileIndex.lastPrune.put(
        roots.headOption.map(_.toString).getOrElse(""), (total, kept))
    pruned
  }
}

object StatsFileIndex {

  /** Manifest location under a layout root — the underscore prefix
    * keeps it invisible to every normal parquet read. */
  val ManifestPath = "_graft_stats/stats.tsv"

  /** One simple comparison bound: op ∈ {>=, >, <=, <, =}, or an IN
    * list (op "in", values in `vs`). */
  final case class Bound(col: String, op: String, v: Long,
      vs: Seq[Long] = Seq.empty)

  /** (rootPath → (files listed, files kept)) of the most recent
    * listFiles call per root — the measurement hook LayoutVolume and
    * the specs read (the harness is sequential; planning may call
    * listFiles more than once per query with identical results, last
    * write wins). Recording is OPT-IN (round 16): production reads
    * never touch shared mutable state — only a measurement harness
    * that sets [[recordPrunes]] pays for (and sees) the record. */
  val lastPrune =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Int)]()

  /** Enable [[lastPrune]] recording (measurement harnesses only). */
  @volatile var recordPrunes: Boolean = false

  private[graftsrc] def conjuncts(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }

  private def longOf(v: Any): Option[Long] = v match {
    case l: Long  => Some(l)
    case i: Int   => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte  => Some(b.toLong)
    case _        => None
  }

  /** Extract a prunable bound from one conjunct — anything else is a
    * no-prune (conservative). */
  private[graftsrc] def boundOf(e: Expression): Option[Bound] = e match {
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      longOf(v).map(Bound(a.name, ">=", _))
    case GreaterThan(a: AttributeReference, Literal(v, _)) =>
      longOf(v).map(Bound(a.name, ">", _))
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      longOf(v).map(Bound(a.name, "<=", _))
    case LessThan(a: AttributeReference, Literal(v, _)) =>
      longOf(v).map(Bound(a.name, "<", _))
    case EqualTo(a: AttributeReference, Literal(v, _)) =>
      longOf(v).map(Bound(a.name, "=", _))
    // literal-on-the-left mirrors
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
      longOf(v).map(Bound(a.name, "<=", _))
    case GreaterThan(Literal(v, _), a: AttributeReference) =>
      longOf(v).map(Bound(a.name, "<", _))
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) =>
      longOf(v).map(Bound(a.name, ">=", _))
    case LessThan(Literal(v, _), a: AttributeReference) =>
      longOf(v).map(Bound(a.name, ">", _))
    case EqualTo(Literal(v, _), a: AttributeReference) =>
      longOf(v).map(Bound(a.name, "=", _))
    // IN over integer literals: survives iff ANY value lands in range
    case In(a: AttributeReference, list) if list.nonEmpty &&
        list.forall { case Literal(v, _) => longOf(v).isDefined
                      case _ => false } =>
      Some(Bound(a.name, "in", 0L,
        list.map { case Literal(v, _) => longOf(v).get }))
    case _ => None
  }

  /** A file survives unless SOME bound is provably unsatisfiable on its
    * stats. No stats for the file or the column → survives. */
  private[graftsrc] def survives(
      fileStats: Option[Map[String, (Long, Long)]],
      bounds: Seq[Bound]): Boolean = fileStats match {
    case None => true
    case Some(cols) => bounds.forall { b =>
      cols.get(b.col) match {
        case None => true
        case Some((mn, mx)) => b.op match {
          case ">=" => mx >= b.v
          case ">"  => mx > b.v
          case "<=" => mn <= b.v
          case "<"  => mn < b.v
          case "="  => mn <= b.v && b.v <= mx
          case "in" => b.vs.exists(v => mn <= v && v <= mx)
        }
      }
    }
  }
}
