package graft.sources

import java.util
import java.util.Locale

import scala.jdk.CollectionConverters._

import graft.tpch.TpchGen
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The `tpch` data-source format: inline-parameterized generated
  * tables with no Scala call in sight —
  *
  * {{{
  * spark.read.format("tpch").option("sf", 0.1).option("table", "lineitem").load()
  * // or, fully inside SQL (≙ the reference's `SELECT * FROM tpch_lineitem(1)`,
  * // clflushopt/datafusion-tpch src/lib.rs:69-106,132-186):
  * CREATE TEMPORARY VIEW lineitem USING tpch OPTIONS (table 'lineitem', sf '0.1')
  * }}}
  *
  * Options: `table` (or the `load(...)` path) — one of
  * [[TpchGen.tableNames]]; `sf` — scale factor; optional
  * `numParts`/`part` — the shard surface, same semantics as
  * [[TpchGen.table]].
  *
  * Binding: DataSourceV2 [[TableProvider]] on the outside, Spark's
  * sanctioned [[V1Scan]] shim on the inside, so the scan IS the
  * [[TpchGen.table]] plan — one construction point, and this format
  * can never drift from `registerAll`/`persistAll` output. A native
  * DSv2 `PartitionReader` would have to re-implement the whole
  * deterministic expression pipeline row-wise on executors (no
  * SparkSession there), i.e. a second generator to keep in sync; the
  * V1 shim trades a Row↔InternalRow conversion on the scan boundary
  * for structural non-divergence. Generation-heavy jobs should call
  * [[TpchGen]] directly (pure codegen) or read [[TpchGen.persistAll]]
  * parquet; this format is the ergonomics surface.
  */
class TpchDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tpch"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TpchDataSource.plan(SparkSession.active, options.asCaseSensitiveMap().asScala.toMap).schema

  // supportsExternalMetadata stays false: the schema is the generator's,
  // never user-supplied — Spark rejects a .schema(...) override for us
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TpchTable(properties.asScala.toMap)
}

private[sources] class TpchTable(opts: Map[String, String]) extends Table with SupportsRead {
  // parse eagerly: a typo'd table name or non-numeric sf fails at
  // resolution on the driver, not at first action on an executor
  private val parsed = TpchDataSource.parse(opts)

  override def name(): String = s"tpch_${parsed._1}(sf=${parsed._2})"
  // memoized: the analyzer asks for the schema repeatedly per query,
  // and each plan() call rebuilds the whole generator expression tree
  private lazy val schema0: StructType =
    TpchDataSource.plan(SparkSession.active, opts).schema
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // reader options already rode in via getTable properties; merge
    // anyway so catalog-provided tables can still take per-read options
    val merged = opts ++ options.asCaseSensitiveMap().asScala
    // column pruning happens HERE, at the DSv2 ScanBuilder (the V1
    // PrunedScan interface is never consulted on the V1Scan shim
    // path): the Row conversion on the V1 boundary is the shim's only
    // real cost, so narrowing the generated plan to the required
    // columns means a count() over generated lineitem converts zero
    // values per row instead of sixteen
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: Option[StructType] = None
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = Some(requiredSchema)
      override def build(): Scan = new TpchV1Scan(merged, required)
    }
  }
}

private[sources] class TpchV1Scan(opts: Map[String, String],
    required: Option[StructType]) extends V1Scan {
  override def readSchema(): StructType =
    required.getOrElse(TpchDataSource.plan(SparkSession.active, opts).schema)

  override def toV1TableScan[T <: BaseRelation with TableScan](context: SQLContext): T =
    new TpchRelation(context, opts, required).asInstanceOf[T]
}

private[sources] class TpchRelation(override val sqlContext: SQLContext,
    opts: Map[String, String], required: Option[StructType] = None)
    extends BaseRelation with TableScan {
  private val df = {
    val base = TpchDataSource.plan(sqlContext.sparkSession, opts)
    // an EMPTY required schema is a pure count: project zero columns
    required.fold(base)(r =>
      base.select(r.fieldNames.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*))
  }
  override def schema: StructType = df.schema
  override def buildScan(): RDD[Row] = df.rdd
}

object TpchDataSource {
  /** (table, sf, numParts, part) from user options, keys
    * case-insensitive, `path` accepted as the table name so
    * `load("lineitem")` works. */
  private[sources] def parse(options: Map[String, String]): (String, Double, Int, Int) = {
    val o = options.map { case (k, v) => k.toLowerCase(Locale.ROOT) -> v }
    def num[N](key: String, dflt: String, conv: String => N): N = {
      val raw = o.getOrElse(key, dflt)
      try conv(raw)
      catch { case _: NumberFormatException => throw new IllegalArgumentException(
        s"tpch option '$key' must be numeric, got '$raw'") }
    }
    // table matching is case-insensitive like the rest of Spark's
    // identifier resolution (LINEITEM is classic TPC-H spelling)
    val table = o.get("table").orElse(o.get("path"))
      .map(_.toLowerCase(Locale.ROOT))
      .getOrElse(throw new IllegalArgumentException(
        s"tpch source needs a 'table' option (or load path): one of ${TpchGen.tableNames.mkString(", ")}"))
    require(TpchGen.tableNames.contains(table),
      s"unknown tpch table '$table' (expected one of ${TpchGen.tableNames.mkString(", ")})")
    require(o.contains("sf"), "tpch source needs an 'sf' option (scale factor, e.g. sf '1')")
    val sf = num("sf", "", _.toDouble)
    require(sf > 0, s"tpch option 'sf' must be positive, got $sf")
    (table, sf, num("numparts", "0", _.toInt), num("part", "-1", _.toInt))
  }

  private[sources] def plan(spark: SparkSession, options: Map[String, String]): DataFrame = {
    val (table, sf, numParts, part) = parse(options)
    TpchGen.table(spark, table, sf, numParts, part)
  }
}
