package graft.sources

import java.util.Locale

import graft.tpch.TpchGen
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A read-only [[TableCatalog]] exposing the generated tables as a
  * scale-factor-per-namespace catalog — zero setup beyond one conf:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.tpch", "graft.sources.TpchCatalog")
  * spark.sql("SELECT count(*) FROM tpch.sf1.lineitem")
  * spark.sql("SELECT * FROM tpch.sf0_1.orders")   // sf0_1 ⇒ sf 0.1
  * }}}
  *
  * This is the third spelling of the same single construction point
  * ([[TpchGen.table]], via [[TpchTable]]'s V1Scan binding): the
  * `tpch` FORMAT parameterizes reads, `USING tpch` views parameterize
  * DDL, and this catalog removes even the view step — the closest
  * Spark idiom to the reference's `SELECT * FROM tpch_lineitem(1)`
  * inline UDTF (clflushopt/datafusion-tpch src/lib.rs:69-106).
  * Namespaces are virtual: `sfX` or `sfX_Y` (underscore for the
  * decimal point, since `.` separates SQL identifiers; backticked
  * `` `sf0.1` `` works too). The catalog is read-only — create /
  * alter / drop / rename all fail with UnsupportedOperationException.
  */
class TpchCatalog extends TableCatalog {
  private var catalogName = "tpch"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  /** "sf1" / "sf0.1" / "sf0_1" → scale factor; None if not an sf namespace. */
  private def sfOf(namespace: Array[String]): Option[Double] =
    namespace match {
      case Array(ns) if ns.toLowerCase(Locale.ROOT).startsWith("sf") =>
        ns.drop(2).replace('_', '.').toDoubleOption.filter(_ > 0)
      case _ => None
    }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    sfOf(namespace) match {
      case Some(_) => TpchGen.tableNames.map(Identifier.of(namespace, _)).toArray
      case None => throw new NoSuchNamespaceException(name() +: namespace.toSeq)
    }

  override def loadTable(ident: Identifier): Table = {
    // case-insensitive like Spark's default identifier resolution
    // (LINEITEM is classic TPC-H spelling); sfOf lowercases too
    val table = ident.name().toLowerCase(Locale.ROOT)
    sfOf(ident.namespace())
      .filter(_ => TpchGen.tableNames.contains(table))
      .map(sf => new TpchTable(Map("table" -> table, "sf" -> sf.toString)))
      .getOrElse(throw new NoSuchTableException(name() +: ident.namespace().toSeq :+ ident.name()))
  }

  private def readOnly = new UnsupportedOperationException(
    s"catalog ${name()} is read-only: tables are generated, not stored")
  override def createTable(ident: Identifier, schema: org.apache.spark.sql.types.StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table = throw readOnly
  override def alterTable(ident: Identifier, changes: TableChange*): Table = throw readOnly
  override def dropTable(ident: Identifier): Boolean = throw readOnly
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = throw readOnly
}
