package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** §2.6 parquet-scan behaviour: filters reach the reader, projection
  * prunes the schema — the two properties that decide whether a
  * 100 TB scan reads 100 TB or 2 columns of it. */
class TablesSpec extends SparkSpecBase {

  private def scanString(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q6-style predicates push down to the parquet scan") {
    val df = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07))
      .select(col("l_extendedprice"))
    // read the scan's own metadata — the plan's toString truncates long
    // filter lists
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec leaf"))
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(l_discount,0.05)"), pushed)
    assert(pushed.contains("LessThanOrEqual(l_discount,0.07)"), pushed)
  }

  test("projection prunes the read schema to selected columns") {
    val plan = scanString(
      Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_quantity")))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey"), readSchema)
    assert(readSchema.contains("l_quantity"), readSchema)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_extendedprice"), readSchema)
  }

  test("registerAll exposes the accessor schema (events.ts is a timestamp)") {
    Tables.registerAll(spark, sfDir)
    val tsType = spark.sql("SELECT ts FROM events LIMIT 1").schema.head.dataType
    // µs-precision timestamp either way; NTZ on corpora that store
    // TIMESTAMP(MICROS) without UTC adjustment (driver testdata since
    // r12), LTZ on corpora where the legacy nanos column is converted
    // via timestamp_micros. Never the raw long.
    val ok = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.TimestampType,
      org.apache.spark.sql.types.TimestampNTZType)
    assert(ok.contains(tsType), tsType.toString)
  }
}
