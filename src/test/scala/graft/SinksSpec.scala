package graft

import graft.sources.{Sinks, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** §2.6 persistence round-trips. */
class SinksSpec extends SparkSpecBase {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString + "/out"

  test("partitioned parquet write creates partition dirs and round-trips") {
    val dir = tmp("parquet")
    val src = Tables.nation(spark, sfDir)
    Sinks.writeParquet(src, dir, partitionBy = Seq("n_regionkey"))
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("n_regionkey=")), dirs.mkString(","))
    val back = Sinks.readParquet(spark, dir)
    assert(back.count() == src.count())
    // partition-column filter prunes to one directory
    val pruned = back.filter(col("n_regionkey") === 0)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan.take(1500))
  }

  test("csv round-trip preserves rows with an explicit schema") {
    val dir = tmp("csv")
    val src = Tables.region(spark, sfDir).select(col("r_regionkey"), col("r_name"))
    Sinks.writeCsv(src, dir)
    val back = Sinks.readCsv(spark, dir, src.schema)
    assert(back.orderBy(col("r_regionkey")).collect().toSeq ==
      src.orderBy(col("r_regionkey")).collect().toSeq)
  }

  test("json round-trip preserves rows with an explicit schema") {
    val dir = tmp("json")
    val src = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    Sinks.writeJson(src, dir)
    val back = Sinks.readJson(spark, dir, src.schema)
    assert(back.orderBy(col("s_suppkey")).collect().toSeq ==
      src.orderBy(col("s_suppkey")).collect().toSeq)
  }
}
