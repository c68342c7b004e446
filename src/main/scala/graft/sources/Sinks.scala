package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** §2.6 write/read helpers — the persistence surface (≙ the
  * reference's COPY-to-parquet examples, examples/parquet.rs).
  *
  * None of these coalesce: output file count follows the task count,
  * which is what a 1000-executor write needs (the Verify harness's
  * single-file dump is a dev-only exception, not this API).
  */
object Sinks {

  /** Partitioned parquet write. `partitionBy` columns become
    * directory partitions, so downstream reads with a filter on them
    * prune whole directories before any IO (dynamic partition
    * pruning at scale). */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with header. An explicit schema on read avoids the
    * inference pass (a full extra scan at 100 TB — never rely on it
    * in production paths). */
  def writeCsv(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** JSON lines. Same schema-on-read discipline as CSV. */
  def writeJson(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
