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

  /** Bucketed (and bucket-sorted) parquet table: rows are hash-split
    * into `nBuckets` files per partition by `bucketCol`, recorded in
    * the catalog, so every LATER join or aggregation keyed on
    * `bucketCol` between co-bucketed tables reads pre-partitioned
    * data and plans with NO shuffle exchange — the pay-the-shuffle-
    * once pattern for a 100 TB fact table that is joined on the same
    * key query after query (SinksSpec pins the exchange-free plan).
    * Registered as an external table at `path` (the catalog holds
    * only metadata; DROP TABLE leaves the files). */
  def writeBucketed(df: DataFrame, table: String, path: String, bucketCol: String,
      nBuckets: Int, mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Registry key driving [[writeBucketed]] end-to-end — the
    * pay-the-shuffle-once layout pattern, driver-checked (before this
    * key the exchange-free property lived only in SinksSpec). The
    * build bucketizes lineitem and orders on the join key into 16
    * co-bucketed catalog tables (fresh temp path per call — the
    * write IS part of the operator and of its timed cost), then runs
    * the fact-fact join with a merge hint: co-bucketed scans feed the
    * sort-merge join with ZERO shuffle exchange (the spec pins the
    * plan), which at 100 TB is the difference between shuffling the
    * fact table on every query and shuffling it once at layout time.
    * The oracle replays the same join+rollup over the raw tables —
    * bucketing must not change a single row. */
  val bucketedJoin: graft.GQuery = graft.GQuery(
    "op_bucketed_join",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val wh = java.nio.file.Files.createTempDirectory("graft_buckets").toString
      writeBucketed(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity")),
        "graft_bkt_lineitem", s"$wh/li", "l_orderkey", 16)
      writeBucketed(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
        "graft_bkt_orders", s"$wh/or", "o_orderkey", 16)
      s.table("graft_bkt_orders").hint("merge")
        .join(s.table("graft_bkt_lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(floor(col("l_quantity") * 100 + 0.5).cast("long")).as("qty_cents"))
    },
    Some("""
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_cents
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1"""),
    tags = Set("sinks"))

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
