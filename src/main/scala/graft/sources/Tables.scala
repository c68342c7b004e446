package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed accessors for the testdata tables.
  *
  * Each accessor is a plain parquet scan; column pruning and filter
  * pushdown are left to Catalyst (asserted in `TablesSpec`). At 100 TB
  * the same accessors work unchanged against a directory of many
  * files — `spark.read.parquet` splits by `files.maxPartitionBytes`.
  *
  * Reference surface: clflushopt/datafusion-tpch registers these
  * tables in the session catalog (src/lib.rs:232-261); here
  * `registerAll` does the same as temp views so `spark.sql` works on
  * top of the identical names.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")

  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS), which
    * Spark's parquet reader rejects by default. Read it as a long
    * (legacy nanosAsLong) and truncate to microseconds — exactly what
    * DuckDB's TIMESTAMP (µs) does, so oracle values agree. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view (≙ the reference's `tpch(sf)`
    * UDTF registering all tables in the catalog). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
