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
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view (≙ the reference's `tpch(sf)`
    * UDTF registering all tables in the catalog). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
