package graft.tpch

import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The TPC-H query surface, adapted to the driver's reduced schema.
  *
  * The reference (clflushopt/datafusion-tpch) delegates analytics to
  * DataFusion SQL over the generated TPC-H tables; the equivalent
  * Spark-native surface is this module: each of the 22 queries as a
  * declarative DataFrame plan, with the adaptation (missing columns /
  * partsupp) documented per query. Every query has a DuckDB oracle.
  *
  * Plan-shape rules (100 TB posture):
  *  - dimension tables (region/nation/supplier/customer/part) are
  *    broadcast; only fact-fact joins (lineitem ⋈ orders) shuffle.
  *  - aggregates are expressed via groupBy().agg() → partial+final
  *    hash aggregation (map-side combine) under whole-stage codegen.
  *  - monetary sums are rounded to 2dp on BOTH sides (Spark + DuckDB)
  *    so fp summation order cannot flip the hash compare.
  */
object TpchQueries {

  private def ts(d: String): Column = lit(d).cast("timestamp")
  /** Round a money aggregate to 2dp (both sides do this). */
  private def money(c: Column): Column = round(c, 2)

  // ---------------------------------------------------------------- Q1
  /** Q1 pricing summary: scan→filter→8-way aggregate. Full TPC-H shape
    * (all needed columns exist). */
  val q1: GQuery = GQuery(
    "q1_pricing_summary",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      l.filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          money(sum(col("l_quantity"))).as("sum_qty"),
          money(sum(col("l_extendedprice"))).as("sum_base_price"),
          money(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          money(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2)                                           AS sum_qty,
             round(sum(l_extendedprice), 2)                                      AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2)                   AS sum_disc_price,
             round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)     AS sum_charge,
             round(avg(l_quantity), 4)                                           AS avg_qty,
             round(avg(l_extendedprice), 4)                                      AS avg_price,
             round(avg(l_discount), 6)                                           AS avg_disc,
             count(*)                                                            AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q3
  /** Q3 shipping priority: customer(broadcast) ⋈ orders ⋈ lineitem,
    * agg on orderkey, top-10. (No o_shippriority column → omitted.) */
  val q3: GQuery = GQuery(
    "q3_shipping_priority",
    (s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < ts("1998-03-15 00:00:00"))
      val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > ts("1998-03-15 00:00:00"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(money(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate").cast("date").as("o_orderdate"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },
    Some("""
      SELECT l_orderkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             CAST(o_orderdate AS DATE) AS o_orderdate
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING'
        AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderdate, l_orderkey
      LIMIT 10"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q6
  /** Q6 forecast revenue: pure scan+filter+agg; the whole predicate
    * reaches the parquet reader (PushedFilters asserted in spec). */
  val q6: GQuery = GQuery(
    "q6_forecast_revenue",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .filter(
          col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(money(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"))
    },
    Some("""
      SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24"""),
    tags = Set("tpch"))

  def all: Seq[GQuery] = Seq(q1, q3, q6)
}
