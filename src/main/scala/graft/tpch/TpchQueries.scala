package graft.tpch

import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The TPC-H query surface, adapted to the driver's reduced schema.
  *
  * The reference (clflushopt/datafusion-tpch, src/lib.rs:272-316) registers
  * the 8 TPC-H tables precisely so its users can run full SQL analytics over
  * them via DataFusion; the equivalent Spark-native surface is this module:
  * each of the 22 queries as a declarative DataFrame plan, with the
  * adaptation (missing columns / no partsupp) documented per query. Every
  * query has a DuckDB oracle with IDENTICAL semantics and column names.
  *
  * Schema adaptations (driver testdata vs TPC-H spec):
  *  - no `partsupp` table → part↔supplier relationships derived from
  *    lineitem (q2, q11, q16, q20), cost bases from p_retailprice (q9).
  *  - no l_shipmode/l_commitdate/l_receiptdate → lateness expressed via
  *    l_shipdate vs o_orderdate (q4, q12, q21 use returnflag semantics).
  *  - no c_phone/c_address/comments → q22 country code from c_custkey,
  *    q13/q16 "complaint" filters from priority/acctbal.
  *  - nations are NATION_0..NATION_24; regions keep spec names.
  *  - date domain is o_orderdate ∈ [1995-01-01, 2001-08-01] → spec date
  *    windows shifted into that range (q3 uses 1998-03-15, not the spec's
  *    1995-03-15, to sit mid-domain; noted per query).
  *
  * Plan-shape rules (100 TB posture):
  *  - ONLY genuinely bounded dims (region: 5 rows, nation: 25 rows) carry
  *    an explicit broadcast hint. supplier/customer/part scale with sf
  *    (supplier = 10k×sf is ~1e9 rows at the 100 TB posture) so their join
  *    strategy is left to AQE, which still broadcasts them at small sf.
  *  - aggregates are expressed via groupBy().agg() → partial+final hash
  *    aggregation (map-side combine) under whole-stage codegen.
  *  - monetary sums are rounded to 2dp on BOTH sides (Spark + DuckDB)
  *    so fp summation order cannot flip the hash compare.
  *  - every LIMIT is preceded by a total (tie-broken) ORDER BY.
  */
object TpchQueries {

  private def ts(d: String): Column = lit(d).cast("timestamp")
  /** Round a money aggregate to 2dp (both sides do this). */
  private def money(c: Column): Column = round(c, 2)
  /** Per-row money discretization to exact BIGINT cents using ONLY
    * IEEE-754 double ops (*, +, floor), which are bit-identical across
    * engines. A plain double sum is order-dependent (Spark partial+final
    * vs DuckDB sequential can flip a .005 rounding boundary) and even a
    * double→DECIMAL cast differs between engines (DuckDB scales in fp,
    * Spark rounds the exact binary expansion). cents() sidesteps both:
    * identical doubles → identical cents → exact integer sums. */
  private def cents(c: Column): Column = floor(c * lit(100) + lit(0.5)).cast("long")
  /** Order-independent exact money sum: Σ cents / 100.0 (oracle mirrors
    * it as sum(CAST(floor(x*100 + 0.5) AS BIGINT)) / 100.0). */
  private def dsum(c: Column): Column = sum(cents(c)) / lit(100.0)
  /** Scale-4 variant for averages: Σ floor(x*1e4+0.5) as long. */
  private def q4sum(c: Column): Column = sum(floor(c * lit(10000) + lit(0.5)).cast("long"))
  private def revenue: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

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
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          round(q4sum(col("l_quantity")) / lit(10000.0) / count(lit(1)), 4).as("avg_qty"),
          round(q4sum(col("l_extendedprice")) / lit(10000.0) / count(lit(1)), 4).as("avg_price"),
          round(q4sum(col("l_discount")) / lit(10000.0) / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             sum(CAST(floor((l_quantity) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_qty,
             sum(CAST(floor((l_extendedprice) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_base_price,
             sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_disc_price,
             sum(CAST(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_charge,
             round(sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) / 10000.0 / count(*), 4) AS avg_qty,
             round(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) / 10000.0 / count(*), 4) AS avg_price,
             round(sum(CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)) / 10000.0 / count(*), 6) AS avg_disc,
             count(*)                                                            AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q2
  /** Q2 min-cost supplier, adapted: no partsupp, so the supply relation is
    * derived from lineitem — unit cost per (part, supplier) is the minimum
    * observed l_extendedprice/l_quantity. For STANDARD parts of size ≤ 5
    * supplied from EUROPE, pick each part's cheapest supplier.
    * Plan: groupBy(part,supp) agg → dim joins (nation/region broadcast) →
    * per-part min via window → filter. */
  val q2: GQuery = GQuery(
    "q2_min_cost_supplier",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val supply = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
      val p = Tables.part(s, dir).filter(col("p_type") === "STANDARD" && col("p_size") <= 5)
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).filter(col("r_name") === "EUROPE")
      val joined = supply
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      val w = Window.partitionBy(col("p_partkey"))
      joined
        .withColumn("min_cost", min(col("unit_cost")).over(w))
        .filter(col("unit_cost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
          money(col("unit_cost")).as("unit_cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },
    Some("""
      WITH supply AS (
        SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY 1, 2
      ), joined AS (
        SELECT s_acctbal, s_name, n_name, p_partkey, unit_cost,
               min(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
        FROM supply, part, supplier, nation, region
        WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND p_type = 'STANDARD' AND p_size <= 5 AND r_name = 'EUROPE'
      )
      SELECT s_acctbal, s_name, n_name, p_partkey, round(unit_cost, 2) AS unit_cost
      FROM joined WHERE unit_cost = min_cost
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q3
  /** Q3 shipping priority: customer ⋈ orders ⋈ lineitem, agg on orderkey,
    * top-10. Adaptations: no o_shippriority column → omitted; cutoff date
    * 1998-03-15 (mid date-domain) instead of the spec's 1995-03-15.
    * Customer is fact-scale at the 100 TB posture → no broadcast hint;
    * AQE picks broadcast at small sf and shuffle-hash at scale. */
  val q3: GQuery = GQuery(
    "q3_shipping_priority",
    (s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < ts("1998-03-15 00:00:00"))
      val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > ts("1998-03-15 00:00:00"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate").cast("date").as("o_orderdate"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },
    Some("""
      SELECT l_orderkey,
             sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue,
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

  // ---------------------------------------------------------------- Q4
  /** Q4 order priority check, adapted: no l_commitdate/l_receiptdate, so
    * "late" means a lineitem shipped > 60 days after the order date.
    * EXISTS → left-semi join on orderkey. */
  val q4: GQuery = GQuery(
    "q4_order_priority",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1996-04-01 00:00:00"))
      val l = Tables.lineitem(s, dir)
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q5
  /** Q5 local supplier volume: 6-way join (region/nation broadcast dims,
    * AQE decides the rest), revenue per nation for ASIA, order year 1996.
    * The c_nationkey = s_nationkey "local" constraint is the spec's. */
  val q5: GQuery = GQuery(
    "q5_local_supplier",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1997-01-01 00:00:00"))
      val l = Tables.lineitem(s, dir)
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(revenue).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""
      SELECT n_name, sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""),
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
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))
    },
    Some("""
      SELECT sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q7
  /** Q7 volume shipping between NATION_1 and NATION_2 (either direction):
    * disjunctive nation-pair predicate, ship-year extract, 1996-1997. */
  val q7: GQuery = GQuery(
    "q7_volume_shipping",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1998-01-01 00:00:00"))
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val su = Tables.supplier(s, dir)
      val n1 = Tables.nation(s, dir).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir).select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(dsum(revenue).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some("""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
      FROM lineitem, orders, customer, supplier, nation n1, nation n2
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND l_suppkey = s_suppkey
        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
             (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q8
  /** Q8 market share of NATION_3 suppliers in ASIA for ECONOMY parts,
    * order years 1995-1996: conditional agg sum(case)/sum over 7-way join. */
  val q8: GQuery = GQuery(
    "q8_market_share",
    (s, dir) => {
      val p = Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= ts("1995-01-01 00:00:00") &&
          col("o_orderdate") <= ts("1996-12-31 00:00:00"))
      val c = Tables.customer(s, dir)
      val su = Tables.supplier(s, dir)
      val n1 = Tables.nation(s, dir).select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
      val n2 = Tables.nation(s, dir).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", cents(revenue)).otherwise(lit(0L))).cast("double")
            / sum(cents(revenue)).cast("double"),
          6).as("mkt_share"))
        .orderBy(col("o_year"))
    },
    Some("""
      SELECT year(o_orderdate) AS o_year,
             round(CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                            THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
                            ELSE 0 END) AS DOUBLE)
                   / CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE), 6) AS mkt_share
      FROM lineitem, part, orders, customer, supplier, nation n1, nation n2, region
      WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey AND l_suppkey = s_suppkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND s_nationkey = n2.n_nationkey
        AND r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                            AND TIMESTAMP '1996-12-31 00:00:00'
      GROUP BY 1
      ORDER BY 1"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q9
  /** Q9 product-type profit, adapted: no ps_supplycost → unit cost is
    * 10% of p_retailprice; parts matched on '%red%' ('green' absent from
    * this testdata's p_name domain). Profit per supplier-nation per
    * order-year. */
  val q9: GQuery = GQuery(
    "q9_profit",
    (s, dir) => {
      val p = Tables.part(s, dir).filter(col("p_name").like("%red%"))
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val amount = revenue - col("p_retailprice") * lit(0.1) * col("l_quantity")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(dsum(amount).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some("""
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             sum(CAST(floor((l_extendedprice * (1 - l_discount) - p_retailprice * 0.1 * l_quantity) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_profit
      FROM lineitem, part, supplier, orders, nation
      WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%red%'
      GROUP BY 1, 2
      ORDER BY 1, 2 DESC"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q10
  /** Q10 returned items: customers who returned goods ('R') for orders in
    * 1996Q1, revenue per customer, top 20. No c_address/phone/comment →
    * output keeps the columns the schema has. */
  val q10: GQuery = GQuery(
    "q10_returned_items",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1996-04-01 00:00:00"))
      val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      val n = Tables.nation(s, dir)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(dsum(revenue).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""
      SELECT c_custkey, c_name, c_acctbal, n_name,
             sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND c_nationkey = n_nationkey AND l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1, 2, 3, 4
      ORDER BY revenue DESC, c_custkey
      LIMIT 20"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q11
  /** Q11 important stock, adapted: no partsupp → a part's "stock value"
    * for NATION_5's suppliers is the discounted revenue of their lineitems.
    * HAVING against a scalar subquery (0.001 share of the total). The
    * total is computed once and cross-joined as a broadcast single row. */
  val q11: GQuery = GQuery(
    "q11_important_stock",
    (s, dir) => {
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir).filter(col("n_name") === "NATION_5")
      val l = Tables.lineitem(s, dir)
      val filtered = l
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      val perPart = filtered.groupBy(col("l_partkey"))
        .agg(sum(cents(revenue)).as("raw_cents"))
      val total = filtered.agg(sum(cents(revenue)).as("total_cents"))
      perPart.crossJoin(broadcast(total))
        .filter(col("raw_cents").cast("double") > col("total_cents").cast("double") * 0.001)
        .select(col("l_partkey"), (col("raw_cents") / lit(100.0)).as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },
    Some("""
      SELECT l_partkey,
             sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS value
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_5'
      GROUP BY l_partkey
      HAVING CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE) >
             (SELECT CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE) * 0.001
              FROM lineitem, supplier, nation
              WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
                AND n_name = 'NATION_5')
      ORDER BY value DESC, l_partkey"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q12
  /** Q12 shipping class, adapted: no l_shipmode → quantity classes
    * (SMALL/MEDIUM/LARGE); counts of high- vs low-priority orders per
    * class for lineitems shipped in 1997. CASE-bucket conditional agg. */
  val q12: GQuery = GQuery(
    "q12_priority_class",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
          col("l_shipdate") < ts("1998-01-01 00:00:00"))
      val qclass = when(col("l_quantity") < 10, "SMALL")
        .when(col("l_quantity") < 30, "MEDIUM").otherwise("LARGE")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(qclass.as("qty_class"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(col("qty_class"))
    },
    Some("""
      SELECT CASE WHEN l_quantity < 10 THEN 'SMALL'
                  WHEN l_quantity < 30 THEN 'MEDIUM'
                  ELSE 'LARGE' END AS qty_class,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1
      ORDER BY 1"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q13
  /** Q13 customer order-count distribution: left outer join (orders
    * filtered to non-urgent — stands in for the spec's comment filter),
    * count per customer, then distribution of counts. Two shuffles by
    * construction (custkey, then count). */
  val q13: GQuery = GQuery(
    "q13_customer_distribution",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderpriority") =!= "1-URGENT")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q14
  /** Q14 promo revenue share for 1997-09: conditional revenue share over
    * the part join (p_type = 'PROMO' — single-word type domain here). */
  val q14: GQuery = GQuery(
    "q14_promo_revenue",
    (s, dir) => {
      val p = Tables.part(s, dir)
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1997-09-01 00:00:00") &&
          col("l_shipdate") < ts("1997-10-01 00:00:00"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg(round(
          lit(100.0) * sum(when(col("p_type") === "PROMO", cents(revenue)).otherwise(lit(0L))).cast("double")
            / sum(cents(revenue)).cast("double"),
          6).as("promo_revenue"))
    },
    Some("""
      SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                    THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
                                    ELSE 0 END) AS DOUBLE)
                   / CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE), 6) AS promo_revenue
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q15
  /** Q15 top supplier: revenue per supplier for 1996Q1 (the spec's CTE
    * view), max-revenue selection via scalar aggregate + broadcast
    * (rounding BEFORE the max keeps the argmax stable across engines).
    * A global window here would funnel every supplier row through one
    * partition; the scalar max is partial+final and broadcasts 1 row. */
  val q15: GQuery = GQuery(
    "q15_top_supplier",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1996-04-01 00:00:00"))
      val rev = l.groupBy(col("l_suppkey"))
        .agg((sum(cents(revenue)) / lit(100.0)).as("total_revenue"))
      val su = Tables.supplier(s, dir)
      val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("max_revenue"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    Some("""
      WITH revenue AS (
        SELECT l_suppkey,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier, revenue
      WHERE s_suppkey = l_suppkey
        AND total_revenue = (SELECT max(total_revenue) FROM revenue)
      ORDER BY s_suppkey"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q16
  /** Q16 parts/supplier count, adapted: no partsupp → the part↔supplier
    * relation is distinct (l_partkey, l_suppkey); the spec's
    * "customer complaints" NOT IN filter becomes s_acctbal < 0. */
  val q16: GQuery = GQuery(
    "q16_parts_supplier_cnt",
    (s, dir) => {
      val p = Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 9, 17, 25, 33, 41, 49))
      val link = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val badSupp = Tables.supplier(s, dir).filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      link.join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },
    Some("""
      SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) link, part
      WHERE p_partkey = l_partkey
        AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        AND p_size IN (1, 9, 17, 25, 33, 41, 49)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q17
  /** Q17 small-quantity revenue, adapted: no p_container → Brand#3 parts
    * of size ≤ 10. Correlated avg-per-part subquery expressed as an
    * aggregate joined back on partkey. */
  val q17: GQuery = GQuery(
    "q17_small_qty_revenue",
    (s, dir) => {
      val p = Tables.part(s, dir)
        .filter(col("p_brand") === "Brand#3" && col("p_size") <= 10)
      val l = Tables.lineitem(s, dir)
      // exact-cents average (sum of integer cents / 100 / count) so the
      // cut-off is bit-identical across engines regardless of
      // accumulation order — plain avg() is partial+final in Spark but
      // sequential in DuckDB
      val avgQty = l.groupBy(col("l_partkey").as("a_partkey"))
        .agg((sum(cents(col("l_quantity"))) / lit(100.0) / count(lit(1)) * lit(0.2))
          .as("qty_cut"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(avgQty, col("l_partkey") === col("a_partkey"))
        .filter(col("l_quantity") < col("qty_cut"))
        .agg(round(sum(cents(col("l_extendedprice"))) / lit(100.0) / 7.0, 2).as("avg_yearly"))
    },
    Some("""
      SELECT round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 / 7.0, 2) AS avg_yearly
      FROM lineitem, part,
           (SELECT l_partkey AS a_partkey,
                   sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0 / count(*) * 0.2 AS qty_cut
            FROM lineitem GROUP BY l_partkey) a
      WHERE p_partkey = l_partkey AND a_partkey = l_partkey
        AND p_brand = 'Brand#3' AND p_size <= 10
        AND l_quantity < qty_cut"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q18
  /** Q18 large orders: orders whose total quantity exceeds 250 (sized to
    * this data's per-order line distribution; spec uses 300), joined back
    * to customer, top 100 by o_totalprice. */
  val q18: GQuery = GQuery(
    "q18_large_orders",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      val big = l.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 250)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_orderdate"),
          col("o_totalprice"), money(col("sum_qty")).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    Some("""
      SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
             o_totalprice, round(sum_qty, 2) AS sum_qty
      FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250) big,
           orders, customer
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q19
  /** Q19 discounted revenue: OR-of-ANDs join predicate over brand/size/
    * quantity (no p_container in this schema). The equi-key (partkey)
    * stays conjunctive so the join is hash-based with the disjunction as
    * a residual filter — not a cartesian. */
  val q19: GQuery = GQuery(
    "q19_discounted_revenue",
    (s, dir) => {
      val p = Tables.part(s, dir)
      val l = Tables.lineitem(s, dir)
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#24" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 40)))
        .agg(dsum(revenue).as("revenue"))
    },
    Some("""
      SELECT sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND ((p_brand = 'Brand#2'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 20)
          OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
          OR (p_brand = 'Brand#24' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40))"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q20
  /** Q20 excess suppliers, adapted: no partsupp/availqty → a supplier
    * qualifies if, for some 'small%' part, they shipped more than half of
    * that part's total 1996 quantity. Nested aggregation + left-semi
    * chain (supplier ← qualifying pairs ← per-part totals). */
  val q20: GQuery = GQuery(
    "q20_excess_suppliers",
    (s, dir) => {
      val l96 = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00"))
      val smallParts = Tables.part(s, dir).filter(col("p_name").like("small%"))
        .select(col("p_partkey"))
      val pairQty = l96.join(smallParts, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("pair_qty"))
      val partQty = pairQty.groupBy(col("l_partkey").as("t_partkey"))
        .agg(sum(col("pair_qty")).as("part_qty"))
      val qualifying = pairQty
        .join(partQty, col("l_partkey") === col("t_partkey"))
        .filter(col("pair_qty") > col("part_qty") * 0.5)
        .select(col("l_suppkey")).distinct()
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir).filter(col("n_name") === "NATION_7")
      su.join(broadcast(n), col("s_nationkey") === col("n_nationkey"), "left_semi")
        .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    },
    Some("""
      WITH pair_qty AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS pair_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        GROUP BY 1, 2
      ), part_qty AS (
        SELECT l_partkey AS t_partkey, sum(pair_qty) AS part_qty FROM pair_qty GROUP BY 1
      )
      SELECT s_name, s_acctbal
      FROM supplier, nation
      WHERE s_nationkey = n_nationkey AND n_name = 'NATION_7'
        AND s_suppkey IN (SELECT l_suppkey FROM pair_qty, part_qty
                          WHERE l_partkey = t_partkey AND pair_qty > part_qty * 0.5)
      ORDER BY s_name"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q21
  /** Q21 waiting suppliers, adapted: no l_receiptdate/l_commitdate → the
    * "failed to deliver" signal is l_returnflag = 'R'. For finalized ('F')
    * orders: suppliers in NATION_4 whose lineitem was returned, where the
    * order has another supplier's lineitem (EXISTS → left-semi) but no
    * OTHER supplier's returned lineitem (NOT EXISTS → left-anti). */
  val q21: GQuery = GQuery(
    "q21_waiting_suppliers",
    (s, dir) => {
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir).filter(col("n_name") === "NATION_4")
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      val l = Tables.lineitem(s, dir)
      val l1 = l.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
      val l2 = l.select(col("l_orderkey").as("l2_orderkey"), col("l_suppkey").as("l2_suppkey"))
      val l3 = l.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("l3_orderkey"), col("l_suppkey").as("l3_suppkey"))
      l1.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(l2, col("l_orderkey") === col("l2_orderkey") &&
          col("l_suppkey") =!= col("l2_suppkey"), "left_semi")
        .join(l3, col("l_orderkey") === col("l3_orderkey") &&
          col("l_suppkey") =!= col("l3_suppkey"), "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },
    Some("""
      SELECT s_name, count(*) AS numwait
      FROM lineitem l1, orders, supplier, nation
      WHERE l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
        AND l1.l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_4' AND l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 100"""),
    tags = Set("tpch"))

  // ---------------------------------------------------------------- Q22
  /** Q22 global sales opportunity, adapted: no c_phone → country code is
    * c_custkey % 7 (as text); "no orders" would be empty in this data (all
    * customers have orders) → "no orders since 1999-01-01" anti-join.
    * Scalar avg subquery over positive balances, broadcast single row. */
  val q22: GQuery = GQuery(
    "q22_global_sales",
    (s, dir) => {
      val c = Tables.customer(s, dir)
        .withColumn("cntrycode", (col("c_custkey") % 7).cast("string"))
        .filter(col("cntrycode").isin("1", "2", "3", "4", "5"))
      // exact-cents average — see q17: engine-stable cut-off
      val avgBal = c.filter(col("c_acctbal") > 0)
        .agg((sum(cents(col("c_acctbal"))) / lit(100.0) / count(lit(1))).as("avg_bal"))
      val recent = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= ts("1999-01-01 00:00:00"))
        .select(col("o_custkey"))
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("cntrycode"))
    },
    Some("""
      SELECT cntrycode, count(*) AS numcust, sum(CAST(floor((c_acctbal) * 100 + 0.5) AS BIGINT)) / 100.0 AS totacctbal
      FROM (SELECT CAST(c_custkey % 7 AS VARCHAR) AS cntrycode, c_custkey, c_acctbal
            FROM customer
            WHERE CAST(c_custkey % 7 AS VARCHAR) IN ('1','2','3','4','5')) c
      WHERE c_acctbal > (SELECT sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0 / count(*)
                         FROM customer
                         WHERE c_acctbal > 0
                           AND CAST(c_custkey % 7 AS VARCHAR) IN ('1','2','3','4','5'))
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      GROUP BY cntrycode
      ORDER BY cntrycode"""),
    tags = Set("tpch"))

  def all: Seq[GQuery] = Seq(q1, q2, q3, q4, q5, q6, q7, q8, q9, q10, q11,
    q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22)
}
