package graft.tpch

import graft.GQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

/** §2.2b — the UNADAPTED textbook TPC-H suite over [[TpchGen]]-persisted
  * parquet.
  *
  * A user of the reference (clflushopt/datafusion-tpch) generates the 8
  * full-schema tables and runs *literal* TPC-H SQL over them (its tests
  * persist `tpchgen` output and query it, src/lib.rs:335-344). The 22
  * adapted queries in [[TpchQueries]] exercise the same plan shapes over
  * the driver's reduced-schema testdata; this module closes the remaining
  * parity gap: the six queries whose adaptations had to drop `partsupp` /
  * `l_shipmode` / `l_commitdate` / `l_receiptdate` (Q2, Q4, Q11, Q12,
  * Q16, Q20) run here UNADAPTED — the query text is the TPC-H spec text,
  * and the SAME text is the DuckDB oracle (prefixed only with CTEs
  * binding the table names to the persisted parquet files).
  *
  * One engine-parity spelling, shared by the whole suite (see
  * [[TpchQueries]] scaladoc): money sums are discretized to exact BIGINT
  * cents (`floor(x*100 + 0.5)`) IDENTICALLY in both engines, because a
  * raw double sum is association-order-dependent and Spark's
  * partial+final aggregation does not sum in DuckDB's sequential order.
  * Only Q11 aggregates money here; every other query is the spec text
  * verbatim. Integer-count sums carry a `CAST(... AS BIGINT)` so
  * DuckDB's HUGEINT sum type matches Spark's int64 — a cast, not a
  * semantic change.
  *
  * Execution: both engines read the SAME parquet bytes (persisted once
  * per sf under [[Root]]), so raw-column values are bit-identical by
  * construction. The Spark side registers the files as temp views in an
  * isolated `newSession()` (no leakage into the shared Verify session)
  * and runs the literal text through `spark.sql` — this is deliberately
  * the SQL front door, proving the Catalyst SQL surface end-to-end
  * (EXISTS → semi join, NOT IN → null-aware anti join, correlated scalar
  * subqueries) rather than re-spelling the queries in the DataFrame API.
  */
object FullTpch {

  /** Persist root for the generated full-schema corpus. Dev/driver
    * environment path (the correctness gate's DuckDB process has no
    * notion of the Spark session's cwd, so the oracle text needs an
    * absolute path — same contract as the driver's /root/testdata). */
  private val Root = "/root/repo/dev/tpch_full"

  /** Bumped whenever [[TpchGen]]'s emitted bytes change, so a stale
    * persisted corpus from an earlier build is regenerated, not reused. */
  private val GenVersion = "gen-v2-spec-shipmodes"

  /** Correctness runs at sf0.01 (driver contract) — the oracle CTEs
    * bind to that corpus; at other sfs (bench) the oracle is unused. */
  private val OracleRoot = s"$Root/sf0.01"

  private def fmt(sf: Double): String =
    if (sf == sf.toLong) sf.toLong.toString else sf.toString

  /** Generate-and-persist all 8 tables at `sf` once per corpus version;
    * subsequent calls are a marker-file read. Synchronized: Verify and
    * Bench run keys sequentially, but two q*_full keys in one JVM must
    * not race the persist. */
  private[tpch] def ensurePersisted(spark: SparkSession, sf: Double): String = synchronized {
    val root = s"$Root/sf${fmt(sf)}"
    val marker = java.nio.file.Paths.get(root, "_GEN_VERSION")
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker),
        java.nio.charset.StandardCharsets.UTF_8).trim == GenVersion
    if (!fresh) {
      TpchGen.persistAll(spark, sf, root)
      java.nio.file.Files.write(marker,
        GenVersion.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    root
  }

  /** DuckDB-side prelude: bind exactly the referenced table names to the
    * persisted files (only the referenced ones — an unused CTE would
    * still be bound by the engine and fail on a missing file). */
  private def prelude(tables: Seq[String]): String =
    tables.map(t =>
      s"$t AS (SELECT * FROM read_parquet('$OracleRoot/$t.parquet/*.parquet'))")
      .mkString("WITH ", ",\n     ", "\n")

  private def key(name: String, tables: Seq[String], body: String): GQuery = GQuery(
    name,
    (s, dir) => {
      val root = ensurePersisted(s, TpchGen.sfFromDir(dir))
      val ss = s.newSession()
      TpchGen.tableNames.foreach(t =>
        ss.read.parquet(s"$root/$t.parquet").createOrReplaceTempView(t))
      ss.sql(body)
    },
    Some(prelude(tables) + body),
    tags = Set("tpch_full"))

  // -------------------------------------------------------------- Q2
  /** TPC-H Q2, spec text (params: size=15, type=%BRASS, region=EUROPE).
    * Plan: partsupp⋈part⋈supplier⋈nation⋈region + correlated min-cost
    * scalar subquery over the same join — the query the adapted
    * `q2_min_cost_supplier` could only approximate without partsupp. */
  val q2Full: GQuery = key(
    "q2_full_min_cost_supplier",
    Seq("part", "supplier", "partsupp", "nation", "region"),
    """
      SELECT s_acctbal, s_name, n_name, p_partkey, p_mfgr, s_address, s_phone, s_comment
      FROM part, supplier, partsupp, nation, region
      WHERE p_partkey = ps_partkey
        AND s_suppkey = ps_suppkey
        AND p_size = 15
        AND p_type LIKE '%BRASS'
        AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey
        AND r_name = 'EUROPE'
        AND ps_supplycost = (
          SELECT min(ps_supplycost)
          FROM partsupp, supplier, nation, region
          WHERE p_partkey = ps_partkey
            AND s_suppkey = ps_suppkey
            AND s_nationkey = n_nationkey
            AND n_regionkey = r_regionkey
            AND r_name = 'EUROPE')
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100""")

  // -------------------------------------------------------------- Q4
  /** TPC-H Q4, spec text (window 1993-07-01 +3mo): the real
    * l_commitdate < l_receiptdate lateness predicate the adapted q4 had
    * to re-express via shipdate. EXISTS → left-semi join. */
  val q4Full: GQuery = key(
    "q4_full_order_priority",
    Seq("orders", "lineitem"),
    """
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= DATE '1993-07-01'
        AND o_orderdate < DATE '1993-10-01'
        AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_commitdate < l_receiptdate)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")

  // -------------------------------------------------------------- Q11
  /** TPC-H Q11, spec text (nation=GERMANY, fraction=0.0001) with the
    * suite's money-cents discretization on BOTH engines (the only
    * non-verbatim spelling here — a raw double sum is association-
    * order-dependent; see module doc). */
  val q11Full: GQuery = key(
    "q11_full_important_stock",
    Seq("partsupp", "supplier", "nation"),
    """
      SELECT ps_partkey,
             CAST(sum(CAST(floor(ps_supplycost * ps_availqty * 100 + 0.5) AS BIGINT)) AS DOUBLE)
               / CAST(100 AS DOUBLE) AS value
      FROM partsupp, supplier, nation
      WHERE ps_suppkey = s_suppkey
        AND s_nationkey = n_nationkey
        AND n_name = 'GERMANY'
      GROUP BY ps_partkey
      HAVING CAST(sum(CAST(floor(ps_supplycost * ps_availqty * 100 + 0.5) AS BIGINT)) AS DOUBLE) >
        (SELECT CAST(sum(CAST(floor(ps_supplycost * ps_availqty * 100 + 0.5) AS BIGINT)) AS DOUBLE) * 0.0001
         FROM partsupp, supplier, nation
         WHERE ps_suppkey = s_suppkey
           AND s_nationkey = n_nationkey
           AND n_name = 'GERMANY')
      ORDER BY value DESC""")

  // -------------------------------------------------------------- Q12
  /** TPC-H Q12, spec text (modes MAIL+SHIP, year 1994): the real
    * shipmode/commitdate/receiptdate predicates over the generator's
    * spec-domain columns. BIGINT casts only (DuckDB sums to HUGEINT). */
  val q12Full: GQuery = key(
    "q12_full_priority_class",
    Seq("orders", "lineitem"),
    """
      SELECT l_shipmode,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
                           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey
        AND l_shipmode IN ('MAIL', 'SHIP')
        AND l_commitdate < l_receiptdate
        AND l_shipdate < l_commitdate
        AND l_receiptdate >= DATE '1994-01-01'
        AND l_receiptdate < DATE '1995-01-01'
      GROUP BY l_shipmode
      ORDER BY l_shipmode""")

  // -------------------------------------------------------------- Q16
  /** TPC-H Q16, spec text (brand 45, MEDIUM POLISHED, 8 sizes):
    * distinct-supplier counts per part attribute over partsupp, with
    * the spec's NOT IN anti-subquery (null-aware anti join in Spark). */
  val q16Full: GQuery = key(
    "q16_full_parts_supplier_cnt",
    Seq("partsupp", "part", "supplier"),
    """
      SELECT p_brand, p_type, p_size,
             count(DISTINCT ps_suppkey) AS supplier_cnt
      FROM partsupp, part
      WHERE p_partkey = ps_partkey
        AND p_brand <> 'Brand#45'
        AND p_type NOT LIKE 'MEDIUM POLISHED%'
        AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
        AND ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier
          WHERE s_comment LIKE '%Customer%Complaints%')
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")

  // -------------------------------------------------------------- Q20
  /** TPC-H Q20, spec text (forest%, 1994, CANADA): the nested
    * IN-chain over partsupp with the correlated half-of-shipped-
    * quantity availability threshold the adapted q20 had to fake from
    * lineitem share. */
  val q20Full: GQuery = key(
    "q20_full_excess_suppliers",
    Seq("supplier", "nation", "partsupp", "part", "lineitem"),
    """
      SELECT s_name, s_address
      FROM supplier, nation
      WHERE s_suppkey IN (
          SELECT ps_suppkey
          FROM partsupp
          WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'forest%')
            AND ps_availqty > (
              SELECT 0.5 * sum(l_quantity)
              FROM lineitem
              WHERE l_partkey = ps_partkey
                AND l_suppkey = ps_suppkey
                AND l_shipdate >= DATE '1994-01-01'
                AND l_shipdate < DATE '1995-01-01'))
        AND s_nationkey = n_nationkey
        AND n_name = 'CANADA'
      ORDER BY s_name""")

  def all: Seq[GQuery] = Seq(q2Full, q4Full, q11Full, q12Full, q16Full, q20Full)
}
