package graft

import graft.tpch.TpchGen

/** The SQL ergonomics surface of the generator: one call registers
  * every generated table as a view and plain `spark.sql` works — the
  * Spark equivalent of the reference's register-then-query demo. Runs
  * at sf=0.02, which exists in NO testdata dir, so every expectation
  * below is computed from the generator's own published layout (row
  * scaling, sparse orderkey, okey%7 line counts), not read from
  * parquet. */
class GenSqlSpec extends SparkSpecBase {

  private val SF = 0.02

  /** Replay of the row-count layout in plain Scala: order ids are
    * 0..(1.5M·sf), okey = (i/8)·32 + i%8 + 1, lines per order =
    * okey%7 + 1. */
  private def expectedOrders: Long = (1500000 * SF).toLong
  private def expectedLines: Long =
    (0L until expectedOrders).map { i =>
      val okey = i / 8 * 32 + i % 8 + 1
      okey % 7 + 1
    }.sum

  test("q1 pricing summary runs end-to-end over registerAll views at a non-testdata sf") {
    val r = TpchGen.sql(spark, SF, """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2)                              AS sum_qty,
             round(sum(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc_price,
             round(avg(l_discount), 4)                              AS avg_disc,
             count(*)                                               AS count_order
      FROM lineitem
      WHERE l_shipdate <= date'1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
    try {
      val rows = r.collect()
      // 3 returnflags × 2 linestatuses, every measure positive
      assert(rows.length == 6, s"expected 6 groups, got ${rows.length}")
      assert(rows.map(_.getString(0)).toSet == Set("A", "N", "R"))
      assert(rows.map(_.getString(1)).toSet == Set("F", "O"))
      rows.foreach { row =>
        assert(row.getDouble(2) > 0 && row.getDouble(3) > 0 && row.getLong(5) > 0)
      }
      // the WHERE keeps shipdates <= cutoff: group totals must sum to
      // strictly fewer lines than the full table
      val kept = rows.map(_.getLong(5)).sum
      assert(kept > 0 && kept < expectedLines)
    } finally {
      TpchGen.tableNames.foreach(spark.catalog.dropTempView)
    }
  }

  test("persistAll round trip: write parquet, read back via Tables, run q1") {
    val dir = java.nio.file.Files.createTempDirectory("graft-persist").toString
    try {
      TpchGen.persistAll(spark, SF, dir)
      // the persisted layout is a drop-in testdata dir: the Tables
      // accessors and any registry query run against it unchanged
      assert(graft.sources.Tables.lineitem(spark, dir).count() == expectedLines)
      assert(graft.sources.Tables.orders(spark, dir).count() == expectedOrders)
      assert(graft.sources.Tables.part(spark, dir).count() == (200000 * SF).toLong)
      // parquet round trip is value-exact: read-back lineitem must be
      // MULTISET-identical to the generator plan (doubles/dates
      // binary-stable) — exceptAll in both directions, so duplicate-
      // row multiplicity differences fail too, not just missing rows
      val back = graft.sources.Tables.lineitem(spark, dir)
      val gen = TpchGen.lineitem(spark, SF)
      val diff = back.exceptAll(gen).count() + gen.exceptAll(back).count()
      assert(diff == 0, s"$diff read-back rows differ from the generator")
      val q1 = Registry.byName("q1_pricing_summary").build(spark, dir).collect()
      assert(q1.length == 6, s"expected 6 pricing-summary groups, got ${q1.length}")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("registered view row counts follow the sf scaling and sparse-key layout") {
    TpchGen.registerAll(spark, SF)
    try {
      def cnt(t: String): Long = spark.sql(s"SELECT count(*) FROM $t").head().getLong(0)
      assert(cnt("region") == 5 && cnt("nation") == 25)
      assert(cnt("supplier") == (10000 * SF).toLong)
      assert(cnt("customer") == (150000 * SF).toLong)
      assert(cnt("part") == (200000 * SF).toLong)
      assert(cnt("partsupp") == (200000 * SF).toLong * 4)
      assert(cnt("orders") == expectedOrders)
      assert(cnt("lineitem") == expectedLines)
    } finally {
      TpchGen.tableNames.foreach(spark.catalog.dropTempView)
    }
  }
}
