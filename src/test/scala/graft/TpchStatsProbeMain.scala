package graft

/** A/B: temp views over raw parquet (the suite's default) vs ANALYZEd
  * external catalog tables with CBO + join reorder — the preparation a
  * production warehouse runs (manual tool, not a test):
  *
  * {{{
  * sbt "Test/runMain graft.TpchStatsProbeMain dev/sf10 q11_full_important_stock,q14_full_promo_revenue 3"
  * }}}
  *
  * Answers whether the join-heavy q_full family's residual gap vs the
  * DuckDB baseline (BENCH_NOTES round 14) is missing STATISTICS —
  * DuckDB always has exact row counts + zone maps; Spark's temp views
  * see only file sizes, so join order and build-side choices fly
  * blind. If ANALYZE + CBO closes the gap, catalog registration (not
  * per-query tuning) is the production answer. */
object TpchStatsProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("dev/sf10")
    val keys = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq(
      "q11_full_important_stock", "q14_full_promo_revenue",
      "q2_full_min_cost_supplier", "q21_full_waiting_suppliers",
      "q5_full_local_supplier", "q22_full_global_sales"))
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Sessions.local("tpch-stats-probe", cpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def f(ts: Seq[Double]) = ts.map(x => f"$x%.3f").mkString("[", ",", "]")

    // arm A: the registry path (temp views, no stats)
    noop(Registry.byName(keys.head).build(spark, sfDir)) // warm-up + persist
    // arm B: external catalog tables + full column stats + CBO
    val root = tpch.FullTpch.ensurePersisted(spark, tpch.TpchGen.sfFromDir(sfDir))
    val ss = spark.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    ss.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    ss.conf.set("spark.sql.statistics.histogram.enabled", "true")
    val t0 = System.nanoTime()
    tpch.TpchGen.tableNames.foreach { tn =>
      ss.sql(s"DROP TABLE IF EXISTS $tn")
      ss.sql(s"CREATE TABLE $tn USING parquet LOCATION '$root/$tn.parquet'")
      ss.sql(s"ANALYZE TABLE $tn COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    println(f"analyze wall: ${(System.nanoTime() - t0) / 1e9}%.1f s (one-time catalog prep)")

    for (k <- keys) {
      val q = Registry.byName(k)
      val views = (1 to n).map(_ => t(noop(q.build(spark, sfDir)))).sorted
      val sql = tpch.FullTpch.sparkSqlOf(k)
      val stats = (1 to n).map(_ => t(noop(ss.sql(sql)))).sorted
      println(s"$k views=${f(views)} stats_cbo=${f(stats)}")
    }
    spark.stop()
  }
}
