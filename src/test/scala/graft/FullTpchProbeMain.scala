package graft

/** Decomposes a q*_full bench line into (per-call setup) vs (plan+exec)
  * — manual measurement tool, not a test:
  *
  * {{{
  * sbt "Test/runMain graft.FullTpchProbeMain dev/sf1 q15_full_top_supplier"
  * }}}
  *
  * `full` times the registry build exactly as Bench does (newSession +
  * 8 temp-view registrations + parse + plan + execute); `exec` reuses
  * the DataFrame from one build and times only re-execution (plan +
  * execute — Catalyst re-optimizes per action, codegen is JVM-cached).
  * The gap is the catalog-setup cost a real deployment pays once per
  * session, not once per query. */
object FullTpchProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("dev/sf1")
    val keys = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("q6_full_forecast_revenue", "q15_full_top_supplier",
        "q17_full_small_qty_revenue", "q22_full_global_sales"))
    val n = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = Sessions.local("tpch-probe", cpus = 32)
    spark.sparkContext.setLogLevel("ERROR")

    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // JVM warm-up
    noop(Registry.byName(keys.head).build(spark, sfDir))
    println("default bloomFilter.enabled = " + scala.util.Try(
      spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")).getOrElse("<unset>"))
    def f(ts: Seq[Double]) = ts.map(x => f"$x%.3f").mkString("[", ",", "]")
    for (k <- keys) {
      val q = Registry.byName(k)
      val full = (1 to n).map(_ => t(noop(q.build(spark, sfDir)))).sorted
      val df = q.build(spark, sfDir)
      val exec = (1 to n).map(_ => t(noop(df))).sorted
      println(s"$k full=${f(full)} exec=${f(exec)}")
      // conf A/B on the (memoized) sub-session the q_full plans bind to
      val ss = df.sparkSession
      for ((label, confs) <- Seq(
        "aqe_off" -> Seq("spark.sql.adaptive.enabled" -> "false"),
        "sp8" -> Seq("spark.sql.adaptive.enabled" -> "true",
          "spark.sql.shuffle.partitions" -> "8"),
        "aqe_off_sp8" -> Seq("spark.sql.adaptive.enabled" -> "false",
          "spark.sql.shuffle.partitions" -> "8"),
        "bloom_off" -> Seq("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false"))) {
        confs.foreach { case (c, v) => ss.conf.set(c, v) }
        val ts = (1 to n).map(_ => t(noop(q.build(spark, sfDir)))).sorted
        println(s"$k $label=${f(ts)}")
      }
      ss.conf.set("spark.sql.adaptive.enabled", "true")
      ss.conf.set("spark.sql.shuffle.partitions", "32")
      scala.util.Try(ss.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled"))
    }
    spark.stop()
  }
}
