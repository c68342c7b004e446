package graft

/** Round-15 A/B probe: re-measure the r14 join-strategy finding
  * (shuffled-hash vs sort-merge for q11/q14 at sf10) on the current
  * host, exec-only, ARMS INTERLEAVED so box drift hits both equally.
  * Run with SPARK_GRAFT_NO_CONF_OVERRIDES=1 so the registry build
  * itself binds the DEFAULT sub-session; the SHJ arm then flips
  * preferSortMergeJoin on that same session and rebuilds (new plans,
  * same catalog — the same mechanism the r14 probe used).
  *
  * Usage: Test/runMain graft.ShjAbMain <sfDir> <k1,k2> [rounds]
  */
object ShjAbMain {
  def main(args: Array[String]): Unit = {
    require(sys.env.contains("SPARK_GRAFT_NO_CONF_OVERRIDES"),
      "set SPARK_GRAFT_NO_CONF_OVERRIDES=1 so the default arm is really default")
    val sfDir = args.headOption.getOrElse("dev/sf10")
    val keys = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("q11_full_important_stock", "q14_full_promo_revenue"))
    val rounds = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = Sessions.local("shj-ab", cpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(Registry.byName(keys.head).build(spark, sfDir)) // JVM warm-up
    def f(ts: Seq[Double]) = ts.sorted.map(x => f"$x%.3f").mkString("[", ",", "]")
    for (k <- keys) {
      val q = Registry.byName(k)
      val ss = q.build(spark, sfDir).sparkSession // the memoized sub-session
      val smj = collection.mutable.Buffer[Double]()
      val shj = collection.mutable.Buffer[Double]()
      for (_ <- 1 to rounds) {
        ss.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        smj += t(noop(q.build(spark, sfDir)))
        ss.conf.set("spark.sql.join.preferSortMergeJoin", "false")
        shj += t(noop(q.build(spark, sfDir)))
      }
      ss.conf.set("spark.sql.join.preferSortMergeJoin", "true")
      println(s"$k smj=${f(smj.toSeq)} shj=${f(shj.toSeq)}")
    }
    spark.stop()
  }
}
