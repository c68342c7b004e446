package graft
object PlanAbMain {
  def main(args: Array[String]): Unit = {
    require(sys.env.contains("SPARK_GRAFT_NO_CONF_OVERRIDES"))
    val sfDir = "dev/sf10"
    val spark = Sessions.local("plan-ab", cpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    for (k <- Seq("q11_full_important_stock", "q14_full_promo_revenue")) {
      val q = Registry.byName(k)
      val ss = q.build(spark, sfDir).sparkSession
      for (pref <- Seq("true", "false")) {
        ss.conf.set("spark.sql.join.preferSortMergeJoin", pref)
        val df = q.build(spark, sfDir)
        df.collect()
        val p = df.queryExecution.executedPlan.toString
        def n(s: String) = ("\\b" + s).r.findAllMatchIn(p).size
        println(s"$k pref=$pref SMJ=${n("SortMergeJoin")} SHJ=${n("ShuffledHashJoin")} BHJ=${n("BroadcastHashJoin")} Sort=${n("Sort \\[")}")
      }
      ss.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    }
    spark.stop()
  }
}
