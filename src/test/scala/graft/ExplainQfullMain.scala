package graft
object ExplainQfullMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("dev/sf10")
    val spark = Sessions.local("explain", cpus = 8)
    spark.sparkContext.setLogLevel("ERROR")
    for (k <- args.drop(1)) {
      println(s"===== $k")
      val df = Registry.byName(k).build(spark, sfDir)
      df.write.format("noop").mode("overwrite").save() // let AQE finalize
      println(df.queryExecution.executedPlan.toString.take(7000))
    }
    spark.stop()
  }
}
