package graft

/** Dev probe: print the executed plan of one registry key over a given
  * sf dir (companion to ExplainQfullMain, which covers only the q_full
  * SQL texts). Usage: Test/runMain graft.ExplainKeyMain <key> <sfDir>
  */
object ExplainKeyMain {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.local()
    try {
      val df = Registry.byName(key).build(spark, sfDir)
      // materialize so AQE finalizes the executed plan
      df.write.format("noop").mode("overwrite").save()
      println(df.queryExecution.executedPlan.toString)
    } finally spark.stop()
  }
}
