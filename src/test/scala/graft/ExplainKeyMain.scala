package graft

/** Dev probe: print the plan of one registry key over a given sf dir
  * (companion to ExplainQfullMain, which covers only the q_full SQL
  * texts). Runs the key once (noop write) so AQE finalizes, then
  * prints either the executed plan (default) or, with mode
  * `formatted`, the `.explain("formatted")` text — the artifact the
  * optimization rounds commit under plans/rN/.
  *
  * Usage: Test/runMain graft.ExplainKeyMain <key> [sfDir] [mode]
  */
object ExplainKeyMain {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "executed"
    val spark = Sessions.local()
    try {
      val df = Registry.byName(key).build(spark, sfDir)
      // materialize so AQE finalizes the executed plan
      df.write.format("noop").mode("overwrite").save()
      if (mode == "formatted")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      else
        println(df.queryExecution.executedPlan.toString)
    } finally spark.stop()
  }
}
