package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall times.
  *
  * Methodology (per round-1 verdict): a session warm-up query first
  * (JVM/codegen init otherwise lands on whichever query runs first),
  * then N runs per query (min reported — least-noise estimator on a
  * shared machine), each run executing the FULL plan via a noop-format
  * write (`count()` would let Catalyst drop final projects/sorts).
  * Failures report -1 for that query and are listed in `failed`
  * without polluting the total. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(name: String): Either[String, Double] =
      try {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable => Left(e.getMessage) }

    // session warm-up: codegen, parquet footer reads, shuffle init
    runOnce("q6_forecast_revenue")

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results: Seq[(String, Either[String, Double])] = names.map { name =>
      val runs = (1 to n).map(_ => runOnce(name))
      val ok = runs.collect { case Right(t) => t }
      name -> (if (ok.nonEmpty) Right(ok.min)
               else Left(runs.collectFirst { case Left(m) => m }.getOrElse("?")))
    }
    val failed = results.collect { case (k, Left(msg)) =>
      System.err.println(s"[bench] $k FAILED: $msg"); k
    }
    val qs = results.map {
      case (k, Right(t)) => s""""$k":$t"""
      case (k, Left(_)) => s""""$k":-1"""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(t)) => t }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","n":$n,"failed":$failedJson}""")
    spark.stop()
  }
}
