package graft

/** Dev probe (r16 verdict #7): measure THIS HOST's per-stage floor —
  * the fixed wall-clock cost local-mode Spark pays per extra stage
  * (shuffle-exchange boundary): job scheduling, stage submit, task
  * launch and result collection for trivially small data.
  *
  * Design: a chain of `i` hash repartitions over a tiny long frame is
  * a plan with exactly `i` Exchanges (i+1 stages); data volume is
  * negligible, so wall(i) ≈ base + i·floor. The probe times i = 0..6,
  * reports each level's min-of-n, and the floor as the least-squares
  * slope over the mins. Run in a quiet window (same discipline as the
  * bench sentinels — the q6 warm probe brackets the run).
  *
  * Usage: Test/runMain graft.FloorProbeMain [rows] [nPerLevel]
  */
object FloorProbeMain {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(100000L)
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Sessions.local("floorprobe", cpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def plan(i: Int) = {
      var df = spark.range(0, rows, 1, 32).select(col("id"))
      (1 to i).foreach { r =>
        // new key per round so no exchange is elided as redundant
        df = df.repartition(32, pmod(col("id") + lit(r), lit(32)))
      }
      df
    }
    def time(i: Int): Double = {
      val t0 = System.nanoTime()
      plan(i).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // session warm-up: codegen + shuffle machinery init
    (1 to 3).foreach(_ => time(3))
    val levels = 0 to 6
    val mins = levels.map { i =>
      val ts = (1 to n).map(_ => time(i))
      val m = ts.min
      println(f"exchanges=$i  min=$m%.3f  all=${ts.map(t => f"$t%.3f").mkString("[", ",", "]")}")
      m
    }
    // least-squares slope over (i, min_i)
    val xs = levels.map(_.toDouble); val ys = mins
    val xm = xs.sum / xs.size; val ym = ys.sum / ys.size
    val slope = (xs zip ys).map { case (x, y) => (x - xm) * (y - ym) }.sum /
      xs.map(x => (x - xm) * (x - xm)).sum
    println(f"per-stage floor (ls slope over mins) = $slope%.4f s/stage; base (0-exchange) = ${mins.head}%.3f s")
    spark.stop()
  }
}
