package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B for [[graft.plans.TopKRewrite]] (manual
  * tool, not a test — the BENCH_NOTES discipline: no perf claim
  * without an interleaved A/B in one JVM).
  *
  * Arms share ONE SparkContext and differ only in the session conf
  * flag: A = window plan (rule off), B = identical user code with the
  * rewrite on. Two group-cardinality regimes, because they stress
  * different parts of the window plan: `l_returnflag` (3 groups — the
  * exchange collapses to 3 partitions and the sort is single-threaded
  * per group) and `l_suppkey` (sf·10k groups — parallel but still
  * sorts the full table). Each trial asserts result equality between
  * arms before any number is trusted.
  *
  * {{{ sbt "Test/runMain graft.TopKAbMain dev/sf1 5" }}}
  */
object TopKAbMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "dev/sf1"
    val n = if (args.length > 1) args(1).toInt else 5
    val spark = Sessions.local("topk-ab", cpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    val off = spark.newSession()
    off.conf.set("spark.graft.topk.rewrite", "false")
    val on = spark.newSession()
    on.conf.set("spark.graft.topk.rewrite", "true")
    // third arm: rewrite + raised ObjectHashAggregate fallback. The
    // default (128 distinct groups per partition) sort-falls-back any
    // high-cardinality grouping — but TopKLong's buffer is bounded by
    // contract (<= 16·k bytes), so a large hash map is safe here.
    val on2 = spark.newSession()
    on2.conf.set("spark.graft.topk.rewrite", "true")
    on2.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 22).toString)

    def sentinel(): Double = {
      val t0 = System.nanoTime()
      sources.Tables.lineitem(off, sfDir)
        .filter(col("l_quantity") < 24).agg(sum(col("l_extendedprice"))).collect()
      (System.nanoTime() - t0) / 1e9
    }

    def topk(ss: SparkSession, groupCol: String, k: Int): DataFrame = {
      val w = Window.partitionBy(col("g")).orderBy(col("cents").desc, col("okey"))
      sources.Tables.lineitem(ss, sfDir)
        .select(col(groupCol).as("g"),
          coalesce(floor(col("l_extendedprice") * 100 + 0.5).cast("long"), lit(0L))
            .as("cents"),
          coalesce(col("l_orderkey"), lit(0L)).as("okey"))
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
    }

    for ((gc, k) <- Seq(("l_returnflag", 7), ("l_suppkey", 5))) {
      // plan sanity + one warm pass each, equality-checked
      val pOn = topk(on, gc, k).queryExecution.optimizedPlan.toString
      val pOff = topk(off, gc, k).queryExecution.optimizedPlan.toString
      require(pOn.contains("top_k_long"), s"$gc: rewrite did not fire")
      require(!pOff.contains("top_k_long"), s"$gc: control arm rewrote")
      val a = topk(off, gc, k).orderBy("g", "rnk").collect().map(_.toSeq).toSeq
      val b = topk(on, gc, k).orderBy("g", "rnk").collect().map(_.toSeq).toSeq
      val c = topk(on2, gc, k).orderBy("g", "rnk").collect().map(_.toSeq).toSeq
      require(a == b && a == c, s"$gc: arms disagree (${a.length}/${b.length}/${c.length} rows)")
      println(f"== $gc k=$k rows=${a.length} arms agree; warm sentinel ${sentinel()}%.3f s ==")
      val times = Array.fill(n)((0.0, 0.0, 0.0))
      for (i <- 0 until n) {
        val t0 = System.nanoTime(); topk(off, gc, k).count()
        val t1 = System.nanoTime(); topk(on, gc, k).count()
        val t2 = System.nanoTime(); topk(on2, gc, k).count()
        val t3 = System.nanoTime()
        times(i) = ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
        println(f"trial $i window=${times(i)._1}%.3f rewrite=${times(i)._2}%.3f rewriteBigHash=${times(i)._3}%.3f")
      }
      def med(xs: Array[Double]) = xs.sorted.apply(n / 2)
      val (wMed, rMed, r2Med) = (med(times.map(_._1)), med(times.map(_._2)), med(times.map(_._3)))
      println(f"$gc MEDIAN window=$wMed%.3f rewrite=$rMed%.3f rewriteBigHash=$r2Med%.3f " +
        f"ratio=${wMed / rMed}%.2f ratioBigHash=${wMed / r2Med}%.2f sentinel=${sentinel()}%.3f")
    }
    spark.stop()
  }
}
