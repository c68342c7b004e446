package graft

import org.apache.spark.sql.functions.{col, count, lit}

/** A/B-measure persisting the shingle frame inside `dedup_minhash_lsh`
  * (manual tool, not a test):
  *
  * {{{
  * sbt "Test/runMain graft.MinhashAbMain /root/testdata/sf0.1 5"
  * }}}
  *
  * The shingle frame `sh` feeds four consumers (signature agg, per-doc
  * count, and both sides of the Jaccard verify join). Dedup.scala keeps
  * it UNPERSISTED on the strength of an sf0.1 A/B; the round-10 verdict
  * asked for the same measurement at sf1, where the 4-consumer
  * recompute profile could flip. Runs interleave A and B so box drift
  * hits both arms equally; min is the estimator (same as Bench). */
object MinhashAbMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Sessions.local("minhash-ab", cpus = 32)
    spark.sparkContext.setLogLevel("ERROR")

    def once(persist: Boolean): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val sh0 = dedup.Dedup.shingles(sources.Tables.documents(spark, sfDir))
      val sh = if (persist) sh0.persist() else sh0
      val nDf = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      dedup.Dedup
        .verifiedJaccard(dedup.Dedup.bandCandidates(dedup.Dedup.minhashBands(sh)), sh, nDf)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      if (persist) sh.unpersist()
      dt
    }
    once(persist = false) // session warm-up, not recorded
    val runs = (1 to n).flatMap(_ => Seq(false -> once(false), true -> once(true)))
    def stats(p: Boolean): Seq[Double] = runs.collect { case (`p`, t) => t }.sorted
    val (a, b) = (stats(false), stats(true))
    def f(ts: Seq[Double]) =
      f"min ${ts.head}%.2f med ${ts(ts.size / 2)}%.2f max ${ts.last}%.2f"
    println(s"unpersisted: ${f(a)}")
    println(s"persisted:   ${f(b)}")
    println(f"verdict: ${if (a.head <= b.head) "unpersisted" else "persisted"}%s wins by ${math.abs(a.head - b.head)}%.2f s at $sfDir")
    spark.stop()
  }
}
