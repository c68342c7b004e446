package graft

import org.apache.spark.sql.functions.col

/** Times the stages of the dup-cluster chain separately (manual tool):
  *
  * {{{
  * sbt "Test/runMain graft.DedupProbeMain /root/testdata/sf0.1 3"
  * }}}
  *
  * Stages: signatures (simhash + bands), pairs (banding + capped
  * candidates + hamming verify), full componentsFrame (adds the
  * window-contraction + RDD fixpoint + label join-back). The deltas
  * locate the cost — r13 verdict asked whether the 5.7 s cold build
  * lives in the banding chain or the iterate loop. */
object DedupProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Sessions.local("dedup-probe", cpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    def t(body: => Unit): Double = {
      Caches.release(); Caches.releaseMemos()
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = sources.Tables.documents(spark, sfDir)
    noop(dedup.Dedup.simhashSignatures(docs)) // warm-up
    def f(ts: Seq[Double]) = ts.map(x => f"$x%.3f").mkString("[", ",", "]")
    println("sigs  " + f((1 to n).map(_ => t(noop(dedup.Dedup.simhashSignatures(docs)))).sorted))
    println("pairs " + f((1 to n).map(_ => t(noop(dedup.Dedup.simhashPairsFrom(dedup.Dedup.simhashSignatures(docs))))).sorted))
    println("comps " + f((1 to n).map(_ =>
      t(noop(dedup.Dedup.componentsFrame(spark, sfDir)))).sorted))
    spark.stop()
  }
}
