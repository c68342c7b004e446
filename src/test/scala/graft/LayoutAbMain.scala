package graft

/** Interleaved raw-vs-bucketed A/B for a layout consumer pair — the
  * same drift-cancelling instrument as ShjAbMain (round 15: the box's
  * steal storms make sequential arms incomparable; interleaving hits
  * both arms with the same weather).
  *
  * Usage: Test/runMain graft.LayoutAbMain <sfDir> <rawKey,bucketedKey>[;pair2] [rounds]
  */
object LayoutAbMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("dev/sf10")
    val pairs = args.lift(1).getOrElse(
      "q5_full_local_supplier,q5_full_bucketed")
      .split(";").toSeq.map { p => val Array(a, b) = p.split(","); (a, b) }
    val rounds = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = Sessions.local("layout-ab", cpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def noop(k: String): Unit = {
      // Bench's cold-run discipline: q11_full_bucketed persists its
      // per-group frame (Caches-tracked); without the release, rounds
      // 2..n would find round 1's cache by canonicalized-plan lookup
      // and time a warm read instead of the build
      Caches.release()
      Registry.byName(k).build(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    for ((raw, bkt) <- pairs) {
      noop(raw); noop(bkt) // warm-up + pay the one-time layout write
      val a = collection.mutable.Buffer[Double]()
      val b = collection.mutable.Buffer[Double]()
      for (_ <- 1 to rounds) { a += t(noop(raw)); b += t(noop(bkt)) }
      def f(ts: Seq[Double]) = ts.sorted.map(x => f"$x%.3f").mkString("[", ",", "]")
      println(s"$raw=${f(a.toSeq)} $bkt=${f(b.toSeq)}")
    }
    spark.stop()
  }
}
