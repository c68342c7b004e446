package graft

/** Materialise a complete drop-in testdata directory at any sf
  * (manual tool, not a test):
  *
  * {{{
  * sbt "Test/runMain graft.PersistSfMain 1.0 dev/sf1"
  * }}}
  *
  * Writes the 8 TPC-H tables ([[graft.tpch.TpchGen.persistAll]]) and
  * the 3 aux tables ([[graft.sources.AuxGen.persistAll]]) as
  * `dir/<table>.parquet` — the layout every [[graft.sources.Tables]]
  * accessor, registry query, Verify and Bench run against. Used to
  * produce the sf1 bench corpus (dev/BENCH_NOTES.md). */
object PersistSfMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: PersistSfMain <sf> <dir>")
    val sf = args(0).toDouble
    val dir = args(1)
    val spark = Sessions.local("persist-sf", cpus = 16)
    val t0 = System.nanoTime()
    graft.tpch.TpchGen.persistAll(spark, sf, dir, numParts = 32)
    graft.sources.AuxGen.persistAll(spark, sf, dir, numParts = 32)
    println(f"persisted sf=$sf to $dir in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
