package graft

/** Manual scale sanity (not a test): `sbt "Test/runMain graft.GenScaleMain"`. */
object GenScaleMain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("gen-scale", cpus = 8)
    val t0 = System.nanoTime()
    graft.tpch.TpchGen.lineitem(spark, 1.0, numParts = 16)
      .write.format("noop").mode("overwrite").save()
    println(f"lineitem sf1 generation+scan: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val t1 = System.nanoTime()
    val cnt = graft.tpch.TpchGen.lineitem(spark, 1.0, numParts = 16).count()
    println(f"rows: $cnt (count in ${(System.nanoTime() - t1) / 1e9}%.1f s)")
    spark.stop()
  }
}
