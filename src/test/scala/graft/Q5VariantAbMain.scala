package graft

/** Round-15 q5 layout-arm decomposition: is the quiet-box parity the
  * customer BROADCAST build's fault? Interleaves three arms per round:
  * raw spec SQL, the shipped bucketed build (customer broadcast hint),
  * and the same build with the hint dropped (reduced fact shuffles
  * against customer instead). Usage: Test/runMain graft.Q5VariantAbMain
  * [sfDir] [rounds]
  */
object Q5VariantAbMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("dev/sf10")
    val rounds = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = Sessions.local("q5-ab", cpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val root = tpch.FullTpch.ensurePersisted(spark, tpch.TpchGen.sfFromDir(sfDir))
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // no-hint variant of Sinks.q5Bucketed's body (same layout tables,
    // via the shipped key once to materialize the layout + session)
    noop(Registry.byName("q5_full_bucketed").build(spark, sfDir))
    val ss = Registry.byName("q5_full_bucketed").build(spark, sfDir).sparkSession
    def variant(hint: Boolean): org.apache.spark.sql.DataFrame = {
      val liT = ss.catalog.listTables().collect()
        .map(_.name).filter(n => n.startsWith("graft_bktfact_ok_li")).head
      val orT = ss.catalog.listTables().collect()
        .map(_.name).filter(n => n.startsWith("graft_bktfact_ok_or")).head
      val li = ss.table(liT).select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      val ord = ss.table(orT)
        .where(col("o_orderdate") >= lit("1994-01-01").cast("date") &&
          col("o_orderdate") < lit("1995-01-01").cast("date"))
        .select(col("o_orderkey"), col("o_custkey"))
      val cents = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
        .cast("long")
      val fact = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_suppkey"), cents.as("cents"))
      val supp = ss.read.parquet(s"$root/supplier.parquet")
        .select(col("s_suppkey"), col("s_nationkey"))
      val asiaNations = ss.read.parquet(s"$root/nation.parquet")
        .join(broadcast(ss.read.parquet(s"$root/region.parquet")
          .where(col("r_name") === "ASIA").select(col("r_regionkey"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val custRaw = ss.read.parquet(s"$root/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"))
      val cust = if (hint) broadcast(custRaw) else custRaw
      fact.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .join(cust, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg((sum(col("cents")).cast("double") / 100.0).as("revenue"))
        .orderBy(desc("revenue"))
    }
    val raw = collection.mutable.Buffer[Double]()
    val hinted = collection.mutable.Buffer[Double]()
    val nohint = collection.mutable.Buffer[Double]()
    for (_ <- 1 to rounds) {
      raw += t(noop(Registry.byName("q5_full_local_supplier").build(spark, sfDir)))
      hinted += t(noop(Registry.byName("q5_full_bucketed").build(spark, sfDir)))
      nohint += t(noop(variant(hint = false)))
    }
    def f(ts: Seq[Double]) = ts.sorted.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(s"raw=${f(raw.toSeq)} bucketed_bcast=${f(hinted.toSeq)} bucketed_shuffle=${f(nohint.toSeq)}")
    spark.stop()
  }
}
