package graft

import graft.tpch.FullTpch

/** Pins the per-key join-strategy overrides claimed from the round-14
  * sf10 A/B (dev/BENCH_NOTES.md: q11 0.78→0.51 s, q14 1.81→0.51 s
  * under shuffled-hash; q22 regressed and q2 went unstable under the
  * same flip as a GLOBAL default, which is why the override is routed
  * per key through FullTpch's memoized sub-sessions instead of
  * changing the session default).
  *
  * Two pins: (a) the ROUTING — exactly the four SMJ-sort-bound keys
  * carry the override, and each name still resolves in the registry
  * (a renamed key would silently drop its conf); (b) the PLAN — under
  * the override, at the no-broadcast scale shape (auto-broadcast off,
  * the 100 TB regime where no join side fits a broadcast), both query
  * texts plan ShuffledHashJoin where the default session plans
  * SortMergeJoin. Correctness of the overridden keys is the driver
  * gate's job (same oracle, same text — only the physical strategy
  * moves). */
class FullTpchConfSpec extends SparkSpecBase {

  test("exactly the four SMJ-sort-bound q_full keys carry the shuffled-hash override") {
    assert(FullTpch.confOverrides.keySet == Set(
      "q11_full_important_stock", "q11_full_important_stock_v2",
      "q14_full_promo_revenue", "q14_full_promo_revenue_v2"))
    FullTpch.confOverrides.values.foreach(c =>
      assert(c == Seq("spark.sql.join.preferSortMergeJoin" -> "false")))
    FullTpch.confOverrides.keys.foreach(k =>
      assert(Registry.byName.contains(k), s"override names a dead key: $k"))
  }

  test("the override turns q11/q14's fact joins shuffled-hash at the no-broadcast shape") {
    // the sf10 shape the A/B measured: no join side fits a broadcast
    // (threshold floored at 1KB — NOT -1, which would also zero
    // Spark's SHJ eligibility bound, canBuildLocalHashMap = size <
    // threshold × partitions), and the selection runs on AQE's RUNTIME
    // sizes (the projected build sides are far under the bound; static
    // file-size stats can't see the projection), so the pin reads the
    // AQE-final executed plan after materialization — the plan the
    // claimed sf10 seconds actually ran
    val root = FullTpch.ensurePersisted(spark, 0.001)
    val noBroadcast = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "1KB",
      "spark.sql.shuffle.partitions" -> "200")
    def finalPlan(confs: Seq[(String, String)], k: String): String = {
      val df = FullTpch.sessionFor(spark, root, confs ++ noBroadcast)
        .sql(FullTpch.sparkSqlOf(k))
      df.collect() // materialize THIS queryExecution so AQE finalizes it
      df.queryExecution.executedPlan.toString
    }
    for (k <- Seq("q11_full_important_stock", "q14_full_promo_revenue")) {
      val overridden = finalPlan(FullTpch.confOverrides(k), k)
      assert(overridden.contains("ShuffledHashJoin"),
        s"$k did not plan SHJ under the override:\n${overridden.take(3000)}")
      val default = finalPlan(Nil, k)
      assert(default.contains("SortMergeJoin"),
        s"$k default no longer SMJ — the override may be obsolete:\n${default.take(3000)}")
    }
  }
}
