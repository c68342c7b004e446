package graft

import graft.tpch.FullTpch

/** Per-key conf routing ([[graft.tpch.FullTpch.confOverrides]] →
  * [[graft.tpch.FullTpch.sessionFor]]'s conf-tagged memoized
  * sub-sessions).
  *
  * Round 15 measured the one candidate override family AWAY: the r14
  * non-interleaved A/B's "shuffled-hash wins q11/q14 at sf10" did not
  * survive an arms-interleaved same-JVM re-run (wall parity; q11's
  * plan doesn't even change — all its joins are AQE-broadcast at
  * sf10), so the override map is pinned EMPTY here: a future entry
  * must change this spec and bring an interleaved A/B with it
  * (dev/BENCH_NOTES.md round 15). The second test keeps the MECHANISM
  * proven live — conf-tagged sessions really do re-plan the same spec
  * text under different physical-strategy preferences — so the
  * routing is ready the day a real win shows up. */
class FullTpchConfSpec extends SparkSpecBase {

  test("the per-key override map is empty — the r14 SHJ claim was refuted by interleaved A/B") {
    assert(FullTpch.confOverrides.isEmpty,
      "a conf override was added: it needs an interleaved same-JVM A/B in BENCH_NOTES " +
        s"and this spec updated — found ${FullTpch.confOverrides.keySet}")
  }

  test("conf-tagged sub-sessions re-plan the same spec text under a different join preference") {
    // the shape where the preference is live: no side fits a broadcast
    // (threshold floored at 1KB — NOT -1, which would also zero
    // Spark's SHJ eligibility bound, canBuildLocalHashMap = size <
    // threshold × partitions), selection on AQE's runtime sizes, so
    // the pin reads the AQE-final executed plan after materialization
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
    val shj = Seq("spark.sql.join.preferSortMergeJoin" -> "false")
    for (k <- Seq("q11_full_important_stock", "q14_full_promo_revenue")) {
      val flipped = finalPlan(shj, k)
      assert(flipped.contains("ShuffledHashJoin"),
        s"$k did not plan SHJ under the routed conf:\n${flipped.take(3000)}")
      val default = finalPlan(Nil, k)
      assert(default.contains("SortMergeJoin"),
        s"$k default is no longer SMJ at the no-broadcast shape:\n${default.take(3000)}")
    }
  }
}
