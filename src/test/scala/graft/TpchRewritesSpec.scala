package graft

/** Plan pins for the rewrite routing arms (graft.tpch.TpchRewrites). */
class TpchRewritesSpec extends SparkSpecBase {

  private def withAutoBroadcastDisabled[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q22_full_anti_rewrite: orders is never exchanged or sort-merge joined") {
    withAutoBroadcastDisabled {
      val df = Registry.byName("q22_full_anti_rewrite").build(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      // raw q22 answers NOT EXISTS with a left-anti SMJ that exchanges
      // and sorts ALL of orders; the rewrite probes broadcasts map-only
      // — the surviving hash exchanges are the combined distinct and
      // the 7-group rollup, never a fact-side move
      assert(!plan.contains("SortMergeJoin"),
        s"expected broadcast-only joins:\n${plan.take(4000)}")
      val shuffles = "Exchange hashpartitioning".r.findAllMatchIn(plan).size
      assert(shuffles <= 2,
        s"expected only the distinct + rollup exchanges, got $shuffles:\n${plan.take(4000)}")
      // both membership joins ride broadcasts
      assert("BroadcastHashJoin.*LeftSemi".r.findFirstIn(plan).nonEmpty ||
        plan.contains("LeftSemi"), s"semi probe missing:\n${plan.take(4000)}")
      assert(plan.contains("LeftAnti"), s"anti probe missing:\n${plan.take(4000)}")
      // row-identical to the spec-text key
      val expected = Registry.byName("q22_full_global_sales").build(spark, sfDir)
      assert(df.collect().toSeq == expected.collect().toSeq)
    }
  }

  test("q15_full_view_reuse: the revenue view is computed once and reused for max and winners") {
    withAutoBroadcastDisabled {
      val df = Registry.byName("q15_full_view_reuse").build(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      // raw q15 evaluates the revenue view twice (FROM + scalar max
      // subquery) — two lineitem scans and two suppkey aggregations;
      // the rewrite persists the per-supplier frame and both branches
      // read the cache
      val memoReads = "InMemoryTableScan".r.findAllMatchIn(plan).size
      assert(memoReads >= 2, s"expected both branches on the persisted revenue frame:\n${plan.take(4000)}")
      // the one real exchange is the suppkey aggregation inside the
      // cached plan; winners broadcast into a map-only supplier join.
      // The plan STRING prints the cached subtree (and its exchange)
      // under every InMemoryRelation occurrence, so the textual count
      // is ≤ the number of cache readers — physically it runs once
      val shuffles = "Exchange hashpartitioning".r.findAllMatchIn(plan).size
      assert(shuffles <= memoReads,
        s"expected only the cached suppkey aggregation's printouts, got $shuffles:\n${plan.take(4000)}")
      assert(!plan.contains("SortMergeJoin"),
        s"winner join should broadcast:\n${plan.take(4000)}")
      val expected = Registry.byName("q15_full_top_supplier").build(spark, sfDir)
      assert(df.collect().toSeq == expected.collect().toSeq)
      Caches.release()
    }
  }
}
