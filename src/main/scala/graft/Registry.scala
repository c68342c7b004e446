package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a named query (driver contract) + optional
  * DuckDB oracle SQL (hash-checked by the driver at sf0.01).
  *
  * Column names MUST match between `build`'s output and `oracle`'s
  * projection — the driver sorts columns by name before hashing.
  */
final case class GQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    tags: Set[String] = Set.empty)

object Registry {
  /** Full inventory, mirrors SURVEY.md §2. */
  lazy val all: Seq[GQuery] =
    tpch.TpchQueries.all ++
      tpch.FullTpch.all ++
      tpch.TpchRewrites.all ++
      operators.Relational.all ++
      operators.Behavior.all ++
      text.TextAnalysis.all ++
      dedup.Dedup.all ++
      similarity.Ann.all ++
      graph.Graph.all ++
      multimodal.Multimodal.all ++
      streaming.Streams.all ++
      tpch.TpchGen.all ++
      sources.AuxGen.all ++
      Seq(sources.Sinks.bucketedJoin, sources.Sinks.q21Bucketed,
        sources.Sinks.q18Bucketed, sources.Sinks.q14Bucketed,
        sources.Sinks.q5Bucketed, sources.Sinks.q17Bucketed,
        sources.Sinks.q2Bucketed, sources.Sinks.q11Bucketed,
        sources.Sinks.q16Bucketed, sources.Sinks.q3Bucketed,
        sources.Sinks.q4Bucketed, sources.Sinks.q12Bucketed,
        sources.Sinks.q13Bucketed, sources.Sinks.q7Bucketed,
        sources.Sinks.q10Bucketed, sources.Sinks.q20Bucketed,
        sources.Sinks.q9Bucketed,
        sources.Sinks.compactSmallFiles, sources.Sinks.compactPartitioned,
        sources.Sinks.partitionPrune, sources.Sinks.bloomFilterJoin,
        sources.Sinks.statsSkipping) ++
      pipeline.TrainingData.all

  lazy val byName: Map[String, GQuery] = {
    val names = all.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    all.map(q => q.name -> q).toMap
  }

  /** Headline queries (one per subsystem family) — selected by
    * `SPARK_GRAFT_BENCH_ONLY=headline` in [[graft.Bench]] for a fast
    * whole-surface smoke loop. */
  lazy val benchNames: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q9_profit", "q13_customer_distribution",
    "q18_large_orders", "q21_waiting_suppliers",
    "op_window_running", "op_asof_join",
    "dedup_minhash_lsh", "ann_cosine_topk", "text_quality",
    "gen_rowcounts",
    "graph_triangles", "op_markov_transitions", "stream_cdc",
    "pipeline_curate")
}
