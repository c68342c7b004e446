package graft

import org.apache.spark.sql.functions._

/** Semantics of the graph family: the degree-oriented triangle census
  * must agree with a brute-force unoriented count, and PageRank must
  * respect its integer-arithmetic invariants. */
class GraphSpec extends SparkSpecBase {

  test("oriented triangle count equals the brute-force a<b<c count") {
    val census = SparkEntry.queries("graph_triangles")(spark, sfDir).head()
    val oriented = census.getAs[Long]("n_triangles")
    // brute force: three unoriented edges closing a < b < c
    val e = graph.Graph.coPurchaseEdges(spark, sfDir).cache()
    try {
      val ab = e.select(col("a"), col("b"))
      val bc = e.select(col("a").as("b"), col("b").as("c"))
      val ac = e.select(col("a"), col("b").as("c"))
      val brute = ab.join(bc, "b").join(ac, Seq("a", "c")).count()
      assert(oriented == brute,
        s"degree-oriented census $oriented != brute-force $brute")
      assert(census.getAs[Long]("n_edges") == e.count())
      assert(oriented <= census.getAs[Long]("n_wedges"))
    } finally e.unpersist()
  }

  test("pagerank covers every connected part and respects rank bounds") {
    val got = SparkEntry.queries("graph_pagerank")(spark, sfDir).cache()
    try {
      val e = graph.Graph.coPurchaseEdges(spark, sfDir)
      val nodes = e.select(col("a").as("n")).union(e.select(col("b").as("n"))).distinct()
      assert(got.count() == nodes.count(), "pagerank must rank every connected node")
      // damped floor: rank >= 150000 always (empty contribution sum impossible
      // in a symmetric graph, but even then the additive term bounds below)
      assert(got.filter(col("r") < 150000L).isEmpty)
      // determinism: a second build is bit-identical
      val again = SparkEntry.queries("graph_pagerank")(spark, sfDir)
      assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
    } finally {
      got.unpersist()
      Caches.release()
    }
  }
}
