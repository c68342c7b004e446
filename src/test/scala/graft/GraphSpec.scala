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

  test("khop distances satisfy the edge relaxation invariant") {
    val got = SparkEntry.queries("graph_khop")(spark, sfDir).cache()
    try {
      // seeds are at hop 0
      assert(got.filter(col("n") < 10 && col("hop") =!= 0).isEmpty)
      assert(got.filter(col("hop") < 0 || col("hop") > 3).isEmpty)
      // no edge may shortcut a recorded distance by more than 1 (within
      // the 3-hop horizon: only check pairs where both ends are labelled
      // and the better label is < 3)
      val e = graph.Graph.coPurchaseEdges(spark, sfDir)
      val edges = e.select(col("a").as("src"), col("b").as("dst"))
        .union(e.select(col("b").as("src"), col("a").as("dst")))
      val bad = edges
        .join(got.select(col("n").as("src"), col("hop").as("hs")), "src")
        .join(got.select(col("n").as("dst"), col("hop").as("hd")), "dst")
        .filter(col("hs") < 3 && col("hd") > col("hs") + 1)
      assert(bad.isEmpty, "an edge shortcuts a BFS distance")
    } finally {
      got.unpersist()
      Caches.release()
    }
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

  test("reliable checkpoint conf: iterated frames survive via DFS files, results unchanged") {
    // r16 verdict #4: `spark.graft.checkpoint.reliable=<dir>` switches
    // every Checkpoints.truncate site from executor-local blocks to
    // reliable checkpoint files. Run an iterated-frame operator (kcore:
    // six truncations across three rounds) under the conf on a child
    // session, pin (a) bit-identical results vs the default path and
    // (b) checkpoint files actually written under the conf'd dir.
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val ss = spark.newSession()
    ss.conf.set(Checkpoints.ReliableDirConf, dir)
    try {
      val reliable = SparkEntry.queries("graph_kcore")(ss, sfDir)
        .orderBy(col("round")).collect().map(_.toSeq).toSeq
      val default = SparkEntry.queries("graph_kcore")(spark, sfDir)
        .orderBy(col("round")).collect().map(_.toSeq).toSeq
      assert(reliable == default, "reliable path changed kcore results")
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"no checkpoint files under $dir — the reliable path never engaged")
    } finally {
      Caches.release()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
