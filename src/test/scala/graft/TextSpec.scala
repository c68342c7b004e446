package graft

import org.apache.spark.sql.functions._

/** Winnowing-fingerprint properties the value-equality oracle can't
  * express: locality (near-dup docs share most fingerprints) and
  * discrimination (unrelated docs share few). */
class TextSpec extends SparkSpecBase {

  // the SHIPPED fingerprint path (native winnow_fps), not a re-spelling
  private def fps(rows: (Long, String)*): Map[Long, Set[Long]] = {
    graft.functions.GraftFunctions.register(spark)
    import TestSession.spark.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), explode(expr("winnow_fps(text, 8, 4)")).as("fp"))
      .collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
  }

  test("fingerprints are deterministic and winnowing-local") {
    val base = "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill nearby"
    val nearDup = base.replace("lazy", "idle")
    val unrelated = "completely different content about distributed query engines and shuffle partitioning strategies"
    val m1 = fps(1L -> base, 2L -> base, 3L -> nearDup, 4L -> unrelated)
    val m2 = fps(1L -> base, 2L -> base, 3L -> nearDup, 4L -> unrelated)
    assert(m1 == m2) // deterministic
    assert(m1(1) == m1(2)) // identical docs → identical fingerprint set
    def jac(a: Set[Long], b: Set[Long]) = (a & b).size.toDouble / (a | b).size
    assert(jac(m1(1), m1(3)) >= 0.5, s"near-dup overlap ${jac(m1(1), m1(3))}")
    assert(jac(m1(1), m1(4)) <= 0.1, s"unrelated overlap ${jac(m1(1), m1(4))}")
  }

  test("repetition scoring flags template spam and passes varied text, zeros for short docs") {
    import TestSession.spark.implicits._
    val d = Seq(
      (1L, "buy now buy now buy now buy now"), // top 2-gram "buy now" = 4/7 > 1/4
      (2L, "a fresh take on distributed windowed aggregation semantics"), // all distinct
      (3L, "one")) // < 2 words: zero counts, not repetitive
      .toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.repetitionStats(d)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, 7L, 2L, 4L, true), // grams: buy-now ×4, now-buy ×3
      (2L, 7L, 7L, 1L, false),
      (3L, 0L, 0L, 0L, false)))
  }

  test("entropy orders degenerate < repetitive < uniform text, integer-exact") {
    import TestSession.spark.implicits._
    val d = Seq(
      (1L, "aaaa"), // one char class -> 0 bits
      (2L, "abab"), // two balanced classes -> bitlen(4)-bitlen(2) = 1.0
      (3L, "abcd")) // four singletons -> bitlen(4)-bitlen(1) = 2.0
      .toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.entropyFrom(d)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 4L, 1L, 0.0), (2L, 4L, 2L, 1.0), (3L, 4L, 4L, 2.0)))
  }

  test("normalization collapses case/punct/whitespace variants to one canonical hash") {
    import TestSession.spark.implicits._
    val d = Seq(
      (1L, "Hello,  World!"),
      (2L, "hello world"),
      (3L, "already clean text"))
      .toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.normalizeOf(d).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
    assert(got(0)._3 == got(1)._3, "variants must share the canonical hash")
    assert(got(0)._2 == 11L && got(1)._2 == 11L)
    assert(got(0)._4 && !got(1)._4 && !got(2)._4)
  }

  test("pii scrub counts each pattern once and redacts to the expected bytes") {
    import TestSession.spark.implicits._
    val d = Seq(
      (1L, "contact bob.smith@example.com or 10.0.0.1 ref 12345678 done"),
      (2L, "no pii in this document at all"))
      .toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.piiOf(d).orderBy(col("doc_id")).collect()
    assert((got(0).getLong(1), got(0).getLong(2), got(0).getLong(3), got(0).getBoolean(4)) ==
      ((1L, 1L, 1L, false)))
    assert((got(1).getLong(1), got(1).getLong(2), got(1).getLong(3), got(1).getBoolean(4)) ==
      ((0L, 0L, 0L, true)))
    val expectedMd5 = spark.sql(
      "SELECT md5('contact <EMAIL> or <IP> ref <NUM> done')").first.getString(0)
    assert(got(0).getString(5) == expectedMd5, "redaction bytes differ from expectation")
  }

  test("boilerplate flags chunks recurring in >= BOILER_DF docs, permille integer-exact") {
    import TestSession.spark.implicits._
    val shared = (1 to 24).map(i => s"s$i").mkString(" ") // df=3 → boilerplate
    val pairOnly = (1 to 24).map(i => s"p$i").mkString(" ") // df=2 → not
    def tail(d: Int) = (1 to 24).map(i => s"d${d}_$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared ${tail(1)}"), (2L, s"$shared ${tail(2)}"), (3L, s"$shared ${tail(3)}"),
      (4L, s"$pairOnly ${tail(4)}"), (5L, s"$pairOnly ${tail(5)}"))
      .toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.boilerplateOf(docs).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 500L), (2L, 2L, 1L, 500L), (3L, 2L, 1L, 500L),
      (4L, 2L, 0L, 0L), (5L, 2L, 0L, 0L)))
  }

  test("text_fingerprint output shape on the documents table") {
    val got = SparkEntry.queries("text_fingerprint")(spark, sfDir)
    val rows = got.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) > 0)) // every doc has fingerprints
  }

  test("cooccurrence top pairs replay brute-force and ranks are dense") {
    val co = SparkEntry.queries("text_cooccurrence")(spark, sfDir).cache()
    try {
      val n = co.count()
      assert(n > 0 && n <= 50)
      assert(co.filter(col("c_xy") < 20 || col("lift_e6") <= 0).isEmpty)
      assert(co.agg(max(col("rnk")).as("mx"), min(col("rnk")).as("mn"),
        countDistinct(col("rnk")).as("k")).filter(
        col("mx") =!= n || col("mn") =!= 1L || col("k") =!= n).isEmpty,
        "rnk must be the dense 1..n prefix")
      // independent replay of the top pair's count: positional
      // self-join (the plan the shipped map-only lambda avoids)
      val top = co.orderBy(col("rnk")).head()
      val (a, b) = (top.getAs[String]("a"), top.getAs[String]("b"))
      val pos = sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "tok")))
      val brute = pos.as("l").join(pos.as("r"),
        col("l.doc_id") === col("r.doc_id") &&
          col("r.p") > col("l.p") && col("r.p") <= col("l.p") + 3 &&
          col("l.tok") === lit(a) && col("r.tok") === lit(b)).count()
      assert(brute == top.getAs[Long]("c_xy"),
        s"lambda pair count ${top.getAs[Long]("c_xy")} != brute-force $brute for ($a,$b)")
    } finally co.unpersist()
  }
}
