package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Native dot_long expression: matches the built-in spelling, handles
  * nulls and length mismatch, resolves via SQL after registration. */
class FunctionsSpec extends SparkSpecBase {

  test("dot_long equals the aggregate/zip_with spelling and handles nulls") {
    GraftFunctions.register(spark)
    import TestSession.spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),   // 4+10+18 = 32
      (Seq(-2L, 7L), Seq(3L, -1L)),          // -6-7 = -13
      (Seq(1L, 1L, 1L, 1L), Seq(2L, 2L))     // prefix: 4
    ).toDF("a", "b")
    val got = df.select(
      expr("dot_long(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("builtin"))
      .collect()
    assert(got(0).getLong(0) == 32L && got(1).getLong(0) == -13L)
    // prefix semantics: builtin zip_with pads with null (making the
    // aggregate null), native uses the common prefix — assert native
    assert(got(2).getLong(0) == 4L)
    assert(got.take(2).forall(r => r.getLong(0) == r.getLong(1)))
    val withNull = Seq((Option.empty[Seq[Long]], Option(Seq(1L)))).toDF("a", "b")
      .select(expr("dot_long(a, b)")).collect()
    assert(withNull(0).isNullAt(0))
    // null ELEMENTS propagate null too, matching the built-in spelling
    val nullElem = Seq((Seq[java.lang.Long](1L, null), Seq[java.lang.Long](2L, 3L)))
      .toDF("a", "b")
      .select(expr("dot_long(a, b)").as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("builtin"))
      .collect()
    assert(nullElem(0).isNullAt(0) && nullElem(0).isNullAt(1))
  }

  test("winnow_fps equals the built-in transform/slice spelling on real documents") {
    GraftFunctions.register(spark)
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val native = docs.selectExpr("doc_id", "winnow_fps(text, 8, 4) AS fps")
    val builtin = docs
      .selectExpr("doc_id",
        "transform(sequence(0, length(text) - 8), " +
          "i -> CAST(conv(substr(md5(substr(text, i + 1, 8)), 1, 15), 16, 10) AS BIGINT)) AS kh")
      .selectExpr("doc_id",
        "array_distinct(transform(sequence(0, size(kh) - 4), j -> array_min(slice(kh, j + 1, 4)))) AS fps")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val (n, b) = (asMap(native), asMap(builtin))
    assert(n.nonEmpty)
    assert(n == b)
  }

  test("winnow_fps equals the built-in spelling on arbitrary unicode strings (property)") {
    GraftFunctions.register(spark)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // mixed-width codepoints exercise the char→byte offset mapping:
    // ASCII (1B), Latin/Greek (2B), CJK (3B), emoji (4B, surrogate
    // pairs in the JVM string)
    val alphabet = "ab c1é的ß漢字🌍x"
    val gen = for {
      len <- Gen.choose(0, 60)
      cs <- Gen.listOfN(len, Gen.oneOf(
        alphabet.codePoints().toArray.toIndexedSeq))
    } yield cs.map(Character.toChars(_).mkString).mkString
    val samples = (0 until 200).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    import TestSession.spark.implicits._
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val native = df.selectExpr("id", "winnow_fps(text, 8, 4) AS fps")
    val builtin = df
      .selectExpr("id",
        "CASE WHEN length(text) >= 11 THEN transform(sequence(0, length(text) - 8), " +
          "i -> CAST(conv(substr(md5(substr(text, i + 1, 8)), 1, 15), 16, 10) AS BIGINT)) " +
          "ELSE CAST(array() AS ARRAY<BIGINT>) END AS kh")
      .selectExpr("id",
        "CASE WHEN size(kh) >= 4 THEN array_distinct(transform(sequence(0, size(kh) - 4), " +
          "j -> array_min(slice(kh, j + 1, 4)))) ELSE CAST(array() AS ARRAY<BIGINT>) END AS fps")
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val (n, b) = (asMap(native), asMap(builtin))
    assert(n.size == samples.size)
    assert(n == b, {
      val bad = n.keys.filter(k => n(k) != b(k)).take(3)
      bad.map(k => s"id=$k text='${samples(k.toInt)}'").mkString("; ")
    })
  }

  test("char_entropy equals the explode/groupBy spelling on real documents") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(length(col("text")) > 0).limit(200)
    val native = docs.selectExpr("doc_id", "char_entropy(text) AS st")
      .selectExpr("doc_id", "st.n_chars", "st.n_charset", "st.wbits")
    // the r11 spelling: explode chars, count per (doc, char), fold
    val cc = docs
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(text)), i -> substring(text, i, 1))")).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("nc"))
    val tot = cc.groupBy(col("doc_id"))
      .agg(sum(col("nc")).as("nt"), count(lit(1)).as("n_charset"))
    val builtin = cc.join(tot, Seq("doc_id"))
      .withColumn("bits",
        (length(conv(col("nt"), 10, 2)) - length(conv(col("nc"), 10, 2))).cast("long"))
      .groupBy(col("doc_id"))
      .agg(max(col("nt")).as("n_chars"), max(col("n_charset")).as("n_charset"),
        sum(col("bits") * col("nc")).as("wbits"))
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (n, b) = (asMap(native), asMap(builtin))
    assert(n.nonEmpty && n == b,
      n.keys.filter(k => n.get(k) != b.get(k)).take(3).mkString("; "))
  }

  test("char_entropy equals the explode spelling on arbitrary unicode strings (property)") {
    GraftFunctions.register(spark)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val alphabet = "ab c1é的ß漢字🌍x"
    val gen = for {
      len <- Gen.choose(1, 60)
      cs <- Gen.listOfN(len, Gen.oneOf(alphabet.codePoints().toArray.toIndexedSeq))
    } yield cs.map(Character.toChars(_).mkString).mkString
    val samples = (0 until 150).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(1000L + i)))
    import TestSession.spark.implicits._
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = df.selectExpr("doc_id", "char_entropy(text) AS st")
      .selectExpr("doc_id", "st.n_chars", "st.n_charset", "st.wbits")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val builtin = samples.zipWithIndex.map { case (t, i) =>
      val cps = t.codePoints().toArray
      val counts = cps.groupBy(identity).map(_._2.length)
      val ntBits = 64 - java.lang.Long.numberOfLeadingZeros(cps.length.toLong)
      val wbits = counts.map(nc =>
        (ntBits - (32 - Integer.numberOfLeadingZeros(nc))).toLong * nc).sum
      i.toLong -> (cps.length.toLong, counts.size.toLong, wbits)
    }.toMap
    assert(native == builtin,
      native.keys.filter(k => native.get(k) != builtin.get(k)).take(3)
        .map(k => s"doc=$k text='${samples(k.toInt)}'").mkString("; "))
  }

  test("char_entropy participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = spark.range(10)
      .selectExpr("concat('doc', id, repeat('ab', CAST(id AS INT))) AS text")
      .selectExpr("char_entropy(text) AS st")
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[char_entropy""".r.findFirstIn(plan).isDefined, plan)
  }

  test("dot_long participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    // non-literal input so the optimizer can't constant-fold the call
    // into a LocalTableScan
    val df = spark.range(10)
      .selectExpr("transform(sequence(0, 3), i -> id + i) AS a",
        "transform(sequence(0, 3), i -> id * 2 + i) AS b")
      .selectExpr("dot_long(a, b) AS d", "a", "b")
    // the "*(n)" prefix marks operators inside a WholeStageCodegen
    // stage; the transform-lambda Project below it stays interpreted —
    // which is exactly the gap dot_long closes vs zip_with/aggregate
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[dot_long""".r.findFirstIn(plan).isDefined, plan)
    // id=1: a=[1,2,3,4], b=[2,3,4,5] → 2+6+12+20 = 40
    assert(df.filter("a[0] = 1").head().getLong(0) == 40L)
  }

  test("GraftExtensions injects the native functions at session build, no runtime register") {
    // spark.sql.extensions is a STATIC conf: Sessions.local sets it at
    // context build, and a newSession() fork rebuilds its function
    // registry from the extensions alone — so resolution here proves
    // config-time injection, independent of any runtime register()
    // calls other tests made on the parent session
    val s2 = spark.newSession()
    assert(s2 ne spark)
    assert(s2.sql("SELECT dot_long(array(1L, 2L), array(3L, 4L)) AS d")
      .head().getLong(0) == 11L)
    assert(s2.sql("SELECT size(winnow_fps('the quick brown fox jumps over it', 8, 4)) AS n")
      .head().getInt(0) > 0)
    assert(s2.sql("SELECT char_entropy('abab').n_chars AS c").head().getLong(0) == 4L)
  }

  test("top_k_long keeps the k best with deterministic ties across partial merges") {
    graft.functions.GraftFunctions.register(spark)
    import TestSession.spark.implicits._
    // 1000 rows over 8 partitions forces real partial-buffer merges;
    // scores collide heavily (mod 10) so the payload-ASC tie rule is
    // exercised at every boundary
    val df = spark.range(1000).repartition(8)
      .selectExpr("CAST(id % 10 AS BIGINT) AS s", "id AS p", "CAST(id % 2 AS INT) AS g")
    val got = df.groupBy($"g")
      .agg(expr("top_k_long(s, p, 7)").as("tk"))
      .selectExpr("g", "posexplode(tk) AS (i, e)")
      .select($"g", $"i", $"e.score", $"e.payload")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // window-spelled reference: score DESC, payload ASC
    val ref = (0L until 1000L).map(id => (id % 2, id % 10, id))
      .groupBy(_._1).flatMap { case (g, rows) =>
        rows.sortBy { case (_, s, p) => (-s, p) }.take(7).zipWithIndex
          .map { case ((_, s, p), i) => (g.toInt, i, s, p) }
      }.toSet
    assert(got.length == 14 && got.toSet == ref,
      s"heap aggregate diverges from the window reference: ${got.toSeq.sorted}")
    // k > group size: emits the whole group, never pads
    val small = spark.range(3)
      .selectExpr("id AS s", "id AS p")
      .agg(expr("top_k_long(s, p, 1000)").as("tk"))
      .selectExpr("size(tk) AS n").head().getInt(0)
    assert(small == 3)
    // nulls are skipped, not kept as zeros
    val withNull = spark.sql(
      "SELECT top_k_long(s, p, 5) AS tk FROM VALUES (1L, 1L), (CAST(NULL AS BIGINT), 2L), (3L, CAST(NULL AS BIGINT)) t(s, p)")
      .selectExpr("size(tk) AS n").head().getInt(0)
    assert(withNull == 1)
  }
}
