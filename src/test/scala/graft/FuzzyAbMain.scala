package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B for the r17 fuzzy-join verify change:
  * arm A = shipped [[operators.Relational.fuzzyJoinOn]] (THRESHOLD
  * levenshtein — banded DP, -1 past k), arm B = control with the full
  * O(n²) levenshtein (the pre-r17 spelling, reconstructed here so the
  * shipped helper stays single-spelling). Equality of both arms'
  * digests is asserted before any timing claim; trials alternate
  * B,A,B,A,... so box weather lands on both arms.
  *
  * Usage: Test/runMain graft.FuzzyAbMain [sfDir] [trialsPerArm]
  */
object FuzzyAbMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Sessions.local("fuzzy-ab", cpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    val q = 2; val k = 2

    def docsAll = sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), substring(col("text"), 1, 24).as("t"))
      .filter(length(col("t")) >= q)

    // arm A: the shipped operator (threshold verify)
    def armA: DataFrame = operators.Relational.fuzzyJoinOn(docsAll, q, k)

    // arm B: pre-r17 control — identical pipeline, full-DP verify.
    // (Copy of fuzzyJoinOn with the one-line verify difference.)
    def armB: DataFrame = {
      val groups = docsAll.groupBy(col("t")).agg(min(col("doc_id")).as("rep"))
      val docs = groups.select(col("rep").as("doc_id"), col("t"))
      val repPairs = operators.Relational.fuzzyRepCandidates(docs, q, k)
        .join(docs.select(col("doc_id").as("d1"), col("t").as("t1")), "d1")
        .join(docs.select(col("doc_id").as("d2"), col("t").as("t2")), "d2")
        .withColumn("dist", levenshtein(col("t1"), col("t2")))   // full DP
        .filter(col("dist") <= k)
        .select(col("d1").as("r1"), col("d2").as("r2"), col("dist"))
      val members = docsAll.join(groups, "t").select(col("doc_id"), col("rep"))
      val cross = repPairs
        .join(members.as("ma"), col("ma.rep") === col("r1"))
        .join(members.as("mb"), col("mb.rep") === col("r2"))
        .select(least(col("ma.doc_id"), col("mb.doc_id")).as("d1"),
          greatest(col("ma.doc_id"), col("mb.doc_id")).as("d2"), col("dist"))
      val intra = members.as("x").join(members.as("y"),
          col("x.rep") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
          lit(0).as("dist"))
      cross.unionByName(intra).orderBy(col("d1"), col("d2"))
    }

    // arm C: threshold verify + LATE distinct — candidates flow to the
    // verify with duplicates (one per shared prefix gram), the distinct
    // runs on the verified (output-bounded) pair set instead of the
    // multi-million-row candidate frame. Requires a dup-preserving
    // candidate frame, reconstructed here from the shipped helper's
    // pieces (fuzzyRepCandidates itself distincts — the spec pins it).
    def armC: DataFrame = {
      val groups = docsAll.groupBy(col("t")).agg(min(col("doc_id")).as("rep"))
      val docs = groups.select(col("rep").as("doc_id"), col("t"))
      val cand = operators.Relational.fuzzyRepCandidatesDup(docs, q, k)
      val repPairs = cand
        .join(docs.select(col("doc_id").as("d1"), col("t").as("t1")), "d1")
        .join(docs.select(col("doc_id").as("d2"), col("t").as("t2")), "d2")
        .withColumn("dist", levenshtein(col("t1"), col("t2"), k))
        .filter(col("dist") >= 0)
        .select(col("d1").as("r1"), col("d2").as("r2"), col("dist"))
        .distinct()
      val members = docsAll.join(groups, "t").select(col("doc_id"), col("rep"))
      val cross = repPairs
        .join(members.as("ma"), col("ma.rep") === col("r1"))
        .join(members.as("mb"), col("mb.rep") === col("r2"))
        .select(least(col("ma.doc_id"), col("mb.doc_id")).as("d1"),
          greatest(col("ma.doc_id"), col("mb.doc_id")).as("d2"), col("dist"))
      val intra = members.as("x").join(members.as("y"),
          col("x.rep") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
          lit(0).as("dist"))
      cross.unionByName(intra).orderBy(col("d1"), col("d2"))
    }

    def digest(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(hash(col("d1"), col("d2"), col("dist")).cast("long"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    require(digest(armA) == digest(armB), "arms disagree — threshold verify is NOT equivalent")
    require(digest(armA) == digest(armC), "late-distinct arm disagrees")
    println("[fuzzy-ab] arm digests equal — timing")

    def time(df: => DataFrame): Double = {
      Caches.release()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // q6 sentinel brackets (same instrument as Bench)
    def sentinel(): Double =
      time(Registry.byName("q6_forecast_revenue").build(spark, sfDir))
    val wb = sentinel()
    val trips = (1 to n).map { i =>
      val b = time(armB); val a = time(armA); val c = time(armC)
      println(f"[fuzzy-ab] trial $i  control(full)=$b%.2f  threshold=$a%.2f  lateDistinct=$c%.2f")
      (b, a, c)
    }
    val wa = sentinel()
    println(f"[fuzzy-ab] sentinel brackets $wb%.2f / $wa%.2f")
    println(f"[fuzzy-ab] mins: control=${trips.map(_._1).min}%.2f threshold=${trips.map(_._2).min}%.2f lateDistinct=${trips.map(_._3).min}%.2f")
    spark.stop()
  }
}
