package graft

import graft.pipeline.TrainingData
import org.apache.spark.sql.functions._

/** Curation funnel properties beyond the value oracle. */
class PipelineSpec extends SparkSpecBase {

  test("curation only drops rows and removes every near-dup loser among survivors") {
    val dir = TestSession.sfDir01
    val total = graft.sources.Tables.documents(spark, dir).count()
    val kept = TrainingData.curate(spark, dir).cache()
    assert(kept.count() > 0 && kept.count() < total)
    // no two survivors are a near-dup pair: re-running the banded
    // near-dup detector over the kept set must find nothing
    val keptDocs = graft.sources.Tables.documents(spark, dir)
      .join(kept.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val sh = graft.dedup.Dedup.shingles(keptDocs)
    val n = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val residual = graft.dedup.Dedup.verifiedJaccard(
      graft.dedup.Dedup.bandCandidates(graft.dedup.Dedup.minhashBands(sh)), sh, n)
    assert(residual.count() == 0)
    // gates hold on every survivor
    assert(kept.filter(col("n_words") < 20 || col("punct_ratio") > 0.1).count() == 0)
    kept.unpersist()
  }

  test("curate plan contains no raw shingle self-join (near-dup stage rides minhash bands)") {
    val plan = TrainingData.curate(spark, TestSession.sfDir01)
      .queryExecution.optimizedPlan.toString
    // the banded path must be present (candidates keyed on band bucket)
    assert(plan.contains("bkey"), "minhash band join missing from curate plan")
    // the raw path's signature is a join keyed on the shingle string
    // ALONE (with only the doc_id inequality alongside) — the verify
    // stage's composite (doc_id, shingle) key is fine
    val rawSelfJoin = """\(\(?shingle#\d+ = shingle#\d+\)? AND \(doc_id#\d+ < doc_id#\d+\)""".r
    assert(rawSelfJoin.findFirstIn(plan).isEmpty,
      "raw shingle self-join found in curate plan")
  }

  test("decontamination flags exactly the docs sharing a benchmark n-gram, zeros included") {
    import TestSession.spark.implicits._
    val leakRun = (1 to 5).map(i => s"b$i").mkString(" ") // one shared 5-gram
    val bench = Seq((100L, s"$leakRun bench tail words here")).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"prefix words $leakRun suffix"), // contaminated
      (2L, "totally clean document text with enough words"),
      (3L, "tiny")) // < 5 words: no grams, still emitted with 0
      .toDF("doc_id", "text")
    val got = TrainingData.decontaminateAgainst(train, bench)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == Seq((1L, 1L, true), (2L, 0L, false), (3L, 0L, false)))
  }

  test("decontamination on the real corpus finds the planted near-dups and nothing like all docs") {
    val got = SparkEntry.queries("pipeline_decontaminate")(spark, TestSession.sfDir01).cache()
    val flagged = got.filter(col("contaminated")).count()
    val total = got.count()
    assert(flagged > 0, "no contamination found — the planted dups should leak")
    assert(flagged < total / 10, s"$flagged of $total flagged — 5-gram window too loose")
    got.unpersist()
  }

  test("domain mix keeps sources proportional to their weights, max-weight sources whole") {
    val dir = TestSession.sfDir01
    val docs = graft.sources.Tables.documents(spark, dir)
    val totals = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SparkEntry.queries("pipeline_domain_mix")(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = totals.values.min
    def weight(src: String): Long = src.drop(3).toLong % 3 + 1
    // per-source the md5-permille coin is binomial on ~25 draws (sd ≈
    // 2.4 docs) — too noisy to pin individually; assert never-overdrawn
    // per source and proportionality per WEIGHT CLASS, where the noise
    // averages over ~7 sources
    totals.foreach { case (src, n) =>
      assert(kept.getOrElse(src, 0L) <= n, s"$src overdrawn")
    }
    (1L to TrainingData.W_MAX).foreach { w =>
      val srcs = totals.keys.filter(weight(_) == w).toSeq
      val expected = srcs.map(s => math.min(totals(s).toDouble,
        w.toDouble * minN / TrainingData.W_MAX)).sum
      val got = srcs.map(s => kept.getOrElse(s, 0L).toDouble).sum
      assert(math.abs(got - expected) <= 0.2 * expected,
        s"weight $w: kept $got, expected ~$expected over ${srcs.size} sources")
    }
    // a max-weight source at the minimum size is kept whole
    val anchor = totals.filter { case (s, n) => n == minN && weight(s) == TrainingData.W_MAX }
    anchor.keys.foreach(s => assert(kept.getOrElse(s, 0L) == totals(s), s"anchor $s not whole"))
  }

  test("sequence packing streaming-fills per (source, shard) and never skips a pack") {
    import TestSession.spark.implicits._
    // 5 docs of 400 tokens each in one source/shard: budget 1024 →
    // exclusive prefix sums 0,400,800,1200,1600 → packs 0,0,0,1,1
    val text = (1 to 400).map(i => s"t$i").mkString(" ")
    val d = (0L to 4L).map(i => (i, "srcA", text)).toDF("doc_id", "source", "text")
    val got = TrainingData.packOf(d).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    assert(got.toSeq == Seq(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
    // shards are independent fills: doc_ids straddling the shard width
    // restart at local pack 0 with the shard baked into pack_id
    val wide = Seq(
      (TrainingData.PACK_SHARD_DOCS - 1, "srcA", text),
      (TrainingData.PACK_SHARD_DOCS, "srcA", text)).toDF("doc_id", "source", "text")
    val w = TrainingData.packOf(wide).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(2), r.getLong(4)))
    assert(w.toSeq == Seq(0L -> 0L, 1L -> 1000000L))
  }

  test("packing on the real corpus: packs are contiguous doc ranges that respect the budget") {
    val got = SparkEntry.queries("pipeline_pack_sequences")(spark, TestSession.sfDir01)
    // within each pack, the token sum before the LAST doc stays under
    // budget (the last doc may overflow the boundary — streaming fill)
    val perPack = got.groupBy(col("source"), col("shard"), col("pack_id"))
      .agg(sum(col("n_tokens")).as("tok"),
        expr("max_by(n_tokens, doc_id)").as("last_tok"),
        count(lit(1)).as("n"))
    val over = perPack
      .filter(col("tok") - col("last_tok") >= TrainingData.PACK_BUDGET && col("n") > 1)
      .count()
    assert(over == 0, s"$over packs whose fill (minus one doc) already exceeded the budget")
    // pack ids within a (source, shard) are dense from 0
    val gaps = got.select(col("source"), col("shard"),
        pmod(col("pack_id"), lit(1000000L)).as("local"))
      .groupBy(col("source"), col("shard"))
      .agg(min(col("local")).as("lo"), max(col("local")).as("hi"),
        countDistinct(col("local")).as("d"))
      .filter(col("lo") =!= 0L || col("d") =!= col("hi") + 1L)
      .count()
    assert(gaps == 0, s"$gaps (source, shard) groups with non-dense pack ids")
    // pack_id is globally unique: ~20 sources interleave inside every
    // shard (AuxGen assigns source = hash mod 20), so an id omitting
    // the source code would alias ~20 distinct packs onto each value
    val aliased = got.groupBy(col("pack_id"))
      .agg(countDistinct(col("source"), col("shard")).as("owners"))
      .filter(col("owners") > 1L).count()
    assert(aliased == 0, s"$aliased pack_ids shared across (source, shard) groups")
  }

  test("stratified sample is deterministic, honors per-lang rates, and keeps bucket < rate") {
    val dir = TestSession.sfDir01
    val a = SparkEntry.queries("pipeline_sample_stratified")(spark, dir)
    val b = SparkEntry.queries("pipeline_sample_stratified")(spark, dir)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0) // reproducible
    val docs = graft.sources.Tables.documents(spark, dir)
    val perLang = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    TrainingData.SAMPLE_RATES.foreach { case (lang, permille) =>
      val n = perLang(lang).toDouble
      val expect = n * permille / 1000.0
      val gotN = kept.getOrElse(lang, 0L).toDouble
      // md5 buckets are uniform; allow ~4 sigma of binomial noise
      val sigma = math.sqrt(n * (permille / 1000.0) * (1 - permille / 1000.0))
      assert(math.abs(gotN - expect) <= 4 * sigma + 1,
        s"$lang: kept $gotN of $n, expected ~$expect (rate $permille permille)")
    }
    // the emitted bucket really is below the lang's rate on every row
    val rates = TrainingData.SAMPLE_RATES.toMap
    val bad = a.collect().count { r =>
      r.getLong(2) >= rates.getOrElse(r.getString(1), TrainingData.DEFAULT_PERMILLE).toLong
    }
    assert(bad == 0, s"$bad rows with bucket >= their lang rate")
  }
}
