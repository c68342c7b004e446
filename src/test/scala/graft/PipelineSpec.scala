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
}
