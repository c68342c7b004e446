package graft

import graft.pipeline.TrainingData
import org.apache.spark.sql.functions._

/** Curation funnel properties beyond the value oracle. */
class PipelineSpec extends SparkSpecBase {

  test("curation only drops rows and removes every near-dup loser") {
    val dir = TestSession.sfDir01
    val total = graft.sources.Tables.documents(spark, dir).count()
    val kept = TrainingData.curate(spark, dir).cache()
    assert(kept.count() > 0 && kept.count() < total)
    // no surviving doc is the higher id of a near-dup pair
    val losers = graft.dedup.Dedup.ngramJaccard.build(spark, dir)
      .select(col("doc_b").as("doc_id")).distinct()
    assert(kept.join(losers, Seq("doc_id"), "left_semi").count() == 0)
    // gates hold on every survivor
    assert(kept.filter(col("n_words") < 20 || col("punct_ratio") > 0.1).count() == 0)
    kept.unpersist()
  }
}
