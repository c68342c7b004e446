package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payloads survive the typed decode
  * path, features are deterministic, metadata predicates prune
  * without touching payloads. */
class MultimodalSpec extends SparkSpecBase {

  test("typed mapPartitions decode produces deterministic features") {
    val feats = Multimodal.decodeFeatures(Multimodal.media(spark, sfDir))
    val a = feats.orderBy(col("doc_id")).collect()
    val b = feats.orderBy(col("doc_id")).collect()
    assert(a.nonEmpty)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(_.n_bytes == 16)) // md5 payload stub
    assert(a.forall(f => f.frames == 4))
    assert(a.forall(f => f.mean_byte >= 0 && f.mean_byte <= 255))
  }

  test("metadata filter prunes before payload decode (no blob in the scan schema)") {
    val df = Multimodal.mediaTable(graft.sources.Tables.documents(spark, sfDir))
      .filter(col("meta.format") === "png")
      .select(col("doc_id"), col("meta.width"))
    val readSchema = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("blob"), readSchema)
    assert(df.count() > 0)
  }
}
