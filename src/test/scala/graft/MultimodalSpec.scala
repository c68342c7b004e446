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

  test("mm_dedup_phash finds the planted payload copies at distance 0, never all-pairs") {
    // the generated corpus plants ~5% copy rows whose text (hence
    // synthetic payload digest) is byte-identical to their source —
    // exactly what a payload-level perceptual dedup must surface
    val tmp = java.nio.file.Files.createTempDirectory("graft_phash").toString
    graft.sources.AuxGen.documents(spark, 0.01)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val n = spark.read.parquet(s"$tmp/documents.parquet").count()
    val out = Multimodal.dedupPhash.build(spark, tmp).collect()
    assert(out.nonEmpty)
    // planted copies: identical payload => all four bands collide,
    // Hamming 0, flagged dup
    val exact = out.filter(r => r.getLong(2) == 0L && r.getLong(3) == 1L)
    assert(exact.nonEmpty, "planted copies not surfaced")
    // candidate table stays far from quadratic (LSH banding + cap)
    assert(out.length < n * 8, s"${out.length} candidate pairs for $n docs")
    // canonical, distinct pairs
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    assert(out.map(r => (r.getLong(0), r.getLong(1))).distinct.length == out.length)
  }
}
