package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Semantics of the dedup family on constructed inputs (the testdata
  * correctness gate covers the real tables; these pin behaviour on
  * known dups/non-dups). */
class DedupSpec extends SparkSpecBase {

  private def docs(rows: (Long, String)*) = {
    import TestSession.spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts and keeps the min doc_id") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z")
    val got = d.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep"))
      .orderBy(col("keep")).collect()
    assert(got.length == 2)
    assert(got(0).getLong(1) == 2 && got(0).getLong(2) == 1) // dup group keeps id 1
  }

  test("simhash: identical docs hash equal; a 1-word edit stays within hamming 3 of 48 bits") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val edit = base.replace("today", "tomorrow")
    val sigs = Dedup.simhashSignatures(docs(1L -> base, 2L -> base, 3L -> edit))
      .orderBy(col("doc_id")).collect()
    val (s1, s2, s3) = (sigs(0).getLong(1), sigs(1).getLong(1), sigs(2).getLong(1))
    assert(s1 == s2)
    assert(java.lang.Long.bitCount(s1 ^ s3) <= 3, s"hamming ${java.lang.Long.bitCount(s1 ^ s3)}")
  }

  test("a corpus-hot shingle generates zero candidate pairs (df cap bounds the pair join)") {
    // 1000 docs share one boilerplate shingle but are otherwise unique:
    // without the df cap the blocking join would emit ~500k pairs from
    // that single key; with it, the hot shingle is dropped from
    // blocking and the unique shingles pair nothing
    val hot = docs((1L to 1000L).map(i => i -> s"click here now unique$i words$i tail$i"): _*)
    val sh = Dedup.shingles(hot)
    assert(Dedup.ngramCandidates(sh).count() == 0)
    // and a genuine near-dup pair is still found even when it ALSO
    // shares the hot shingle, via its non-hot shared shingles
    val planted = docs(
      (Seq(2001L -> "click here now the quick brown fox jumps over the lazy dog",
           2002L -> "click here now the quick brown fox jumps over the lazy cat") ++
        (1L to 1000L).map(i => i -> s"click here now unique$i words$i tail$i")): _*)
    val sh2 = Dedup.shingles(planted)
    val cand = Dedup.ngramCandidates(sh2).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.toSet == Set((2001L, 2002L)), s"got ${cand.toSeq}")
  }

  test("a degenerate band bucket generates zero candidate pairs (bucket cap)") {
    // 1000 docs with identical shingle sets land in the same 4 band
    // buckets; without the cap that is ~500k pairs per band from one
    // key — with it, the degenerate buckets drop out entirely
    val degenerate = docs((1L to 1000L).map(i => i -> "same boilerplate text every single time"): _*)
    val shD = Dedup.shingles(degenerate)
    assert(Dedup.bandCandidates(Dedup.minhashBands(shD)).count() == 0)
    // a genuine near-dup pair in a small bucket is still found
    val planted = docs(
      (Seq(2001L -> "the quick brown fox jumps over the lazy dog",
           2002L -> "the quick brown fox jumps over the lazy cat") ++
        (1L to 1000L).map(i => i -> "same boilerplate text every single time")): _*)
    val shP = Dedup.shingles(planted)
    val cand = Dedup.bandCandidates(Dedup.minhashBands(shP))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand == Set((2001L, 2002L)), s"got $cand")
  }

  test("minhash LSH finds all planted near-dups found by the exact baseline at sf0.01") {
    val exact = SparkEntry.queries("dedup_ngram_jaccard")(spark, TestSession.sfDir01)
      .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, TestSession.sfDir01)
      .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh == exact, s"missed ${(exact -- lsh).size} of ${exact.size}")
  }
}
