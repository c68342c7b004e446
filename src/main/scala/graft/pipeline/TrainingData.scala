package graft.pipeline

import graft.GQuery
import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation — the composition a real corpus
  * pipeline runs, built from the engine's own operators so the whole
  * chain stays one declarative Catalyst plan:
  *
  *   quality gate → language gate → exact dedup → near-dup removal
  *
  * Scale shape: the two gates are pure per-row filters (no shuffle,
  * evaluated at the scan); exact dedup is one hash shuffle; near-dup
  * removal runs MinHash-banded candidate generation (constant-size
  * signatures — the [[graft.dedup.Dedup.minhashLsh]] scale path, NOT
  * the raw shingle self-join) over only the gate+exact survivors,
  * then anti-joins the verified losers out. Nothing widens: every
  * stage only drops rows, so the 100 TB input funnels monotonically,
  * and each stage's input is the previous stage's (smaller) output.
  * Gate criteria mirror [[graft.text.TextAnalysis]] semantics.
  */
object TrainingData {

  private val MIN_WORDS = 20
  private val MAX_PUNCT_RATIO = 0.1

  /** Surviving doc_ids with their stats after the four stages. The
    * near-dup stage keeps each pair's lower doc_id (doc_a), dropping
    * doc_b — the same keep-min policy as exact dedup. */
  def curate(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, dir)
    val scored = docs
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_words", size(col("words")).cast("long"))
      .withColumn("punct_ratio",
        round(regexp_count(col("text"), lit("[^a-z0-9 ]")).cast("double") / length(col("text")), 4))
      .withColumn("s_en", expr("size(filter(words, w -> w IN ('the','a','is','and','of')))").cast("long"))
      .withColumn("s_other", greatest(
        expr("size(filter(words, w -> w IN ('der','die','und','das','ist')))").cast("long"),
        expr("size(filter(words, w -> w IN ('el','los','las','es','una')))").cast("long"),
        expr("size(filter(words, w -> w IN ('le','les','une','est','et')))").cast("long")))
    val gated = scored
      .filter(col("n_words") >= MIN_WORDS && col("punct_ratio") <= MAX_PUNCT_RATIO)
      .filter(col("s_en") >= col("s_other"))
      .select(col("doc_id"), col("text"), col("n_words"), col("punct_ratio"))
    // exact dedup as ONE min_by aggregation (keep the min-doc_id row
    // per text hash): a min+semi-join spelling would re-scan the
    // documents and re-evaluate the gate regexes once per branch and
    // add a join shuffle; this shuffles the gated rows once
    // survivors feed both the shingle/minhash pipeline and the final
    // anti-join but are deliberately NOT persisted: an A/B at sf0.1
    // measured the persist ~30% slower end-to-end — the frame carries
    // full text (large to store) while its recompute shares the
    // min_by exchange, so storing buys little and costs a full
    // materialization (cf. the persisted signBands, where a heavy
    // explode collapses to a tiny band frame)
    val survivors = gated
      .groupBy(md5(col("text")).as("h"))
      .agg(min_by(
        struct(col("doc_id"), col("text"), col("n_words"), col("punct_ratio")),
        col("doc_id")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"),
        col("r.n_words").as("n_words"), col("r.punct_ratio").as("punct_ratio"))
    // near-dup losers (higher doc_id of each Jaccard>=0.5 pair) leave;
    // candidates come from MinHash band buckets over survivors only
    val sh = Dedup.shingles(survivors.select(col("doc_id"), col("text")))
    val n = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val losers = Dedup.verifiedJaccard(Dedup.bandCandidates(Dedup.minhashBands(sh)), sh, n)
      .select(col("doc_b").as("doc_id")).distinct()
    survivors
      .join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_words"), col("punct_ratio"))
  }

  val curateQuery: GQuery = GQuery(
    "pipeline_curate",
    (s, dir) => curate(s, dir),
    Some(s"""
      WITH scored AS (
        SELECT doc_id, text,
               len(string_split(text, ' ')) AS n_words,
               round(CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE) / length(text), 4) AS punct_ratio,
               len(list_filter(string_split(text, ' '), w -> w IN ('the','a','is','and','of'))) AS s_en,
               greatest(
                 len(list_filter(string_split(text, ' '), w -> w IN ('der','die','und','das','ist'))),
                 len(list_filter(string_split(text, ' '), w -> w IN ('el','los','las','es','una'))),
                 len(list_filter(string_split(text, ' '), w -> w IN ('le','les','une','est','et')))) AS s_other
        FROM documents),
      gated AS (
        SELECT * FROM scored
        WHERE n_words >= $MIN_WORDS AND punct_ratio <= $MAX_PUNCT_RATIO AND s_en >= s_other),
      exact_kept AS (
        SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
      survivors AS (
        SELECT * FROM gated WHERE doc_id IN (SELECT doc_id FROM exact_kept)),
      ${Dedup.shinglesSqlFrom("survivors")},
      ${Dedup.minhashCandSql},
      ${Dedup.verifySql},
      losers AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
      SELECT doc_id, n_words, punct_ratio
      FROM survivors
      WHERE doc_id NOT IN (SELECT doc_id FROM losers)"""),
    tags = Set("pipeline"))

  def all: Seq[GQuery] = Seq(curateQuery)
}
