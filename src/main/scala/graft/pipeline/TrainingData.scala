package graft.pipeline

import graft.GQuery
import graft.dedup.Dedup
import graft.sources.Tables
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
  * removal reuses the shingle-blocking pair join and anti-joins the
  * losers out. Nothing widens: every stage only drops rows, so the
  * 100 TB input funnels monotonically. Each stage's criteria mirror
  * [[graft.text.TextAnalysis]] / [[graft.dedup.Dedup]] semantics.
  */
object TrainingData {

  private val MIN_WORDS = 20
  private val MAX_PUNCT_RATIO = 0.1

  /** Surviving doc_ids with their stats after the four stages. The
    * near-dup stage keeps each pair's lower doc_id (doc_a), dropping
    * doc_b — the same keep-min policy as exact dedup. */
  def curate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
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
    val exactKept = gated
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    // near-dup losers (higher doc_id of each Jaccard>=0.5 pair) leave
    val losers = Dedup.ngramJaccard.build(spark, dir)
      .select(col("doc_b").as("doc_id")).distinct()
    gated
      .join(exactKept, Seq("doc_id"), "left_semi")
      .join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_words"), col("punct_ratio"))
  }

  val curateQuery: GQuery = GQuery(
    "pipeline_curate",
    (s, dir) => curate(s, dir),
    Some("""
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
        WHERE n_words >= 20 AND punct_ratio <= 0.1 AND s_en >= s_other),
      exact_kept AS (
        SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
      toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
             FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i)),
      n AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      losers AS (
        SELECT DISTINCT doc_b AS doc_id
        FROM inter JOIN n na ON doc_a = na.doc_id JOIN n nb ON doc_b = nb.doc_id
        WHERE round(CAST(inter AS DOUBLE) / (na.n_sh + nb.n_sh - inter), 4) >= 0.5)
      SELECT doc_id, n_words, punct_ratio
      FROM gated
      WHERE doc_id IN (SELECT doc_id FROM exact_kept)
        AND doc_id NOT IN (SELECT doc_id FROM losers)"""),
    tags = Set("pipeline"))

  def all: Seq[GQuery] = Seq(curateQuery)
}
