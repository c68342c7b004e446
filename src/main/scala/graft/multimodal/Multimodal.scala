package graft.multimodal

import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media row — the typed surface for per-partition
  * decode/feature-extract (see [[Multimodal.decodeFeatures]]). */
final case class MediaRow(
    doc_id: Long, blob: Array[Byte], format: String, width: Int, height: Int)

final case class MediaFeatures(
    doc_id: Long, format: String, n_bytes: Int, mean_byte: Double, frames: Int)

/** §2.4 multimodal-column plumbing: image/audio/video payloads as
  * opaque `binary` columns with a typed metadata struct alongside.
  *
  * The decode step is STUBBED deterministically (no image/audio libs
  * in this environment): the "payload" is the md5 digest of the
  * document text (16 bytes, content-derived, stable) and "decode"
  * computes features of those bytes. Everything AROUND the stub is
  * the real 100 TB design: binary + struct schema, partition-wise
  * batch processing via `mapPartitions` over a typed `Dataset` (the
  * Scala analogue of `mapInPandas` — one iterator per partition, so a
  * real decoder would amortise model/codec init per partition, not
  * per row), and metadata predicates that prune BEFORE touching
  * payload bytes (filter on `meta.format`/`width` pushes to the scan;
  * blobs never shuffle).
  */
object Multimodal {

  private def fmtCol =
    element_at(array(lit("jpeg"), lit("png"), lit("webp")), (col("doc_id") % 3).cast("int") + 1)
  private def widthCol = (lit(64) + (col("doc_id") % 32) * lit(16)).cast("int")
  private def heightCol = (lit(64) + expr("(doc_id DIV 32) % 32") * lit(16)).cast("int")

  /** documents → (doc_id, blob BINARY, meta STRUCT<format,width,height>).
    * Deterministic synthesis standing in for a real media table. */
  private[graft] def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      unhex(md5(col("text"))).as("blob"),
      struct(fmtCol.as("format"), widthCol.as("width"), heightCol.as("height")).as("meta"))

  /** Metadata + payload-shape extraction, all in codegen (no UDF):
    * blob length and first payload byte come from expressions over
    * the binary column. Oracle-checked — DuckDB rebuilds the same
    * deterministic payload. */
  val metadata: GQuery = GQuery(
    "mm_metadata",
    (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        fmtCol.as("format"),
        widthCol.cast("long").as("width"),
        heightCol.cast("long").as("height"),
        length(unhex(md5(col("text")))).cast("long").as("n_bytes"),
        // first payload byte — the blob is unhex(md5(text)), so byte 0
        // is the first hex pair of md5(text) (DuckDB md5 can't digest
        // BLOBs, so both sides read it off the hex string)
        conv(substring(md5(col("text")), 1, 2), 16, 10).cast("long").as("first_feat")),
    Some("""
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
             CAST(64 + (doc_id % 32) * 16 AS BIGINT) AS width,
             CAST(64 + ((doc_id // 32) % 32) * 16 AS BIGINT) AS height,
             CAST(octet_length(unhex(md5(text))) AS BIGINT) AS n_bytes,
             ('0x' || substr(md5(text), 1, 2))::BIGINT AS first_feat
      FROM documents"""),
    tags = Set("multimodal"))

  /** Typed per-partition "decode": one iterator per partition so a
    * real codec would init once per partition (the `mapInPandas`
    * batch shape). The stub derives deterministic features from the
    * payload bytes; MultimodalSpec pins them. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real pipeline: init decoder/model HERE, once per partition
      rows.map { r =>
        val bytes = r.blob
        val mean = if (bytes.isEmpty) 0.0
          else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
        // frame-sample stub: pretend 1 frame per 4 payload bytes
        MediaFeatures(r.doc_id, r.format, bytes.length, mean, bytes.length / 4)
      }
    }
  }

  /** Typed view of [[mediaTable]] for the decode path. */
  def media(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    mediaTable(Tables.documents(spark, dir))
      .select(col("doc_id"), col("blob"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[MediaRow]
  }

  /** The [[decodeFeatures]] mapPartitions path as a checkable key:
    * because the stub decode is deterministic over the payload bytes,
    * the DuckDB oracle replays the whole per-partition "decode"
    * (mean byte = Σ of the 16 md5 bytes / 16 — a power-of-two divide
    * of an exact integer sum, so the double is bit-identical). */
  val decodeFeaturesQuery: GQuery = GQuery(
    "mm_decode_features",
    (s, dir) => {
      import s.implicits._
      decodeFeatures(media(s, dir)).toDF().select(
        col("doc_id"), col("format"),
        col("n_bytes").cast("long").as("n_bytes"),
        col("mean_byte"),
        col("frames").cast("long").as("frames"))
    },
    Some("""
      WITH b AS (SELECT doc_id, ('0x' || substr(md5(text), 2 * i + 1, 2))::BIGINT AS v
                 FROM documents, range(16) t(i))
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
             CAST(16 AS BIGINT) AS n_bytes,
             CAST(sum(v) AS DOUBLE) / 16 AS mean_byte,
             CAST(4 AS BIGINT) AS frames
      FROM b GROUP BY doc_id"""),
    tags = Set("multimodal"))

  /** Video-frame sampling plumbing: each doc carries a synthetic
    * frame count (8 + doc_id%8) and every 4th frame is selected via
    * `sequence`+`explode` — the whole fan-out stays in codegen, the
    * per-frame "feature" is expression-derived, and at scale the
    * explode widens each row by ≤4 sampled frames (bounded, no
    * shuffle). A real decoder slots into the [[decodeFeatures]]
    * partition iterator downstream of this exact shape. */
  val frameSample: GQuery = GQuery(
    "mm_frame_sample",
    (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        explode(sequence(lit(0), (lit(7) + col("doc_id") % 8).cast("int"), lit(4)))
          .as("fi"))
        .select(col("doc_id"), col("fi").cast("long").as("frame_no"))
        .withColumn("frame_feat",
          conv(substring(md5(concat_ws("_", col("doc_id"), col("frame_no"))), 1, 2), 16, 10)
            .cast("long")),
    Some("""
      SELECT doc_id, i AS frame_no,
             ('0x' || substr(md5(doc_id::VARCHAR || '_' || i::VARCHAR), 1, 2))::BIGINT AS frame_feat
      FROM documents, unnest(generate_series(0, 7 + doc_id % 8, 4)) t(i)"""),
    tags = Set("multimodal"))

  /** Resize planning — the metadata-only half of an image-resize
    * stage: fit each image into a 256×256 box preserving aspect ratio
    * with integer floor math (exact, so the oracle replays it), and a
    * `needs_resize` gate. The 100 TB point is WHERE this runs: the
    * fit math needs only the metadata struct plus the stored payload
    * LENGTH (a catalog column in a real media table; synthesized here),
    * so the plan prunes already-small images out of the decode
    * `mapPartitions` before any payload byte is decoded or shuffled —
    * the same gate-at-scan posture as pipeline_curate. The pixel
    * transform itself slots into the
    * [[decodeFeatures]] partition iterator (stubbed like decode;
    * `est_bytes` scales the payload length by the pixel ratio). */
  val resize: GQuery = GQuery(
    "mm_resize",
    (s, dir) =>
      mediaTable(Tables.documents(s, dir))
        .select(col("doc_id"),
          col("meta.width").cast("long").as("width"),
          col("meta.height").cast("long").as("height"),
          length(col("blob")).cast("long").as("n_bytes"))
        .withColumn("mx", greatest(col("width"), col("height")))
        .withColumn("needs_resize", (col("mx") > 256).cast("long"))
        .withColumn("target_w",
          when(col("mx") > 256, expr("width * 256 DIV mx")).otherwise(col("width")))
        .withColumn("target_h",
          when(col("mx") > 256, expr("height * 256 DIV mx")).otherwise(col("height")))
        .withColumn("est_bytes", expr("n_bytes * (target_w * target_h) DIV (width * height)"))
        .drop("mx", "n_bytes"),
    Some("""
      WITH m AS (SELECT doc_id,
                        CAST(64 + (doc_id % 32) * 16 AS BIGINT) AS width,
                        CAST(64 + ((doc_id // 32) % 32) * 16 AS BIGINT) AS height,
                        CAST(octet_length(unhex(md5(text))) AS BIGINT) AS n_bytes
                 FROM documents),
      t AS (SELECT doc_id, width, height, n_bytes, greatest(width, height) AS mx FROM m),
      fit AS (SELECT doc_id, width, height, n_bytes,
                     CAST(mx > 256 AS BIGINT) AS needs_resize,
                     CASE WHEN mx > 256 THEN width * 256 // mx ELSE width END AS target_w,
                     CASE WHEN mx > 256 THEN height * 256 // mx ELSE height END AS target_h
              FROM t)
      SELECT doc_id, width, height, needs_resize, target_w, target_h,
             n_bytes * (target_w * target_h) // (width * height) AS est_bytes
      FROM fit"""),
    tags = Set("multimodal"))

  /** Byte-budget shard planning (the WebDataset/tar-shard layout
    * step): stream-fill documents into ~8 MB shards per format by
    * exclusive-prefix-sum DIV — the same packing math as
    * `pipeline_pack_sequences`, applied to DECODED byte size
    * (width × height × 3 from the metadata struct; payload bytes are
    * never read, matching `mm_resize`'s prune-before-decode posture).
    * Output is the shard manifest (doc count, byte total, doc-id
    * range per shard) a downstream writer consumes. The prefix window
    * partitions by format; the 100 TB variant adds a hash sub-shard
    * to the partition key exactly as pack_sequences does. */
  val shardManifest: GQuery = {
    val budget = 8388608L // 8 MB decoded bytes per shard
    GQuery(
      "mm_shard_manifest",
      (s, dir) => {
        val m = Tables.documents(s, dir).select(
          col("doc_id"), fmtCol.as("format"),
          (widthCol.cast("long") * heightCol.cast("long") * lit(3L)).as("n_bytes"))
        val prefix = org.apache.spark.sql.expressions.Window
          .partitionBy(col("format")).orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        m.withColumn("prefix", coalesce(sum(col("n_bytes")).over(prefix), lit(0L)))
          .withColumn("shard", expr(s"prefix DIV ${budget}L"))
          .groupBy(col("format"), col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("total_bytes"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      },
      Some(s"""
        WITH m AS (SELECT doc_id,
                          ['jpeg','png','webp'][(doc_id % 3)::INT + 1] AS format,
                          CAST((64 + (doc_id % 32) * 16) * (64 + ((doc_id // 32) % 32) * 16) * 3 AS BIGINT) AS n_bytes
                   FROM documents),
        p AS (SELECT doc_id, format, n_bytes,
                     COALESCE(sum(n_bytes) OVER (PARTITION BY format ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
              FROM m),
        sh AS (SELECT doc_id, format, n_bytes, CAST(prefix // $budget AS BIGINT) AS shard FROM p)
        SELECT format, shard, count(*) AS n_docs, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM sh GROUP BY 1, 2"""),
      tags = Set("multimodal"))
  }

  /** Perceptual-hash near-dup detection over the media payload — the
    * image-dedup stage of a multimodal curation pipeline, banded-LSH
    * shaped exactly like [[graft.dedup.Dedup]]'s simhash path but
    * keyed on a PAYLOAD-derived 64-bit hash. The hash itself is the
    * stub half (a real pHash — DCT of the decoded image — would be
    * computed inside the [[decodeFeatures]] partition iterator; here
    * the 64 bits come deterministically off the synthetic payload
    * digest, so both engines can replay them): four 16-bit bands,
    * candidate pairs share ≥1 band bucket, buckets over 64 docs are
    * dropped (the heavy-hitter guard — a degenerate band value must
    * not quadratically explode a bucket), survivors verify by full
    * 64-bit Hamming distance — the output is the verification table
    * (pair, distance, `is_dup` = dist ≤ 12), so the key reports every
    * candidate the LSH surfaced and which survived, non-empty at any
    * corpus; a dedup consumer anti-joins on `is_dup = 1` (the planted
    * payload copies in the generated corpus land at distance 0 —
    * MultimodalSpec asserts them). Never all-pairs: candidate
    * generation is a band-bucket self-join under the cap, verification
    * joins the hash table twice on doc_id (linear, key-partitioned).
    * A production deployment widens the hash to 256 bits / 32-bit
    * bands so bucket occupancy stays data-driven, not birthday-bound;
    * the plan shape is identical. Oracle replays hash, banding, cap,
    * and verify from the same md5 — pair-identical by construction. */
  val dedupPhash: GQuery = {
    val bandCols = (0 until 4).map { i =>
      conv(substring(md5(col("text")), 1 + 4 * i, 4), 16, 10).cast("long").as(s"b$i")
    }
    GQuery(
      "mm_dedup_phash",
      (s, dir) => {
        val h = Tables.documents(s, dir).select(col("doc_id") +: bandCols: _*)
        val bands = h.select(col("doc_id"),
          posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
          .withColumnRenamed("pos", "bi").withColumnRenamed("col", "bv")
        val keepBuckets = bands.groupBy(col("bi"), col("bv"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") <= 64)
          .select(col("bi"), col("bv"))
        val small = bands.join(keepBuckets, Seq("bi", "bv"))
        val cand = small.as("a").join(small.as("b"),
            col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
          .distinct()
        cand
          .join(h.toDF("d1", "a0", "a1", "a2", "a3"), "d1")
          .join(h.toDF("d2", "c0", "c1", "c2", "c3"), "d2")
          .withColumn("dist",
            expr("bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + bit_count(a2 ^ c2) + bit_count(a3 ^ c3)")
              .cast("long"))
          .select(col("d1"), col("d2"), col("dist"),
            (col("dist") <= 12).cast("long").as("is_dup"))
      },
      Some("""
        WITH h AS (SELECT doc_id,
                          ('0x' || substr(md5(text),  1, 4))::BIGINT AS b0,
                          ('0x' || substr(md5(text),  5, 4))::BIGINT AS b1,
                          ('0x' || substr(md5(text),  9, 4))::BIGINT AS b2,
                          ('0x' || substr(md5(text), 13, 4))::BIGINT AS b3
                   FROM documents),
        bands AS (SELECT doc_id, 0 AS bi, b0 AS bv FROM h
                  UNION ALL SELECT doc_id, 1, b1 FROM h
                  UNION ALL SELECT doc_id, 2, b2 FROM h
                  UNION ALL SELECT doc_id, 3, b3 FROM h),
        keep AS (SELECT bi, bv FROM bands GROUP BY 1, 2 HAVING count(*) <= 64),
        small AS (SELECT bands.* FROM bands JOIN keep USING (bi, bv)),
        cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
                 FROM small a JOIN small b USING (bi, bv)
                 WHERE a.doc_id < b.doc_id)
        SELECT d1, d2,
               CAST(bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
                  + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3)) AS BIGINT) AS dist,
               CAST(bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
                  + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3)) <= 12 AS BIGINT) AS is_dup
        FROM cand
        JOIN h ha ON ha.doc_id = d1
        JOIN h hb ON hb.doc_id = d2"""),
      tags = Set("multimodal"))
  }

  def all: Seq[GQuery] =
    Seq(metadata, decodeFeaturesQuery, frameSample, resize, shardManifest, dedupPhash)
}
