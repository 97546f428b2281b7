package graft.queries

import graft.functions.{Multimodal, Portable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators over the `documents` table: payloads as opaque
  * binary columns with typed metadata, decode / feature-extract / resize /
  * frame-sample as per-partition batch kernels. The media codecs themselves
  * are stubbed deterministically (this container has none — SURVEY.md §2.7);
  * the Spark-side plumbing (binary column, typed Dataset, mapPartitions
  * batching, schema, 1→N frame generator) is the real production shape, and
  * every stub is md5/sha256-derived so DuckDB recomputes identical values.
  */
object MultimodalQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // feature extraction through the typed mapPartitions kernel (the Scala
    // analogue of mapInPandas: one decoder instance per partition, streamed
    // rows, bounded memory) — the strongest multimodal check because the
    // kernel is plain JVM code, not Catalyst, yet must match DuckDB SQL
    "mm_extract_features" -> { (s, dir) =>
      Multimodal.extractFeatures(Multimodal.fromDocuments(s, dir)).toDF()
        .select(col("doc_id"), col("modality"), col("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("duration_ms"), col("sha_prefix"))
    },

    // 1→N frame sampling from an opaque payload: each document yields
    // ceil-ish frames capped at 8, with deterministic per-frame byte offsets
    // and a stubbed per-frame feature. explode(sequence(...)) keeps the
    // generator inside codegen — no UDTF, no driver loop.
    "mm_frame_sample" -> { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), col("source").as("modality"),
          encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
        .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
        .withColumn("n_frames",
          least(expr("n_bytes div 64") + 1L, lit(8L)).cast("long"))
        .withColumn("frame_id", explode(sequence(lit(0L), col("n_frames") - 1L)))
        .withColumn("frame_offset", col("frame_id") * expr("n_bytes div n_frames"))
        .withColumn("feature",
          pmod(Portable.md5Long(concat(col("doc_id").cast("string"), lit(":"),
            col("frame_id").cast("string"))), lit(256L)))
        .select("doc_id", "modality", "n_bytes", "n_frames",
          "frame_id", "frame_offset", "feature")
    },

    // multimodal plumbing: opaque binary payload column + typed metadata,
    // deterministic stub "decode" (md5-derived dimensions — the real decoder
    // would be a library call in mapPartitions; the Spark-side schema,
    // batching and partitioning are the real thing). Lives here so the
    // stub-dimension contract ('w#'/'h#' md5 derivation) stays in one file
    // with its siblings.
    "mm_decode_stub" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"),
        col("source").as("modality"))
        .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
        .withColumn("fake_width",
          pmod(Portable.md5Long(concat(lit("w#"), col("doc_id").cast("string"))),
            lit(1920L)))
        .withColumn("fake_height",
          pmod(Portable.md5Long(concat(lit("h#"), col("doc_id").cast("string"))),
            lit(1080L)))
        .select("doc_id", "modality", "n_bytes", "fake_width", "fake_height")
    },

    // resize planning: fit stubbed (w, h) into a 256-box preserving aspect
    // ratio with exact integer arithmetic (the metadata side of a real
    // libvips/ffmpeg resize; the pixel kernel would ride mapPartitions as in
    // mm_extract_features)
    "mm_resize_stub" -> { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), col("source").as("modality"))
        .withColumn("w",
          pmod(Portable.md5Long(concat(lit("w#"), col("doc_id").cast("string"))),
            lit(1920L)) + 1L)
        .withColumn("h",
          pmod(Portable.md5Long(concat(lit("h#"), col("doc_id").cast("string"))),
            lit(1080L)) + 1L)
        .withColumn("out_w", expr("w * 256 div greatest(w, h)"))
        .withColumn("out_h", expr("h * 256 div greatest(w, h)"))
        .select("doc_id", "modality", "w", "h", "out_w", "out_h")
    })

  val oracles: Map[String, String] = Map(

    "mm_decode_stub" ->
      """SELECT doc_id, source AS modality,
        |       CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
        |       ('0x' || substr(md5('w#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1920 AS fake_width,
        |       ('0x' || substr(md5('h#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1080 AS fake_height
        |FROM documents""".stripMargin,

    // mirrors Multimodal.decodeKernel: h = first 15 hex chars of sha256 as a
    // long; dims/duration derived with the same integer ops
    "mm_extract_features" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         ['image', 'audio', 'video', 'text'][CAST(doc_id % 4 AS INT) + 1] AS modality,
        |         coalesce(text, '') AS text
        |  FROM documents
        |), h AS (
        |  -- DuckDB sha256(VARCHAR) hashes the UTF-8 bytes = Spark's sha-256
        |  -- of encode(text, 'UTF-8'); null text is zero bytes on both sides
        |  SELECT doc_id, modality,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |         substr(sha256(text), 1, 16) AS sha_prefix,
        |         ('0x' || substr(sha256(text), 1, 15))::BIGINT AS hv
        |  FROM m
        |)
        |SELECT doc_id, modality, n_bytes,
        |       hv % 1920 + 1 AS width,
        |       (hv // 1920) % 1080 + 1 AS height,
        |       CASE WHEN modality = 'image' THEN 0 ELSE hv % 600000 END AS duration_ms,
        |       sha_prefix
        |FROM h""".stripMargin,

    "mm_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id, source AS modality,
        |         CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, modality, n_bytes,
        |         least(n_bytes // 64 + 1, 8) AS n_frames
        |  FROM d
        |), fr AS (
        |  SELECT doc_id, modality, n_bytes, n_frames,
        |         CAST(unnest(range(n_frames)) AS BIGINT) AS frame_id
        |  FROM f
        |)
        |SELECT doc_id, modality, n_bytes, n_frames, frame_id,
        |       frame_id * (n_bytes // n_frames) AS frame_offset,
        |       ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(frame_id AS VARCHAR)), 1, 15))::BIGINT % 256 AS feature
        |FROM fr""".stripMargin,

    "mm_resize_stub" ->
      """WITH d AS (
        |  SELECT doc_id, source AS modality,
        |         ('0x' || substr(md5('w#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1920 + 1 AS w,
        |         ('0x' || substr(md5('h#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1080 + 1 AS h
        |  FROM documents
        |)
        |SELECT doc_id, modality, w, h,
        |       w * 256 // greatest(w, h) AS out_w,
        |       h * 256 // greatest(w, h) AS out_h
        |FROM d""".stripMargin
  )
}
