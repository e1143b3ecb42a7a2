package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal-column queries (builder brief): binary payloads + typed
  * metadata, stubbed decode → feature extraction, frame sampling, resize.
  * The decode stub is deterministic, so these are stable rows-only checks;
  * MultimodalSpec asserts the feature semantics.
  */
object MultimodalQueries {

  private def docs(s: SparkSession, dir: String) = Tables.table(s, dir, "documents")

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_multimodal_features",
      // payload+metadata shaping → per-partition stub decode → 16-bin
      // feature vector. The histogram is deterministic integer math, so
      // the features are hash-checkable: un-normalize back to integer bin
      // counts (f·len recovers the count exactly — float rel. error ~1e-7
      // is < 0.5 for any KB-scale payload) and replicate the byte→nibble
      // binning in DuckDB over hex(payload) pairs. Bin b of the 16-bin
      // histogram = bytes whose high nibble is b.
      (s, dir) => {
        val mm = Multimodal.asMultimodal(docs(s, dir))
        val plen = length(col("payload"))
        def binCount(bin: Int) =
          round(element_at(col("features"), bin + 1) * plen).cast("long").as(s"c$bin")
        Multimodal.decodeFeatures(mm)
          .select(
            col("doc_id"),
            col("meta.format").as("format"),
            col("meta.n_bytes").as("n_bytes"),
            plen.as("payload_bytes"),
            binCount(2), binCount(3), binCount(6), binCount(7),
            size(col("features")).as("n_features"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH b AS (
             |  SELECT doc_id, text, hex(encode(text)) AS hx,
             |         octet_length(encode(text)) AS n
             |  FROM documents),
             |nib AS (
             |  SELECT doc_id, substr(hx, CAST(2*i+1 AS INT), 1) AS c
             |  FROM b, LATERAL unnest(range(n)) AS t(i)),
             |cnt AS (
             |  SELECT doc_id,
             |    SUM(CASE WHEN c='2' THEN 1 ELSE 0 END) AS c2,
             |    SUM(CASE WHEN c='3' THEN 1 ELSE 0 END) AS c3,
             |    SUM(CASE WHEN c='6' THEN 1 ELSE 0 END) AS c6,
             |    SUM(CASE WHEN c='7' THEN 1 ELSE 0 END) AS c7
             |  FROM nib GROUP BY doc_id)
             |SELECT b.doc_id, 'utf8-blob' AS format,
             |  CAST(length(b.text) AS INT) AS n_bytes,
             |  CAST(b.n AS INT) AS payload_bytes,
             |  CAST(COALESCE(cnt.c2, 0) AS BIGINT) AS c2,
             |  CAST(COALESCE(cnt.c3, 0) AS BIGINT) AS c3,
             |  CAST(COALESCE(cnt.c6, 0) AS BIGINT) AS c6,
             |  CAST(COALESCE(cnt.c7, 0) AS BIGINT) AS c7,
             |  16 AS n_features
             |FROM b LEFT JOIN cnt USING (doc_id) ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_multimodal_transform",
      // Pure-expression byte transforms: frame-sample stride 4, resize to a
      // fixed 64 bytes. Checksums are md5 over the UPPERCASE HEX rendering
      // of the bytes (not the raw bytes) because DuckDB's md5 takes VARCHAR
      // only — same determinism pin, and now hash-checkable: the oracle
      // rebuilds the sampled/resized byte streams from hex(payload) pairs.
      (s, dir) => {
        val mm = Multimodal.asMultimodal(docs(s, dir))
        val frames = Multimodal.frameSample(col("payload"), 4)
        mm.select(
            col("doc_id"),
            length(col("payload")).as("payload_len"),
            size(frames).as("n_frames"),
            md5(concat_ws("", transform(frames, b => hex(b))).cast("binary")).as("frames_md5"),
            md5(hex(Multimodal.resize(col("payload"), 64)).cast("binary")).as("resized_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH b AS (
             |  SELECT doc_id, hex(encode(text)) AS hx,
             |         octet_length(encode(text)) AS n
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, string_agg(substr(hx, CAST(8*i+1 AS INT), 2), '' ORDER BY i) AS fs
             |  FROM b, LATERAL unnest(range(GREATEST(CAST(ceil(n / 4.0) AS INT), 1))) AS t(i)
             |  GROUP BY doc_id)
             |SELECT b.doc_id,
             |  CAST(b.n AS INT) AS payload_len,
             |  CAST(GREATEST(CAST(ceil(b.n / 4.0) AS INT), 1) AS INT) AS n_frames,
             |  md5(COALESCE(f.fs, '')) AS frames_md5,
             |  md5(substr(b.hx || repeat('00', 64), 1, 128)) AS resized_md5
             |FROM b LEFT JOIN f USING (doc_id) ORDER BY doc_id""".stripMargin),
    ),
  )
}
