package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.sources.Tables

/** Text-analysis queries over the `documents` table: token counting,
  * quality scoring, language ID, fingerprinting — the text half of the
  * LLM-training-data pipeline operators (builder brief; SURVEY.md §7.5).
  *
  * Each is a pure map stage (no shuffle except the final order), expressed
  * with the same formulas in the DuckDB oracle so values hash-match exactly.
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String) = Tables.table(s, dir, "documents")

  /** DuckDB equivalents of TextOps building blocks. */
  private val dkTokens = "string_split_regex(trim(lower(text)), '\\s+')"
  private def dkHits(words: Seq[String]) =
    s"len(list_filter($dkTokens, x -> x IN (${words.map(w => s"'$w'").mkString(",")})))"
  private val dkEn = dkHits(TextOps.stopwords("en"))
  private val dkDe = dkHits(TextOps.stopwords("de"))
  private val dkEs = dkHits(TextOps.stopwords("es"))
  private val dkFr = dkHits(TextOps.stopwords("fr"))

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_text_tokens",
      (s, dir) => {
        docs(s, dir)
          .select(
            col("doc_id"),
            TextOps.tokenCount(col("text")).as("n_tokens"),
            // BPE-ish sub-word segmentation: letter runs, digit runs, and
            // single punctuation marks each count as a token
            expr("size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0))")
              .as("n_bpe_tokens"),
            length(col("text")).as("n_chars_real"),
            round(TextOps.meanWordLen(col("text")), 6).as("mean_word_len"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
              |  CAST(len($dkTokens) AS INT) AS n_tokens,
              |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INT) AS n_bpe_tokens,
              |  CAST(length(text) AS INT) AS n_chars_real,
              |  round(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
              |        / greatest(len($dkTokens), 1), 6) AS mean_word_len
              |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_text_quality",
      (s, dir) => {
        docs(s, dir)
          .select(
            col("doc_id"),
            round(TextOps.punctRatio(col("text")), 6).as("punct_ratio"),
            round(TextOps.stopwordRatio(col("text")), 6).as("stopword_ratio"),
            TextOps.qualityScore(col("text")).as("quality"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
              |  round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()-]', '', 'g')) AS DOUBLE)
              |        / greatest(length(text), 1), 6) AS punct_ratio,
              |  round(CAST($dkEn AS DOUBLE) / greatest(len($dkTokens), 1), 6) AS stopword_ratio,
              |  floor(
              |    (least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4 +
              |    least((CAST($dkEn AS DOUBLE) / greatest(len($dkTokens), 1)) * 5.0, 1.0) * 0.3 +
              |    (1.0 - least((CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()-]', '', 'g')) AS DOUBLE)
              |                  / greatest(length(text), 1)) * 10.0, 1.0)) * 0.3)
              |    * 1e6) / 1e6 AS quality
              |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_text_langid",
      (s, dir) => {
        docs(s, dir)
          .select(
            col("doc_id"),
            TextOps.stopwordHits(col("text"), "en").as("en_hits"),
            TextOps.stopwordHits(col("text"), "de").as("de_hits"),
            TextOps.langId(col("text")).as("pred_lang"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
              |  CAST($dkEn AS INT) AS en_hits,
              |  CAST($dkDe AS INT) AS de_hits,
              |  CASE WHEN $dkEn >= $dkDe AND $dkEn >= $dkEs AND $dkEn >= $dkFr THEN 'en'
              |       WHEN $dkDe >= $dkEs AND $dkDe >= $dkFr THEN 'de'
              |       WHEN $dkEs >= $dkFr THEN 'es'
              |       ELSE 'fr' END AS pred_lang
              |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_text_fingerprint",
      (s, dir) => {
        docs(s, dir)
          .select(
            col("doc_id"),
            TextOps.fingerprint(col("text")).as("fp"),
            TextOps.shingleFingerprint(col("text")).as("shingle_fp"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
              |  md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
              |  list_min(list_transform(
              |    range(1, greatest(len($dkTokens) - 2, 1) + 1),
              |    i -> md5(array_to_string(($dkTokens)[i:i+2], ' ')))) AS shingle_fp
              |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_text_rollhash",
      // Rolling (Rabin) polynomial fingerprint — oracle reproduces the exact
      // Horner fold in DuckDB via list_reduce over the byte values.
      (s, dir) => {
        docs(s, dir)
          .select(col("doc_id"), TextOps.rollingFingerprint(col("text")).as("rh"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  list_reduce(
             |    list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(1, length(t) + 1),
             |                     i -> CAST(ord(t[CAST(i AS INT)]) AS BIGINT))),
             |    (h, c) -> (h * 1000003 + c) % 2147483647) AS rh
             |FROM (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_text_redact",
      // PII redaction: plant a deterministic email + phone per doc, strip
      // both with the same regexes on both sides (RE2-compatible subset so
      // Java regex and DuckDB RE2 agree).
      (s, dir) => {
        docs(s, dir)
          .select(col("doc_id"),
            concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com or 555-123-4567 now")).as("dirty"))
          .select(
            col("doc_id"),
            length(col("dirty")).as("n_dirty"),
            regexp_replace(
              regexp_replace(col("dirty"),
                "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "[EMAIL]"),
              "\\b\\d{3}-\\d{3}-\\d{4}\\b", "[PHONE]").as("clean"))
          .withColumn("n_clean", length(col("clean")))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, n_dirty, clean, CAST(length(clean) AS INT) AS n_clean FROM (
             |  SELECT doc_id, CAST(length(dirty) AS INT) AS n_dirty,
             |    regexp_replace(
             |      regexp_replace(dirty, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '[EMAIL]', 'g'),
             |      '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g') AS clean
             |  FROM (SELECT doc_id,
             |          text || ' contact user' || doc_id || '@example.com or 555-123-4567 now' AS dirty
             |        FROM documents))
             |ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_text_lang_stats",
      // Aggregate shape: predicted-language distribution vs labeled lang.
      (s, dir) => {
        docs(s, dir)
          .groupBy(col("lang"), TextOps.langId(col("text")).as("pred_lang"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("pred_lang"))
      },
      Some(s"""SELECT lang,
              |  CASE WHEN $dkEn >= $dkDe AND $dkEn >= $dkEs AND $dkEn >= $dkFr THEN 'en'
              |       WHEN $dkDe >= $dkEs AND $dkDe >= $dkFr THEN 'de'
              |       WHEN $dkEs >= $dkFr THEN 'es'
              |       ELSE 'fr' END AS pred_lang,
              |  COUNT(*) AS n
              |FROM documents GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin),
    ),
  )
}
