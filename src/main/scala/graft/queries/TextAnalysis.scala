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

  /** [[docs]] spread over every core before CPU-heavy NARROW text
    * expressions (langid scoring, fingerprint regex+md5, chunk slicing):
    * scan parallelism is row-group-bound, so a small corpus funnels those
    * expressions through 1-3 tasks (r19 measured). Only the queries whose
    * per-row expression cost dominates use this —
    * for explode→aggregate shapes (tfidf, vocab, rollhash, splits) the
    * extra exchange measured as pure overhead and they stay on [[docs]],
    * and the CHEAP map-only queries (tokens, quality, redact — single
    * regex passes per row) reverted to [[docs]] in r20: the driver's r19
    * run regressed all three (0.64-0.73×) and their 8-core runs beat
    * 32-core (PERF_r19 scaling 0.42-0.53), i.e. 32 × (task setup + codegen
    * init) exceeds the per-row win when per-row work is a few µs.
    * No-op at scale (Rebalance.smallInput is bytes-gated). */
  private def docsRebalanced(s: SparkSession, dir: String) =
    graft.operators.Rebalance.smallInput(Tables.table(s, dir, "documents"))

  /** DuckDB equivalents of TextOps building blocks. */
  private val dkTokens = "string_split_regex(trim(lower(text)), '\\s+')"

  /** DuckDB mirror of [[graft.operators.LanguageModel.bpeWords]] — the word
    * stream every BPE entry point trains/encodes over: U+0000–U+0008
    * stripped (so a sentinel byte can never be content) and then-empty
    * tokens dropped. Stripping before vs after tokenization is equivalent
    * (\\x00–\\x08 are not \\s, so whitespace positions are unchanged), and
    * on the pinned corpus (no control characters, no empty docs) this is
    * value-identical to the raw `dkTokens` stream — but on a regenerated
    * dirty corpus the raw stream would diverge from the engine: an
    * empty/whitespace-only doc must VANISH from bpeEncode output (no words
    * → no group row), not emit a phantom (n_words=1, n_units=1) row for
    * DuckDB's ''→[''] split artifact. */
  private val dkBpeTokens =
    "list_filter(string_split_regex(trim(lower(" +
      "regexp_replace(text, '[\\x00-\\x08]', '', 'g'))), '\\s+'), x -> x <> '')"
  private def dkHits(words: Seq[String]) =
    s"len(list_filter($dkTokens, x -> x IN (${words.map(w => s"'$w'").mkString(",")})))"
  private val dkEn = dkHits(TextOps.stopwords("en"))
  private val dkDe = dkHits(TextOps.stopwords("de"))
  private val dkEs = dkHits(TextOps.stopwords("es"))
  private val dkFr = dkHits(TextOps.stopwords("fr"))

  /** DuckDB mirror of [[graft.operators.LanguageModel.bpeTrainMerges]],
    * unrolled to `numMerges` rounds: each round re-derives the sub-word
    * list from the sentinel segmentation string (substr + string_split —
    * the operator's exact representation), counts corpus-weighted adjacent
    * pairs (overlapping, via an index unnest), takes the deterministic
    * argmax (n DESC, a, b), and applies the merge with the same literal
    * `replace` on the next seg CTE. chr(2)/chr(3) = the operator's
    * SegOpen/SegClose sentinels. */
  private val dkO = "chr(2)"
  private val dkC = "chr(3)"

  /** The shared training-CTE chain: wf → seg0 → (tk/pairs/best/seg)×k,
    * ending at best{numMerges-1}. Every CTE is MATERIALIZED — each segK
    * carries four scalar-subquery references to bestK, and DuckDB's
    * default CTE inlining makes the chain's expansion exponential in
    * numMerges without it. */
  private def bpeCtes(numMerges: Int): String = {
    val O = dkO
    val C = dkC
    val sb = new StringBuilder
    sb.append(
      s"""WITH wf AS MATERIALIZED (
         |  SELECT word, COUNT(*) AS wf FROM (
         |    SELECT unnest($dkBpeTokens) AS word FROM documents)
         |  GROUP BY word HAVING length(word) >= 2),
         |seg0 AS MATERIALIZED (SELECT wf, regexp_replace(word, '(.)', $O || '\\1' || $C, 'g') AS seg FROM wf)""".stripMargin)
    for (k <- 0 until numMerges) {
      sb.append(
        s""",
           |tk$k AS MATERIALIZED (SELECT wf, string_split(substr(seg, 2, length(seg) - 2), $C || $O) AS l FROM seg$k),
           |pairs$k AS MATERIALIZED (SELECT l[i] AS a, l[i + 1] AS b, wf
           |  FROM (SELECT wf, l, unnest(range(1, len(l))) AS i FROM tk$k WHERE len(l) >= 2)),
           |best$k AS MATERIALIZED (SELECT a, b, CAST(SUM(wf) AS BIGINT) AS n FROM pairs$k
           |  GROUP BY a, b ORDER BY n DESC, a, b LIMIT 1)""".stripMargin)
      if (k + 1 < numMerges) sb.append(
        s""",
           |seg${k + 1} AS MATERIALIZED (SELECT wf, replace(seg,
           |  $O || (SELECT a FROM best$k) || $C || $O || (SELECT b FROM best$k) || $C,
           |  $O || (SELECT a FROM best$k) || (SELECT b FROM best$k) || $C) AS seg FROM seg$k)""".stripMargin)
    }
    sb.toString
  }

  private def bpeTrainOracle(numMerges: Int): String =
    bpeCtes(numMerges) +
      (0 until numMerges).map(k =>
        s"SELECT $k AS rank, a, b, n FROM best$k").mkString(
        "\nSELECT * FROM (\n", "\nUNION ALL ", "\n) ORDER BY rank")

  /** Encode tail on top of [[bpeCtes]]: re-derive the learned merges from
    * the training chain's bestK rows, then apply them IN RANK ORDER to
    * every token occurrence (no vocab length filter — encode covers
    * 1-char words too) and aggregate per-document unit counts. */
  private def bpeEncodeOracle(numMerges: Int): String = {
    val O = dkO
    val C = dkC
    val sb = new StringBuilder(bpeCtes(numMerges))
    sb.append(
      s""",
         |enc0 AS MATERIALIZED (
         |  SELECT doc_id, regexp_replace(word, '(.)', $O || '\\1' || $C, 'g') AS seg
         |  FROM (SELECT doc_id, unnest($dkBpeTokens) AS word FROM documents))""".stripMargin)
    for (k <- 0 until numMerges) {
      sb.append(
        s""",
           |enc${k + 1} AS MATERIALIZED (SELECT doc_id, replace(seg,
           |  $O || (SELECT a FROM best$k) || $C || $O || (SELECT b FROM best$k) || $C,
           |  $O || (SELECT a FROM best$k) || (SELECT b FROM best$k) || $C) AS seg FROM enc$k)""".stripMargin)
    }
    sb.append(
      s"""
         |SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(len(string_split(substr(seg, 2, greatest(length(seg) - 2, 0)), $C || $O))) AS BIGINT) AS n_units
         |FROM enc$numMerges GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    sb.toString
  }

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
        docsRebalanced(s, dir)
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
        docsRebalanced(s, dir)
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
      "q_text_chunk",
      // Context-window chunking: 50-token windows, stride 40 (10-token
      // overlap) — the standard LLM-pretraining document splitter. Pure
      // codegen'd array ops; chunk grid is data-independent so the stage is
      // map-only at any scale.
      (s, dir) => {
        docsRebalanced(s, dir)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            posexplode(transform(
              sequence(lit(1), greatest(size(col("toks")) - 49, lit(1)), lit(40)),
              i => concat_ws(" ", slice(col("toks"), i, lit(50))))).as(Seq("chunk_idx", "chunk")))
          .withColumn("n_chunk_tokens", size(split(col("chunk"), " ")))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some(s"""SELECT doc_id, CAST((i - 1) / 40 AS INT) AS chunk_idx,
              |  array_to_string(($dkTokens)[i:i+49], ' ') AS chunk,
              |  CAST(len(string_split(array_to_string(($dkTokens)[i:i+49], ' '), ' ')) AS INT) AS n_chunk_tokens
              |FROM documents,
              |  UNNEST(range(1, greatest(len($dkTokens) - 49, 1) + 1, 40)) AS t(i)
              |ORDER BY doc_id, chunk_idx""".stripMargin),
    ),

    QueryDef(
      "q_split_hash",
      // Deterministic train/val/test assignment: md5-hash the doc id into
      // 256 buckets, 80/10/10 split. Hash-based splits are reproducible
      // across engines, runs, and partitionings — the property a training
      // pipeline needs (random() is none of those).
      (s, dir) => {
        docs(s, dir)
          .select(col("doc_id"),
            conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2), 16, 10)
              .cast("int").as("bucket"))
          .withColumn("split",
            when(col("bucket") < 205, "train").when(col("bucket") < 230, "val").otherwise("test"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, bucket,
             |  CASE WHEN bucket < 205 THEN 'train' WHEN bucket < 230 THEN 'val' ELSE 'test' END AS split
             |FROM (SELECT doc_id,
             |        CAST((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
             |           + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS INT) AS bucket
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_split_leakage_safe",
      // Dedup-aware split: a naive per-row hash split puts copies of one
      // document on both sides (the test set then scores memorization).
      // Every row hashes its duplicate-class representative (min doc_id
      // over the normalized-text fingerprint) instead — planted
      // whitespace-perturbed copies (+500000) provably co-assign with
      // their originals, checked by the oracle on every row.
      (s, dir) => {
        val d = docs(s, dir).select(col("doc_id"), col("text"))
        val corpus = d.unionAll(
          d.filter(col("doc_id") < 25).select((col("doc_id") + 500000).as("doc_id"),
            concat(lit("  "), col("text"), lit(" ")).as("text")))
        graft.operators.Sampling
          .leakageSafeSplit(corpus, col("doc_id"), TextOps.fingerprint(col("text")))
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL SELECT doc_id + 500000, '  ' || text || ' '
             |    FROM documents WHERE doc_id < 25),
             |fp AS (SELECT doc_id,
             |         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS gk
             |       FROM corpus),
             |reps AS (SELECT gk, CAST(MIN(doc_id) AS BIGINT) AS rep FROM fp GROUP BY gk),
             |j AS (SELECT f.doc_id, r.rep,
             |        CAST((strpos('0123456789abcdef', substr(md5(CAST(r.rep AS VARCHAR)), 1, 1)) - 1) * 16
             |           + (strpos('0123456789abcdef', substr(md5(CAST(r.rep AS VARCHAR)), 2, 1)) - 1) AS INT) AS bucket
             |      FROM fp f JOIN reps r USING (gk))
             |SELECT doc_id, rep, bucket,
             |  CASE WHEN bucket < 205 THEN 'train' WHEN bucket < 230 THEN 'val' ELSE 'test' END AS split
             |FROM j ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_vocab_topk",
      // Corpus vocabulary extraction: top-100 tokens by document frequency.
      // Distinct-per-doc explode → hash-aggregate (map-side combine) →
      // TakeOrderedAndProject: the df counting pattern that feeds stopword
      // lists and tokenizer vocabularies.
      (s, dir) => {
        docs(s, dir)
          .select(col("doc_id"), explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("tok"))
          .limit(100)
      },
      Some(s"""SELECT tok, COUNT(*) AS df FROM (
              |  SELECT doc_id, unnest(list_distinct($dkTokens)) AS tok FROM documents)
              |GROUP BY tok ORDER BY df DESC, tok LIMIT 100""".stripMargin),
    ),

    QueryDef(
      "q_text_repetition",
      // Repetition-ratio quality signal (the repetitive-text filter from
      // web-corpus pipelines): fraction of all word bigrams taken by the
      // single most frequent bigram. Two hash-aggregates, no window.
      (s, dir) => {
        docs(s, dir)
          .select(col("doc_id"), explode(TextOps.shingles(col("text"), 2)).as("bg"))
          .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("n"))
          .groupBy(col("doc_id"))
          .agg(max(col("n")).as("max_bg"), sum(col("n")).as("n_bg"))
          .select(col("doc_id"), col("max_bg"), col("n_bg"),
            (floor(col("max_bg").cast("double") / col("n_bg") * 1e6) / 1e6).as("rep_ratio"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH bg AS (
              |  SELECT doc_id,
              |    unnest(list_transform(
              |      range(1, greatest(len($dkTokens) - 1, 1) + 1),
              |      i -> array_to_string(($dkTokens)[i:i+1], ' '))) AS bg
              |  FROM documents),
              |c AS (SELECT doc_id, bg, COUNT(*) AS n FROM bg GROUP BY 1, 2)
              |SELECT doc_id, max(n) AS max_bg, CAST(sum(n) AS BIGINT) AS n_bg,
              |  floor(CAST(max(n) AS DOUBLE) / CAST(sum(n) AS BIGINT) * 1e6) / 1e6 AS rep_ratio
              |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_text_tfidf",
      // TF-IDF top-3 terms per document: tf from a per-doc hash-aggregate,
      // document frequency from a second aggregate over the distinct
      // (doc, term) pairs, score = tf·ln(N/df) (floor-truncated at 1e-6 —
      // engine-independent tie rule), per-doc top-3 via a totally-ordered
      // window. Two shuffles (doc-term, then term) + one window — the
      // at-scale feature-extraction shape.
      (s, dir) => {
        val d = docs(s, dir)
        val n = d.count()
        val tf = d
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("tok"))
        tf.join(dfreq, "tok")
          .withColumn("tfidf",
            floor(col("tf") * log(lit(n.toDouble) / col("df")) * 1e6) / 1e6)
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("doc_id"), col("tok"), col("tf"), col("tfidf"), col("rnk"))
          .orderBy(col("doc_id"), col("rnk"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, unnest($dkTokens) AS tok FROM documents),
              |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
              |dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
              |n AS (SELECT COUNT(*) AS n FROM documents),
              |scored AS (
              |  SELECT doc_id, tok, tf,
              |    floor(tf * ln(CAST(n AS DOUBLE) / df) * 1e6) / 1e6 AS tfidf
              |  FROM tf JOIN dfreq USING (tok) CROSS JOIN n),
              |ranked AS (SELECT *, row_number() OVER (
              |    PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rnk FROM scored)
              |SELECT doc_id, tok, tf, tfidf, CAST(rnk AS INT) AS rnk
              |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin),
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
      "q_text_perplexity",
      // Corpus-trained bigram-LM perplexity scoring (the CCNet/KenLM-style
      // quality signal): fit add-0.5 bigram counts on the corpus, score each
      // doc by average per-bigram negative log-likelihood. Per-term log
      // probs are floor-truncated to 1e-4 and carried as exact BIGINTs, so
      // per-doc sums are integer math — partial-aggregation-order- and
      // libm-independent (see LanguageModel's determinism contract).
      (s, dir) => {
        graft.operators.LanguageModel
          .bigramNllScoresCorpusVocab(docs(s, dir), col("doc_id"), col("text"))
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $dkTokens AS toks FROM documents),
              |occ AS (
              |  SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS bg
              |  FROM t, UNNEST(range(1, len(toks))) AS u(i)
              |  WHERE len(toks) >= 2),
              |c12 AS (SELECT bg, COUNT(*) AS c12 FROM occ GROUP BY bg),
              |c1 AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c1 FROM occ GROUP BY 1),
              |v AS (SELECT COUNT(DISTINCT tok) AS v
              |      FROM (SELECT unnest(toks) AS tok FROM t)),
              |model AS (
              |  SELECT bg,
              |    CAST(floor(ln((c12 + 0.5) / (c1 + 0.5 * v)) * 1e4) AS BIGINT) AS logp_scaled
              |  FROM c12 JOIN c1 ON split_part(bg, ' ', 1) = w1 CROSS JOIN v)
              |SELECT doc_id, COUNT(*) AS n_bigrams,
              |  CAST(SUM(logp_scaled) AS BIGINT) AS sum_logp_scaled,
              |  floor((-CAST(SUM(logp_scaled) AS BIGINT) * 100) / COUNT(*)) / 1e6 AS avg_nll
              |FROM occ JOIN model USING (bg)
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_bpe_pairs",
      // BPE tokenizer training, iteration one: corpus-weighted adjacent
      // char-pair counts over the word vocabulary, top-20 merge candidates.
      // Corpus collapses to the word-frequency table before any pair work.
      (s, dir) => {
        graft.operators.LanguageModel.bpeMergeCandidates(docs(s, dir), col("text"), k = 20)
      },
      Some(s"""WITH wf AS (
              |  SELECT word, COUNT(*) AS wf FROM (
              |    SELECT unnest($dkBpeTokens) AS word FROM documents)
              |  GROUP BY word HAVING length(word) >= 2),
              |pairs AS (
              |  SELECT substr(word, CAST(i AS INT), 2) AS pair, wf
              |  FROM wf, UNNEST(range(1, length(word))) AS u(i))
              |SELECT pair, CAST(SUM(wf) AS BIGINT) AS n
              |FROM pairs GROUP BY pair
              |ORDER BY n DESC, pair LIMIT 20""".stripMargin),
    ),

    QueryDef(
      "q_bpe_train",
      // Full BPE tokenizer training: 6 merge rounds over the vocabulary,
      // output = the learned merge table. The oracle mirrors the training
      // loop EXACTLY, unrolled — each round is the same pair-count /
      // argmax / sentinel-string replace the operator runs, so the merge
      // sequence (data-dependent at every step) is hash-checked end to end.
      (s, dir) => {
        graft.operators.LanguageModel.bpeTrainMerges(docs(s, dir), col("text"), numMerges = 6)
      },
      Some(bpeTrainOracle(6)),
    ),

    QueryDef(
      "q_bpe_encode",
      // Tokenizer train → APPLY: learn 6 merges, then encode the corpus
      // with them — per-doc word and sub-word-unit counts, the token-budget
      // accounting step. The whole merge table applies inside ONE native
      // BpeUnits expression over the DISTINCT vocabulary (32k-rank-ready;
      // BpeVolume encode32k); the token stream joins the unique per-word
      // unit count. The oracle re-derives the merges through the same
      // unrolled training chain and applies them as rank-ordered sentinel
      // replaces to every token occurrence — the hash match doubles as the
      // native-vs-replace-chain cross-check.
      (s, dir) => {
        val m = graft.operators.LanguageModel
          .bpeTrainMerges(docs(s, dir), col("text"), numMerges = 6)
          .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
        graft.operators.LanguageModel
          .bpeEncode(docs(s, dir), col("doc_id"), col("text"), m)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      },
      Some(bpeEncodeOracle(6)),
    ),

    QueryDef(
      "q_text_lang_stats",
      // Aggregate shape: predicted-language distribution vs labeled lang.
      (s, dir) => {
        docsRebalanced(s, dir)
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
