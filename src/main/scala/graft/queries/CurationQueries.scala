package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{BloomJoin, Sampling}
import graft.sources.Tables

/** Corpus-curation operators (round 4): incremental dedup against an
  * existing corpus, global-percentile quality gating, sentence-level
  * duplication stats, and ordered string aggregation.
  *
  * All four are oracle-checked. q_dedup_incremental is another
  * result-neutral-optimization proof (like q_bloom_join / q_salted_*): the
  * oracle is the plain NOT EXISTS anti-join, the Spark side routes through
  * the bloom fast path, and the hash check proves the optimization changed
  * the plan but not one output row.
  */
object CurationQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_dedup_incremental",
      // Incremental ingest dedup: drop incoming documents whose exact text
      // already exists in the corpus. The corpus key set is sketched into a
      // bloom filter (a few MB at any corpus size); batch rows the bloom has
      // definitely never seen skip the shuffle entirely, and only the
      // maybe-seen minority pays a real anti-join on the full text (which
      // also removes hash collisions and bloom false positives).
      // The synthetic corpus has no natural cross-source exact duplicates,
      // so the incoming batch is sources src0-src4 PLUS planted exact
      // copies of src10's texts (new doc_ids) — built identically on both
      // sides. The planted rows must be dropped; the genuinely-new majority
      // rides the bloom's definitely-new fast path.
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val fresh = docs
          .filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
          .select(col("doc_id"), col("text"))
        val planted = docs.filter(col("source") === "src10")
          .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        val batch = fresh.unionByName(planted)
        val corpus = docs.filter(col("source").rlike("^src1[0-9]$"))
          .select(col("text").as("corpus_text"))
        BloomJoin.bloomAntiJoin(
          batch, corpus,
          bigKey = xxhash64(col("text")),
          smallKey = xxhash64(col("corpus_text")),
          condition = col("text") === col("corpus_text"))
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH batch AS (
             |  SELECT doc_id, text FROM documents
             |  WHERE source IN ('src0','src1','src2','src3','src4')
             |  UNION ALL
             |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE source = 'src10'),
             |corpus AS (
             |  SELECT text FROM documents WHERE regexp_matches(source, '^src1[0-9]$'))
             |SELECT doc_id FROM batch w
             |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = w.text)
             |ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_quality_gate",
      // Global-percentile quality gate: keep documents whose length sits in
      // the corpus-wide [p10, p90] band. The two scalar thresholds come from
      // one exact-percentile aggregate and ride into the filter as a
      // broadcast nested-loop join of a single row — no per-row shuffle, and
      // at 100 TB the thresholds would come from approx_percentile with the
      // same plan shape (exact percentile buffers all distinct values of the
      // single global group on one task — the concrete switch-over threshold
      // is in SCALE.md "Exact percentile"). Both engines interpolate
      // percentiles as (n-1)*p linear interpolation, so the band edges
      // agree exactly.
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bounds = docs.agg(
          percentile(col("n_chars"), lit(0.1)).as("lo"),
          percentile(col("n_chars"), lit(0.9)).as("hi"))
        docs.select(col("doc_id"), col("lang"), col("n_chars"))
          .crossJoin(broadcast(bounds))
          .filter(col("n_chars") >= col("lo") && col("n_chars") <= col("hi"))
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH b AS (SELECT quantile_cont(n_chars, 0.1) AS lo,
             |                  quantile_cont(n_chars, 0.9) AS hi FROM documents)
             |SELECT doc_id, lang, n_chars FROM documents, b
             |WHERE n_chars >= b.lo AND n_chars <= b.hi
             |ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_para_dedup",
      // Sentence-level duplication stats (the Lee et al. "Deduplicating
      // Training Data" signal, at sentence granularity): for each document,
      // the fraction of its distinct sentences that also appear in some
      // other document. Two hash-aggregates (sentence→doc-frequency, then
      // doc→dup fraction) joined on the sentence key — the inverted-index
      // shape, map-side combined, no window over full per-sentence history.
      // The synthetic texts contain no '. ' at all, so the ledger is
      // augmented (identically on both sides) with composite documents:
      // for every 5th doc, a planted two-sentence doc whose first sentence
      // IS the original text — cross-document sentence sharing the operator
      // must detect through the sentence-key shuffle.
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val base = docs.select(col("doc_id"), col("text"))
        val composite = docs.filter(col("doc_id") % 5 === 0)
          .select(
            (col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(". tail marker "),
              col("doc_id").cast("string")).as("text"))
        val sents = base.unionByName(composite)
          .select(col("doc_id"), explode(split(col("text"), "\\. ")).as("sent"))
          .filter(length(col("sent")) > 0)
          .distinct()
        val sdf = sents.groupBy(col("sent")).agg(count(lit(1)).as("sent_docs"))
        sents.join(sdf, "sent")
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_sents"),
            sum(when(col("sent_docs") >= 2, 1L).otherwise(0L)).as("dup_sents"))
          .filter(col("dup_sents") > 0)
          .orderBy(col("doc_id"))
      },
      Some("""WITH docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000 AS doc_id,
             |         text || '. tail marker ' || CAST(doc_id AS VARCHAR) AS text
             |  FROM documents WHERE doc_id % 5 = 0),
             |sents AS (
             |  SELECT DISTINCT doc_id, s AS sent
             |  FROM (SELECT doc_id, unnest(string_split(text, '. ')) AS s FROM docs)
             |  WHERE length(s) > 0),
             |sdf AS (SELECT sent, COUNT(*) AS sent_docs FROM sents GROUP BY sent)
             |SELECT doc_id, COUNT(*) AS n_sents,
             |       CAST(SUM(CASE WHEN sent_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_sents
             |FROM sents JOIN sdf USING (sent)
             |GROUP BY doc_id HAVING SUM(CASE WHEN sent_docs >= 2 THEN 1 ELSE 0 END) > 0
             |ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_curation_pipeline",
      // The end-to-end curation chain a training-data run actually executes,
      // as ONE plan: plant exact dups → language allowlist → global-
      // percentile length gate → exact dedup (min-doc_id representative per
      // text) → deterministic train/val/test hash split → per (lang, split)
      // accounting. Every stage is a narrow map/filter or a map-side-
      // combined aggregate; the only shuffles are the dedup hash-aggregate
      // and the final small rollup. Oracle replays the identical chain in
      // DuckDB CTEs — one hash check covers the whole pipeline's
      // composition, not just each stage in isolation.
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
        // planted: every 7th doc duplicated at +200000 (dedup must drop these)
        val ledger = docs.unionByName(
          docs.filter(col("doc_id") % 7 === 0)
            .select((col("doc_id") + 200000).as("doc_id"), col("text"),
              col("lang"), col("n_chars")))
        val langGated = ledger.filter(col("lang").isin("en", "de", "fr"))
        val bounds = langGated.agg(
          percentile(col("n_chars"), lit(0.05)).as("lo"),
          percentile(col("n_chars"), lit(0.95)).as("hi"))
        val gated = langGated.crossJoin(broadcast(bounds))
          .filter(col("n_chars") >= col("lo") && col("n_chars") <= col("hi"))
        val deduped = gated
          .groupBy(col("text"))
          .agg(min(col("doc_id")).as("doc_id"),
            min(col("lang")).as("lang"), min(col("n_chars")).as("n_chars"))
        val split = deduped.withColumn("bucket",
          Sampling.hashBucket256(col("doc_id")))
          .withColumn("split",
            when(col("bucket") < 205, "train")
              .when(col("bucket") < 230, "val")
              .otherwise("test"))
        split.groupBy(col("lang"), col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("lang"), col("split"))
      },
      Some("""WITH ledger AS (
             |  SELECT doc_id, text, lang, n_chars FROM documents
             |  UNION ALL
             |  SELECT doc_id + 200000, text, lang, n_chars FROM documents WHERE doc_id % 7 = 0),
             |lang_gated AS (
             |  SELECT * FROM ledger WHERE lang IN ('en','de','fr')),
             |b AS (SELECT quantile_cont(n_chars, 0.05) AS lo,
             |             quantile_cont(n_chars, 0.95) AS hi FROM lang_gated),
             |gated AS (
             |  SELECT g.* FROM lang_gated g, b WHERE n_chars >= b.lo AND n_chars <= b.hi),
             |deduped AS (
             |  SELECT MIN(doc_id) AS doc_id, MIN(lang) AS lang, MIN(n_chars) AS n_chars
             |  FROM gated GROUP BY text),
             |split AS (
             |  SELECT lang, n_chars,
             |    CAST((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
             |       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS INT) AS bucket
             |  FROM deduped)
             |SELECT lang,
             |  CASE WHEN bucket < 205 THEN 'train' WHEN bucket < 230 THEN 'val' ELSE 'test' END AS split,
             |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
             |FROM split
             |GROUP BY 1, 2 ORDER BY lang, split""".stripMargin),
    ),

    QueryDef(
      "q_string_agg",
      // Ordered string aggregation (LISTAGG / string_agg): per-nation
      // ';'-joined sorted supplier roster. collect_list is order-
      // nondeterministic under parallel merge, so the sort happens inside
      // the row (array_sort) — partition-count-independent output.
      (s, dir) => {
        t(s, dir, "supplier")
          .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            count(lit(1)).as("n_suppliers"),
            concat_ws(";", array_sort(collect_list(col("s_name")))).as("roster"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name, COUNT(*) AS n_suppliers,
             |       string_agg(s_name, ';' ORDER BY s_name) AS roster
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
    ),
  )
}
