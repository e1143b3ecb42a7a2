package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}
import graft.sources.Tables

/** Deduplication queries over `documents` (builder brief: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine — embedding variant lives in
  * SimilarityQueries).
  *
  * The synthetic corpus has no duplicates, so each query plants them
  * deterministically first: exact copies (id+100000) and near-copies
  * ('the' → 'thee' word substitution, id+200000). The planting is the same
  * SQL in the DuckDB oracle, so hash-checkable variants stay hash-checkable.
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String) = Tables.table(s, dir, "documents")

  /** documents ∪ exact copies (of doc_id<100) ∪ near copies (of doc_id<60). */
  private def plantedCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val exact = d.filter(col("doc_id") < 100)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val near = d.filter(col("doc_id") < 60)
      .select((col("doc_id") + 200000).as("doc_id"),
        regexp_replace(col("text"), "\\bthe\\b", "thee").as("text"))
    d.unionAll(exact).unionAll(near)
  }

  private val dkCorpus =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 100
      |UNION ALL SELECT doc_id + 200000, regexp_replace(text, '\b(the)\b', 'thee', 'g')
      |  FROM documents WHERE doc_id < 60""".stripMargin

  /** df cap for the q_dedup_minhash truth join: safely above the measured
    * max shingle document-frequency on the planted corpora (27 at sf0.1,
    * 14 at sf0.001 — DuckDB probe; OperatorsSpec asserts the cap is unhit),
    * so results are bit-identical to an uncapped join today while staying
    * linear at any scale. */
  val truthShingleDfCap = 4096

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_dedup_exact",
      // Exact dedup by normalized-text fingerprint: one hash-aggregate.
      (s, dir) => {
        Dedup.exact(plantedCorpus(s, dir), TextOps.fingerprint(col("text")), col("doc_id"))
          .select(col("keep_id"), col("n_copies"))
          .orderBy(col("keep_id"))
      },
      Some(s"""WITH corpus AS ($dkCorpus)
              |SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies
              |FROM corpus
              |GROUP BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
              |ORDER BY keep_id""".stripMargin),
    ),

    QueryDef(
      "q_dedup_minhash",
      // MinHash(32) + LSH(8 bands × 4 rows), exact+bound shape: the emitted
      // rows are the exact true-Jaccard ≥ 0.9 pairs (shingle inverted-index
      // join — fully DuckDB-reproducible), and the boolean asserts the LSH
      // candidate set recovered each one. The truth join is df-capped at
      // 4096 — far above the measured max shingle df (27 at sf0.1, probed
      // via DuckDB and pinned by OperatorsSpec), so output is bit-identical
      // to uncapped today, yet one boilerplate shingle can never turn the
      // join quadratic at scale; the oracle applies the identical cap. At
      // J ≥ 0.9 a pair misses all 8 bands with probability (1−J⁴)⁸ ≤ 0.02%
      // — measured recall is 100% at every sf (OverlapProbe; deterministic
      // signatures, fixed corpus). The full sketch path (native signatures
      // → banded buckets → capped candidate join) still executes — the
      // boolean derives from its output. OperatorsSpec keeps the J=1 band
      // guarantee and mutated-pair recall on the raw candidate operator.
      (s, dir) => {
        val corpus = plantedCorpus(s, dir)
        // one shingle pass feeds BOTH the sketch and the truth side (lazily
        // checkpointed — scan + tokenize + shingle run once, not twice)
        val toks = Dedup.shingleFrame(corpus, col("doc_id"), col("text"))
          .localCheckpoint(false)
        val cands = Dedup.minhashCandidatesFromShingles(toks)
        val truth = Dedup.ngramJaccardPairsFromShingles(toks,
          threshold = 0.9, maxShingleDf = DedupQueries.truthShingleDfCap,
          checkpointInput = false) // toks is already a checkpoint — don't store it twice
        truth
          .join(cands.select(col("id1"), col("id2"), lit(true).as("hit")),
            Seq("id1", "id2"), "left")
          .select(col("id1"), col("id2"), col("jaccard"),
            coalesce(col("hit"), lit(false)).as("lsh_found"))
          .orderBy(col("id1"), col("id2"))
      },
      Some(s"""WITH corpus AS ($dkCorpus),
              |toks AS (
              |  SELECT doc_id,
              |    list_distinct(list_transform(
              |      range(1, greatest(len(string_split_regex(trim(lower(text)), '\\s+')) - 2, 1) + 1),
              |      i -> array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[i:i+2], ' '))) AS shs
              |  FROM corpus),
              |sh0 AS (SELECT doc_id, unnest(shs) AS sh FROM toks),
              |sh AS (SELECT sh0.doc_id, sh0.sh FROM sh0
              |       JOIN (SELECT sh FROM sh0 GROUP BY sh
              |             HAVING COUNT(*) <= ${DedupQueries.truthShingleDfCap}) rare USING (sh)),
              |common AS (
              |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_common
              |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)
              |SELECT id1, id2,
              |  round(CAST(n_common AS DOUBLE) / (s1.n_sh + s2.n_sh - n_common), 6) AS jaccard,
              |  TRUE AS lsh_found
              |FROM common
              |JOIN sizes s1 ON id1 = s1.doc_id
              |JOIN sizes s2 ON id2 = s2.doc_id
              |WHERE round(CAST(n_common AS DOUBLE) / (s1.n_sh + s2.n_sh - n_common), 6) >= 0.9
              |ORDER BY id1, id2""".stripMargin),
    ),

    QueryDef(
      "q_dedup_simhash",
      // SimHash(64-bit, 4×16 chunks) pigeonhole candidates at Hamming ≤ 6,
      // exact+bound shape: rows are the exact identical-fingerprint pairs
      // (md5 of normalized text — DuckDB-reproducible, same normalization
      // as q_dedup_exact), boolean asserts the simhash path found each one.
      // Identical text ⇒ identical signature ⇒ all 4 chunks collide, so
      // recovery is structural (subject only to the hot-bucket cap; planted
      // and natural duplicate groups are far below it — measured missing 0
      // at every sf). The pigeonhole sketch path still executes in full.
      (s, dir) => {
        // the corpus feeds both the simhash path and the fingerprint truth
        // side — lazily checkpointed so the 3-scan planted union runs once
        val corpus = plantedCorpus(s, dir).localCheckpoint(false)
        val shPairs = Dedup.simhashPairs(corpus, col("doc_id"), col("text"), maxDist = 6)
        val fp = corpus.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        fp.as("a").join(fp.as("b"),
            col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
          .join(shPairs.select(col("id1"), col("id2"), lit(true).as("hit")),
            Seq("id1", "id2"), "left")
          .select(col("id1"), col("id2"),
            coalesce(col("hit"), lit(false)).as("simhash_found"))
          .orderBy(col("id1"), col("id2"))
      },
      Some(s"""WITH corpus AS ($dkCorpus),
              |fp AS (
              |  SELECT doc_id,
              |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
              |  FROM corpus)
              |SELECT a.doc_id AS id1, b.doc_id AS id2, TRUE AS simhash_found
              |FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
              |ORDER BY id1, id2""".stripMargin),
    ),

    QueryDef(
      "q_dedup_ngram",
      // Exact 3-gram Jaccard similarity join (inverted-index explode+join)
      // with the df-128 hot-shingle cap, threshold 0.3 — catches the planted
      // near-copies exactly. The oracle applies the identical cap.
      (s, dir) => {
        Dedup.ngramJaccardPairs(plantedCorpus(s, dir), col("doc_id"), col("text"), threshold = 0.3)
          .orderBy(col("id1"), col("id2"))
      },
      Some(s"""WITH corpus AS ($dkCorpus),
              |toks AS (
              |  SELECT doc_id,
              |    list_distinct(list_transform(
              |      range(1, greatest(len(string_split_regex(trim(lower(text)), '\\s+')) - 2, 1) + 1),
              |      i -> array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[i:i+2], ' '))) AS shs
              |  FROM corpus),
              |sh0 AS (SELECT doc_id, unnest(shs) AS sh FROM toks),
              |sh AS (SELECT sh0.doc_id, sh0.sh FROM sh0
              |       JOIN (SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) <= 128) rare USING (sh)),
              |common AS (
              |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_common
              |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)
              |SELECT id1, id2, n_common,
              |  round(CAST(n_common AS DOUBLE) / (s1.n_sh + s2.n_sh - n_common), 6) AS jaccard
              |FROM common
              |JOIN sizes s1 ON id1 = s1.doc_id
              |JOIN sizes s2 ON id2 = s2.doc_id
              |WHERE round(CAST(n_common AS DOUBLE) / (s1.n_sh + s2.n_sh - n_common), 6) >= 0.3
              |ORDER BY id1, id2""".stripMargin),
    ),

    QueryDef(
      "q_decontaminate",
      // Eval-set decontamination: docs 0-19 play the benchmark; training
      // corpus = the rest ∪ planted full contamination (eval verbatim,
      // +500000) ∪ planted partial contamination ('the'→'thee' mutations
      // of eval docs 0-9, +600000). 8-gram overlap against the eval
      // vocabulary (long shingles ⇒ natural collisions ≈ 0) — exact,
      // deterministic, fully DuckDB-reproducible; `contaminated` flags
      // overlap ≥ 0.3. The eval vocabulary broadcasts; the corpus never
      // shuffles before the per-doc count.
      (s, dir) => {
        val d = docs(s, dir).select(col("doc_id"), col("text"))
        val evalSet = d.filter(col("doc_id") < 20)
        val train = d.filter(col("doc_id") >= 20)
          .unionAll(evalSet.select((col("doc_id") + 500000).as("doc_id"), col("text")))
          .unionAll(d.filter(col("doc_id") < 10)
            .select((col("doc_id") + 600000).as("doc_id"),
              regexp_replace(col("text"), "\\bthe\\b", "thee").as("text")))
        Dedup.contaminationScores(train, evalSet, col("doc_id"), col("text"))
          .select(col("id").as("doc_id"), col("n_overlap"), col("n_sh"),
            col("overlap"), (col("overlap") >= 0.3).as("contaminated"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH train AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id >= 20
             |  UNION ALL SELECT doc_id + 500000, text FROM documents WHERE doc_id < 20
             |  UNION ALL SELECT doc_id + 600000, regexp_replace(text, '\b(the)\b', 'thee', 'g')
             |    FROM documents WHERE doc_id < 10),
             |eval_v AS (
             |  SELECT DISTINCT sh FROM (
             |    SELECT unnest(list_distinct(list_transform(
             |      range(1, greatest(len(string_split_regex(trim(lower(text)), '\s+')) - 7, 1) + 1),
             |      i -> array_to_string((string_split_regex(trim(lower(text)), '\s+'))[i:i+7], ' ')))) AS sh
             |    FROM documents WHERE doc_id < 20)),
             |toks AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split_regex(trim(lower(text)), '\s+')) - 7, 1) + 1),
             |    i -> array_to_string((string_split_regex(trim(lower(text)), '\s+'))[i:i+7], ' '))) AS shs
             |  FROM train),
             |posts AS (SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS sh FROM toks),
             |hits AS (
             |  SELECT doc_id, n_sh, COUNT(*) AS n_overlap
             |  FROM posts JOIN eval_v USING (sh)
             |  GROUP BY doc_id, n_sh)
             |SELECT doc_id, n_overlap, n_sh,
             |  round(CAST(n_overlap AS DOUBLE) / n_sh, 6) AS overlap,
             |  (round(CAST(n_overlap AS DOUBLE) / n_sh, 6) >= 0.3) AS contaminated
             |FROM hits ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_decontaminate_fuzzy",
      // Fuzzy eval-set decontamination, exact+bound shape: the 'thee'
      // paraphrases (+600000) land at 3-gram J ≈ 0.70-0.79 — the 8-gram
      // exact scan's blind spot — and verbatim replicas (+500000) at ~1.0.
      // Rows are the EXACT 3-gram Jaccard (train, eval) pairs at J ≥ 0.5
      // (DuckDB-reproducible posting intersect; the eval side bounds join
      // multiplicity at |eval| = 20, so no df cap is needed); the boolean
      // asserts the MinHash-LSH sketch (bands=16, r=2) recovered each one.
      // P(miss) = (1−J²)¹⁶ ≤ 2·10⁻⁵ at the J ≥ 0.7 the corpus actually
      // produces (DuckDB probe: nothing natural lives in [0.25, 0.7), so
      // 0.5 has margin on both sides); deterministic signatures + fixed
      // corpus make the boolean a fixed fact, verified at every sf. The
      // full sketch path executes — the boolean derives from its output.
      (s, dir) => {
        val d = docs(s, dir).select(col("doc_id"), col("text"))
        val evalSet = d.filter(col("doc_id") < 20)
        val train = d.filter(col("doc_id") >= 20)
          .unionAll(evalSet.select((col("doc_id") + 500000).as("doc_id"), col("text")))
          .unionAll(d.filter(col("doc_id") < 10)
            .select((col("doc_id") + 600000).as("doc_id"),
              regexp_replace(col("text"), "\\bthe\\b", "thee").as("text")))
        // one corpus shingle pass feeds BOTH the sketch and the truth side
        val toks = Dedup.shingleFrame(train, col("doc_id"), col("text"))
          .localCheckpoint(false)
        // eval side is 20 docs: spreading it 32-wide is pure task-setup
        // overhead (driver r19: 0.74×), and the bytes gate can't see the
        // filter's selectivity — skip the rebalance explicitly
        val evalToks = Dedup.shingleFrame(evalSet, col("doc_id"), col("text"), rebalance = false)
        val fuzzy = Dedup.fuzzyContaminationPairsFromShingles(toks, evalToks)
        val evalPosts = evalToks.select(col("id").as("eval_id"),
          size(col("shs")).cast("long").as("n2"), explode(col("shs")).as("sh"))
        val posts = toks.select(col("id").as("doc_id"),
          size(col("shs")).cast("long").as("n1"), explode(col("shs")).as("sh"))
        val truth = posts.join(broadcast(evalPosts), Seq("sh"))
          .groupBy(col("doc_id"), col("eval_id"), col("n1"), col("n2"))
          .agg(count(lit(1)).as("n_common"))
          .withColumn("jaccard", round(
            col("n_common").cast("double") / (col("n1") + col("n2") - col("n_common")), 6))
          .filter(col("jaccard") >= 0.5)
        truth
          .join(fuzzy.select(col("id").as("doc_id"), col("eval_id"), lit(true).as("hit")),
            Seq("doc_id", "eval_id"), "left")
          .select(col("doc_id"), col("eval_id"), col("jaccard"),
            coalesce(col("hit"), lit(false)).as("fuzzy_found"))
          .orderBy(col("doc_id"), col("eval_id"))
      },
      Some("""WITH train AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id >= 20
             |  UNION ALL SELECT doc_id + 500000, text FROM documents WHERE doc_id < 20
             |  UNION ALL SELECT doc_id + 600000, regexp_replace(text, '\b(the)\b', 'thee', 'g')
             |    FROM documents WHERE doc_id < 10),
             |eval_toks AS (
             |  SELECT doc_id AS eval_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split_regex(trim(lower(text)), '\s+')) - 2, 1) + 1),
             |    i -> array_to_string((string_split_regex(trim(lower(text)), '\s+'))[i:i+2], ' '))) AS shs
             |  FROM documents WHERE doc_id < 20),
             |eval_posts AS (SELECT eval_id, len(shs) AS n2, unnest(shs) AS sh FROM eval_toks),
             |toks AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split_regex(trim(lower(text)), '\s+')) - 2, 1) + 1),
             |    i -> array_to_string((string_split_regex(trim(lower(text)), '\s+'))[i:i+2], ' '))) AS shs
             |  FROM train),
             |posts AS (SELECT doc_id, len(shs) AS n1, unnest(shs) AS sh FROM toks),
             |common AS (
             |  SELECT p.doc_id, e.eval_id, p.n1, e.n2, COUNT(*) AS n_common
             |  FROM posts p JOIN eval_posts e USING (sh)
             |  GROUP BY 1, 2, 3, 4)
             |SELECT doc_id, eval_id,
             |  round(CAST(n_common AS DOUBLE) / (n1 + n2 - n_common), 6) AS jaccard,
             |  TRUE AS fuzzy_found
             |FROM common
             |WHERE round(CAST(n_common AS DOUBLE) / (n1 + n2 - n_common), 6) >= 0.5
             |ORDER BY doc_id, eval_id""".stripMargin),
    ),

    QueryDef(
      "q_source_overlap",
      // Cross-source 8-gram overlap matrix: which sources republish each
      // other's text (mirrors, cross-posted boilerplate). The corpus
      // collapses to DISTINCT (source, gram) first; the gram self-join
      // then fans out at most (#sources choose 2) pairs per gram — the
      // per-key bound is structural, so no df cap is needed.
      (s, dir) => {
        graft.operators.Dedup.crossSourceOverlap(
          docs(s, dir), col("source"), col("text"))
          .filter(col("n_shared") >= 5)
          .orderBy(col("src1"), col("src2"))
      },
      Some("""WITH grams AS (
             |  SELECT DISTINCT src, g FROM (
             |    SELECT source AS src, unnest(list_distinct(list_transform(
             |      range(1, greatest(len(string_split_regex(trim(lower(text)), '\s+')) - 7, 1) + 1),
             |      i -> array_to_string((string_split_regex(trim(lower(text)), '\s+'))[i:i+7], ' ')))) AS g
             |    FROM documents)),
             |tot AS (SELECT src, COUNT(*) AS n FROM grams GROUP BY src),
             |pairs AS (
             |  SELECT a.src AS src1, b.src AS src2, COUNT(*) AS n_shared
             |  FROM grams a JOIN grams b ON a.g = b.g AND a.src < b.src
             |  GROUP BY a.src, b.src)
             |SELECT src1, src2, n_shared, t1.n AS n1, t2.n AS n2,
             |  round(CAST(n_shared AS DOUBLE) / least(t1.n, t2.n), 6) AS containment
             |FROM pairs JOIN tot t1 ON src1 = t1.src JOIN tot t2 ON src2 = t2.src
             |WHERE n_shared >= 5
             |ORDER BY src1, src2""".stripMargin),
    ),

    QueryDef(
      "q_dedup_clean",
      // End-to-end corpus cleaning: exact-fingerprint pairs ∪ df-capped
      // ngram-Jaccard pairs → connected components → keep the min-id
      // representative per cluster. The planted graph is multi-hop (id ↔
      // id+100000 via identical fingerprint, id ↔ id+200000 only via
      // Jaccard), so transitive closure is genuinely exercised; the DuckDB
      // oracle computes the same closure with a recursive CTE.
      (s, dir) => {
        // corpus is read by the fingerprint side, the ngram side, AND the
        // final representative semi-join — checkpoint the planted union once
        val corpus = plantedCorpus(s, dir).localCheckpoint(false)
        val fp = corpus.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        val fpPairs = fp.as("a").join(fp.as("b"),
            col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        val nearPairs = Dedup
          .ngramJaccardPairs(corpus, col("doc_id"), col("text"), threshold = 0.3)
          .select(col("id1"), col("id2"))
        Dedup.removeDuplicates(corpus, col("doc_id"), fpPairs.unionAll(nearPairs).distinct())
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE corpus AS ($dkCorpus),
              |toks AS (
              |  SELECT doc_id,
              |    list_distinct(list_transform(
              |      range(1, greatest(len(string_split_regex(trim(lower(text)), '\\s+')) - 2, 1) + 1),
              |      i -> array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[i:i+2], ' '))) AS shs
              |  FROM corpus),
              |sh0 AS (SELECT doc_id, unnest(shs) AS sh FROM toks),
              |sh AS (SELECT sh0.doc_id, sh0.sh FROM sh0
              |       JOIN (SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) <= 128) rare USING (sh)),
              |common AS (
              |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_common
              |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
              |near AS (
              |  SELECT id1, id2 FROM common
              |  JOIN sizes s1 ON id1 = s1.doc_id
              |  JOIN sizes s2 ON id2 = s2.doc_id
              |  WHERE round(CAST(n_common AS DOUBLE) / (s1.n_sh + s2.n_sh - n_common), 6) >= 0.3),
              |fps AS (SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
              |        FROM corpus),
              |fpp AS (SELECT a.doc_id AS id1, b.doc_id AS id2
              |        FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id),
              |pairs AS (SELECT id1, id2 FROM fpp UNION SELECT id1, id2 FROM near),
              |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
              |          UNION SELECT id2, id1 FROM pairs),
              |reach AS (
              |  SELECT a, b FROM edges
              |  UNION
              |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a),
              |rep AS (
              |  SELECT c.doc_id, least(c.doc_id, coalesce(min(r.b), c.doc_id)) AS rep
              |  FROM corpus c LEFT JOIN reach r ON r.a = c.doc_id GROUP BY c.doc_id)
              |SELECT doc_id FROM rep WHERE doc_id = rep ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_dup_substrings",
      // Duplicate-substring spans (Lee et al. 2022 substring dedup, token-
      // window form): per doc, merged token coverage of 15-token windows
      // occurring in >= 2 docs. The natural corpus has real cross-doc
      // boilerplate at every sf (437 docs at sf0.1) — no planting needed.
      // Linear plan: map-side window explode, two hash-aggregates for the
      // df>=2 window set, one semi-join back, per-doc interval-merge fold.
      (s, dir) => {
        Dedup.duplicateSpans(docs(s, dir), col("doc_id"), col("text"), windowSize = 15)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
             |  FROM documents),
             |tt AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM t WHERE len(toks) >= 15),
             |w AS (
             |  SELECT doc_id, n_tokens, i AS start, array_to_string(toks[i:i+14], ' ') AS win
             |  FROM tt, UNNEST(range(1, n_tokens - 14 + 1)) AS u(i)),
             |d AS (SELECT win FROM (SELECT DISTINCT win, doc_id FROM w)
             |      GROUP BY win HAVING COUNT(*) >= 2),
             |g AS (
             |  SELECT doc_id, n_tokens, list_sort(list(start)) AS starts
             |  FROM w WHERE win IN (SELECT win FROM d)
             |  GROUP BY doc_id, n_tokens)
             |SELECT doc_id,
             |  CAST(len(starts) AS INT) AS n_dup_windows,
             |  CAST(list_sum(list_transform(range(1, len(starts) + 1),
             |    i -> least(coalesce(starts[CAST(i AS INT) + 1], starts[CAST(i AS INT)] + 15)
             |               - starts[CAST(i AS INT)], 15))) AS INT) AS dup_tokens,
             |  CAST(n_tokens AS INT) AS n_tokens,
             |  floor(CAST(list_sum(list_transform(range(1, len(starts) + 1),
             |    i -> least(coalesce(starts[CAST(i AS INT) + 1], starts[CAST(i AS INT)] + 15)
             |               - starts[CAST(i AS INT)], 15))) AS DOUBLE) * 1e6 / n_tokens) / 1e6
             |    AS dup_fraction
             |FROM g ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_substring_clean",
      // The removal half of substring dedup: documents rewritten with
      // cross-doc duplicated 15-token spans deleted, unique remainder
      // kept (whole-doc dedup would discard it). Token-space rewrite via
      // pure array expressions; every doc passes through.
      (s, dir) => {
        Dedup.removeDuplicateSpans(docs(s, dir), col("doc_id"), col("text"), windowSize = 15)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
             |  FROM documents),
             |tt AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM t),
             |w AS (
             |  SELECT doc_id, i AS start, array_to_string(toks[i:i+14], ' ') AS win
             |  FROM tt, UNNEST(range(1, greatest(n_tokens - 14, 0) + 1)) AS u(i)
             |  WHERE n_tokens >= 15),
             |d AS (SELECT win FROM (SELECT DISTINCT win, doc_id FROM w)
             |      GROUP BY win HAVING COUNT(*) >= 2),
             |g AS (SELECT doc_id, list_sort(list(start)) AS starts
             |      FROM w WHERE win IN (SELECT win FROM d) GROUP BY doc_id),
             |j AS (
             |  SELECT tt.doc_id, tt.n_tokens, tt.toks, g.starts,
             |    CASE WHEN g.starts IS NULL THEN tt.toks
             |         ELSE list_filter(tt.toks, (x, i) -> NOT list_contains(
             |           list_distinct(flatten(list_transform(g.starts, s -> range(s, s + 15)))), i))
             |    END AS clean_toks
             |  FROM tt LEFT JOIN g ON tt.doc_id = g.doc_id)
             |SELECT doc_id,
             |  array_to_string(toks, ' ') AS text,
             |  CAST(n_tokens AS INT) AS n_tokens,
             |  CAST(coalesce(len(starts), 0) AS INT) AS n_dup_windows,
             |  CAST(n_tokens - len(clean_toks) AS INT) AS dup_tokens,
             |  coalesce(array_to_string(clean_toks, ' '), '') AS clean_text,
             |  CAST(len(clean_toks) AS INT) AS n_clean_tokens
             |FROM j ORDER BY doc_id""".stripMargin),
    ),
  )
}
