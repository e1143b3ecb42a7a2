package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{BloomJoin, Changelog, Layout, Sampling, SearchIndex, Sketches, TextOps}
import graft.sources.Tables

/** Pipeline-infrastructure operators under the oracle gate: changelog
  * compaction, bloom-join reduction, deterministic sampling, Z-order layout.
  *
  * Two of these (bloom join, sampling thresholds) are *result-neutral
  * optimizations*: the oracle is the plain, unoptimized SQL, so the hash
  * check proves the optimization changes the plan but not one output value —
  * the same property q_salted_* pins for salting.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_changelog_snapshot",
      // ODF ledger → current state: latest record per key via one
      // max_by hash-aggregate (map-side combine keeps one candidate per key
      // per task — no window sort over full per-key history), then dead keys
      // (latest op = retract/correct-from) dropped. The op column is
      // synthesized deterministically from the unique event_id so DuckDB
      // sees the identical ledger.
      (s, dir) => {
        val ledger = t(s, dir, "events").select(
          col("user_id"),
          col("event_id"),
          col("value"),
          Changelog.syntheticOp(col("event_id")).as("op"))
        Changelog.snapshot(ledger, Seq("user_id"), versionCol = "event_id", opCol = "op")
          .select(
            col("user_id"),
            col("event_id").as("last_event_id"),
            col("op"),
            col("value"))
          .orderBy(col("user_id"))
      },
      Some("""WITH led AS (
             |  SELECT user_id, event_id, value,
             |    CASE WHEN event_id % 10 = 0 THEN 1
             |         WHEN event_id % 7 = 0 THEN 3
             |         ELSE 0 END AS op
             |  FROM events),
             |last AS (
             |  SELECT user_id,
             |    arg_max(event_id, event_id) AS last_event_id,
             |    arg_max(op, event_id) AS op,
             |    arg_max(value, event_id) AS value
             |  FROM led GROUP BY user_id)
             |SELECT user_id, last_event_id, op, value FROM last
             |WHERE op IN (0, 3) ORDER BY user_id""".stripMargin),
    ),

    QueryDef(
      "q_bloom_join",
      // Bloom semi-join reduction: sketch the filtered orders keys, drop
      // non-joining lineitem rows at the scan (codegen'd probe, before the
      // shuffle), then the real join removes bloom false positives. The
      // oracle is the PLAIN join — proving the reduction is result-neutral.
      (s, dir) => {
        val urgent = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_orderstatus"))
        BloomJoin.bloomReducedJoin(
          t(s, dir, "lineitem"), urgent, bigKey = "l_orderkey", smallKey = "o_orderkey")
          .groupBy(col("o_orderstatus"))
          .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             |  COUNT(*) AS n
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
    ),

    QueryDef(
      "q_sample_stratified",
      // Corpus rebalancing: keep 64/256 of dominant English, 192/256 of
      // everything else, membership decided by md5(doc_id) — deterministic
      // across engines/partitionings (df.sample is neither). Pure codegen'd
      // filter: no shuffle, rides the scan.
      (s, dir) => {
        Sampling.stratifiedSample(
          t(s, dir, "documents").select(col("doc_id"), col("lang")),
          key = col("doc_id"), stratum = col("lang"),
          thresholds = Map("en" -> 64), defaultThreshold = 192)
          .withColumn("bucket", Sampling.hashBucket256(col("doc_id")))
          .orderBy(col("doc_id"))
      },
      Some("""WITH b AS (
             |  SELECT doc_id, lang,
             |    CAST((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
             |       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS INT) AS bucket
             |  FROM documents)
             |SELECT doc_id, lang, bucket FROM b
             |WHERE bucket < CASE WHEN lang = 'en' THEN 64 ELSE 192 END
             |ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_sample_topn",
      // Exactly-100 deterministic uniform sample: the 100 smallest
      // md5(doc_id) values. Plans as TakeOrderedAndProject (per-partition
      // top-k heaps + driver merge of 100 rows), never a global sort —
      // the fixed-size sample shape that works at any corpus size.
      (s, dir) => {
        Sampling.fixedSizeSample(
          t(s, dir, "documents").select(col("doc_id"), col("lang"), col("source")),
          key = col("doc_id"), n = 100)
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, source FROM (
             |  SELECT doc_id, lang, source FROM documents
             |  ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 100)
             |ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_sample_weighted",
      // Exactly-100 weighted sample (Efraimidis–Spirakis A-Res): longer
      // documents win proportionally more often, membership is a pure
      // function of (doc_id, n_chars) — partitioning/engine/run
      // independent — and the plan is TakeOrderedAndProject (per-partition
      // heaps), never a global sort. The ln-of-24-bit-hash key is rebuilt
      // with identical arithmetic in DuckDB.
      (s, dir) => {
        Sampling.weightedSample(
          t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          key = col("doc_id"), weight = col("n_chars"), k = 100)
          .orderBy(col("doc_id"))
      },
      Some("""WITH k AS (
             |  SELECT doc_id, n_chars,
             |    ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT + 1)
             |       / 16777216.0) / n_chars AS wk
             |  FROM documents)
             |SELECT doc_id, n_chars FROM (
             |  SELECT doc_id, n_chars FROM k ORDER BY wk DESC, doc_id LIMIT 100)
             |ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_mixture_sample",
      // Domain-mixture construction (Pile/DoReMi recipe): acceptance rates
      // are DERIVED FROM THE DATA — one per-source mass aggregate (bounded
      // collect, one row per source), rate = min(1, target-share · budget
      // / mass), then a pure codegen'd 16-bit-hash filter riding the scan.
      // src0's 0.5 share caps at rate 1 on this corpus (under-massed —
      // shortfall is measured, not silent); unlisted sources drop. The
      // oracle replays the same double arithmetic ((w / wsum) * budget) /
      // mass against its own aggregate, so the derived thresholds AND the
      // membership are both checked.
      (s, dir) => {
        val res = Sampling.mixtureSample(
          t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
          key = col("doc_id"), stratum = col("source"), mass = col("n_chars"),
          targetWeights = Map(
            "src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.125, "src3" -> 0.125),
          budget = 20000L)
        res.sampled.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_kept"))
          .orderBy(col("source"))
      },
      Some("""WITH tot AS (
             |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS t
             |  FROM documents GROUP BY source),
             |thr AS (
             |  SELECT source,
             |    CAST(floor(least(1.0, ((w / 1.0) * 20000) / t) * 65536.0) AS INT) AS thr
             |  FROM (SELECT source, t,
             |          CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
             |               WHEN 'src2' THEN 0.125 WHEN 'src3' THEN 0.125
             |               ELSE 0.0 END AS w
             |        FROM tot)
             |  WHERE w > 0),
             |b AS (
             |  SELECT doc_id, source, n_chars,
             |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT AS INT) AS bucket
             |  FROM documents)
             |SELECT b.source, COUNT(*) AS n_docs, CAST(SUM(b.n_chars) AS BIGINT) AS chars_kept
             |FROM b JOIN thr ON b.source = thr.source
             |WHERE b.bucket < thr.thr
             |GROUP BY b.source ORDER BY b.source""".stripMargin),
    ),

    QueryDef(
      "q_seq_packing",
      // Sequence packing (concat-and-chunk into 2048-token context
      // windows), sharded by source: every document gets its token start
      // offset within its shard's concatenation and the bin (training
      // window) holding its first token. One window shuffle on the shard
      // key; shards pack in parallel — never a global single-partition
      // prefix sum.
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            graft.operators.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        graft.operators.Packing.packIntoBins(
          docs, shardCols = Seq("source"), orderCol = col("doc_id"),
          sizeCol = col("n_tokens"), capacity = 2048)
          .select(col("doc_id"), col("source"), col("n_tokens"),
            col("tok_start"), col("bin"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, source,
             |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
             |  CAST(SUM(CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT))
             |         OVER (PARTITION BY source ORDER BY doc_id)
             |       - len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS tok_start,
             |  CAST(FLOOR((SUM(CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT))
             |                OVER (PARTITION BY source ORDER BY doc_id)
             |              - len(string_split_regex(trim(lower(text)), '\s+'))) / 2048) AS BIGINT) AS bin
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_inverted_index",
      // Retrieval-index build: token → (document frequency, first-20
      // postings). One shuffle on the token key; posting lists are capped
      // by window row_number BEFORE collect_list, so hot tokens cost `cap`
      // entries, not one per matching document. Postings travel as a
      // comma-joined string (array columns break the driver's row sort).
      (s, dir) => {
        SearchIndex.invertedIndex(
          t(s, dir, "documents"), col("doc_id"), col("text"), cap = 20)
          .filter(col("df") >= 20)
          .orderBy(col("token"))
      },
      Some("""WITH tok AS (
             |  SELECT DISTINCT doc_id,
             |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
             |  FROM documents),
             |ranked AS (
             |  SELECT token, doc_id,
             |    count(*) OVER (PARTITION BY token) AS df,
             |    row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
             |  FROM tok)
             |SELECT token, df,
             |  array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id), ',') AS postings
             |FROM ranked WHERE rn <= 20 AND df >= 20
             |GROUP BY token, df ORDER BY token""".stripMargin),
    ),

    QueryDef(
      "q_bm25_topk",
      // BM25 top-50 retrieval (Lucene idf variant) for a 3-term query —
      // the query-side counterpart of q_inverted_index. No per-token
      // shuffle: per-term tf + doc length ride the scan in one narrow
      // projection, one map-side-reduced aggregate yields (N, Σdl, df)
      // as a single collected row, and scoring is pure codegen'd double
      // arithmetic ending in TakeOrderedAndProject. dl/tf are
      // integer-valued doubles (exact Σ in any partition order) and the
      // oracle replays every double op in the same order, so the
      // floor-scaled score hashes exactly (ln via StrictMath — the
      // q_text_perplexity idiom).
      (s, dir) => {
        SearchIndex.bm25TopK(
          t(s, dir, "documents"), col("doc_id"), col("text"),
          queryTerms = Seq("vector", "join", "slow"), k = 50)
      },
      Some("""WITH base AS (
             |  SELECT doc_id,
             |    CAST(len(toks) AS DOUBLE) AS dl,
             |    CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE) AS tf0,
             |    CAST(len(list_filter(toks, x -> x = 'slow')) AS DOUBLE) AS tf1,
             |    CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE) AS tf2
             |  FROM (SELECT doc_id,
             |          string_split_regex(trim(lower(text)), '\s+') AS toks
             |        FROM documents)
             |  -- mirror of the engine's dl-IS-NOT-NULL frame filter: a
             |  -- NULL text is not indexable and must not count in N
             |  -- (count(*) would include it while sum(dl) skips it)
             |  WHERE toks IS NOT NULL),
             |stats AS (
             |  SELECT count(*) AS n, sum(dl) AS sumdl,
             |    sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
             |    sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
             |    sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
             |  FROM base)
             |SELECT doc_id,
             |  CAST(floor((
             |      ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0)
             |        * (tf0 * (1.2 + 1.0))
             |        / (tf0 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / (sumdl / n)))
             |    + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0)
             |        * (tf1 * (1.2 + 1.0))
             |        / (tf1 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / (sumdl / n)))
             |    + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0)
             |        * (tf2 * (1.2 + 1.0))
             |        / (tf2 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / (sumdl / n)))
             |  ) * 1e4) AS BIGINT) AS bm25_score_scaled
             |FROM base, stats
             |WHERE tf0 + tf1 + tf2 > 0
             |ORDER BY bm25_score_scaled DESC, doc_id LIMIT 50""".stripMargin),
    ),

    QueryDef(
      "q_bm25_batch",
      // Batch BM25: a 100-query TABLE (every 5th of the first 500 docs'
      // first 3 tokens — the doc_id < 500 cap keeps the query COUNT fixed
      // across scale factors, so the bench measures corpus growth, not
      // query-table growth: at sf0.1 an uncapped %5 predicate yields 1,000
      // Zipf-common-term queries and the contribution frame Σ_t df(t)·q(t)
      // multiplies both ways) scored against the corpus in ONE
      // query-count-independent plan. The corpus token stream is pruned by
      // a broadcast semi-join against the query vocabulary before its only
      // shuffle (the per-(term,doc) tf aggregate, then checkpointed); df is
      // query-vocab-bounded → idf folds driver-side via StrictMath.log; the
      // per-(query,doc) double sum folds in UTF-8-ascending term order via
      // aggregate(sort_array(...)), which the oracle replays with
      // list_reduce(list(w ORDER BY term)) — same left fold, same binary
      // collation, seed 0.0 + w == w for the strictly-positive
      // contributions, so the floor-scaled score hashes exactly.
      (s, dir) => {
        val corpus = t(s, dir, "documents")
        val queries = corpus.filter(col("doc_id") % 5 === 0 && col("doc_id") < 500)
          .select(col("doc_id").as("qid"),
            concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 3)).as("qtext"))
        SearchIndex.bm25BatchTopK(
            corpus, col("doc_id"), col("text"),
            queries, col("qid"), col("qtext"), k = 5)
          .orderBy(col("query_id"), col("doc_id"))
      },
      Some("""WITH tokd AS (
             |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
             |  FROM documents),
             |base AS (
             |  SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS dl
             |  FROM tokd WHERE toks IS NOT NULL),
             |stats AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM base),
             |qterms AS (
             |  SELECT DISTINCT query_id, term FROM (
             |    SELECT doc_id AS query_id, unnest(toks[1:3]) AS term
             |    FROM tokd WHERE doc_id % 5 = 0 AND doc_id < 500)
             |  WHERE len(term) > 0),
             |cand AS (
             |  SELECT st.term, st.doc_id, st.dl, CAST(count(*) AS DOUBLE) AS tf
             |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM base) st
             |  JOIN (SELECT DISTINCT term FROM qterms) v USING (term)
             |  GROUP BY st.term, st.doc_id, st.dl),
             |idf AS (
             |  SELECT d.term, ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
             |  FROM (SELECT term, CAST(count(*) AS DOUBLE) AS df
             |        FROM cand GROUP BY term) d
             |  CROSS JOIN stats s),
             |contrib AS (
             |  SELECT q.query_id, c.doc_id, c.term,
             |    i.idf * (c.tf * (1.2 + 1.0))
             |      / (c.tf + 1.2 * ((1.0 - 0.75) + 0.75 * c.dl / (s.sumdl / s.n))) AS w
             |  FROM cand c
             |  JOIN qterms q USING (term)
             |  JOIN idf i USING (term)
             |  CROSS JOIN stats s),
             |scores AS (
             |  SELECT query_id, doc_id,
             |    CAST(floor(list_reduce(list(w ORDER BY term), (a, b) -> a + b) * 1e4)
             |      AS BIGINT) AS bm25_score_scaled
             |  FROM contrib GROUP BY query_id, doc_id),
             |ranked AS (
             |  SELECT query_id, doc_id, bm25_score_scaled,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY bm25_score_scaled DESC, doc_id) AS rn
             |  FROM scores)
             |SELECT query_id, doc_id, bm25_score_scaled
             |FROM ranked WHERE rn <= 5
             |ORDER BY query_id, doc_id""".stripMargin),
    ),

    QueryDef(
      "q_heavy_hitters",
      // Count-min + Misra-Gries heavy hitters, exact+bound shape: the
      // emitted rows are the EXACT phi=1/1000 heavy hitters (plain
      // GROUP BY + support filter — fully DuckDB-reproducible), and the
      // boolean asserts, per token, the sketch path's guarantee: the token
      // survived the MG candidate summary (support 1/1000 ≫ the 1/4097 MG
      // floor) and its CMS estimate sits in [exact, exact + eps·N]. The
      // one-pass treeAggregate sketch still executes — the boolean derives
      // from its output (measured slack at every sf: 0; the bound itself
      // is probabilistic at confidence 0.99, pinned to this corpus like
      // the other sketch-bound oracles). On a bound-miss, run
      // graft.OverlapProbe: it reports the raw CMS slack per sf, which
      // separates corpus drift (re-pin the bound) from engine regression.
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("token"))
        // k = localCap keeps every surviving MG candidate so the join below
        // tests candidate-set membership, not a rank-50 cutoff
        val hh = Sketches.heavyHitters(toks, "token", k = 4096)
        val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("exact_count"))
        val total = toks.agg(count(lit(1)).as("n_total"))
        exact.crossJoin(broadcast(total))
          .filter(col("exact_count") * 1000 > col("n_total"))
          .join(hh, Seq("token"), "left")
          .select(col("token"), col("exact_count"),
            (col("est_count").isNotNull &&
              col("est_count") >= col("exact_count") &&
              col("est_count") <= col("exact_count") + lit(1e-4) * col("n_total"))
              .as("cms_bounded"))
          .orderBy(col("exact_count").desc, col("token"))
      },
      Some("""WITH tok AS (
             |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
             |  FROM documents),
             |exact AS (SELECT token, COUNT(*) AS exact_count FROM tok GROUP BY token),
             |total AS (SELECT COUNT(*) AS n_total FROM tok)
             |SELECT token, exact_count, TRUE AS cms_bounded
             |FROM exact CROSS JOIN total
             |WHERE exact_count * 1000 > n_total
             |ORDER BY exact_count DESC, token""".stripMargin),
    ),

    QueryDef(
      "q_zorder",
      // Morton (Z-curve) codes for two-dimensional layout clustering —
      // pure built-in bitwise arithmetic (magic-number bit spread), fully
      // codegen'd, value-checked bit-for-bit against DuckDB running the
      // identical integer arithmetic. Layout.zorderRepartition uses this
      // code to range-partition; the locality effect is asserted in
      // OperatorsSpec (bounded per-partition rectangles in BOTH dims).
      (s, dir) => {
        t(s, dir, "orders")
          .select(
            col("o_orderkey"),
            Layout.zValue16(col("o_custkey"), col("o_orderkey")).as("zvalue"))
          .orderBy(col("zvalue"), col("o_orderkey"))
          .limit(1000)
      },
      Some("""WITH m0 AS (SELECT o_orderkey, (o_custkey & 65535) AS a, (o_orderkey & 65535) AS b FROM orders),
             |m1 AS (SELECT o_orderkey, ((a | (a << 8)) & 16711935) AS a, ((b | (b << 8)) & 16711935) AS b FROM m0),
             |m2 AS (SELECT o_orderkey, ((a | (a << 4)) & 252645135) AS a, ((b | (b << 4)) & 252645135) AS b FROM m1),
             |m3 AS (SELECT o_orderkey, ((a | (a << 2)) & 858993459) AS a, ((b | (b << 2)) & 858993459) AS b FROM m2),
             |m4 AS (SELECT o_orderkey, ((a | (a << 1)) & 1431655765) AS a, ((b | (b << 1)) & 1431655765) AS b FROM m3)
             |SELECT o_orderkey, (a | (b << 1)) AS zvalue FROM m4
             |ORDER BY zvalue, o_orderkey LIMIT 1000""".stripMargin),
    ),
  )
}
