package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SearchIndex

/** Volume rehearsal for the retrieval family ([[graft.operators.SearchIndex]]),
  * pattern of [[TextVolume]]/[[DedupVolume]]: 500k documents with a
  * deliberately hostile token distribution —
  *
  *   - `the`: a stopword in EVERY document (df = 500k, tf = 2) — the hot
  *     key that makes a naive per-token postings window serialize 500k
  *     rows through one sorting task;
  *   - `search`: a medium term (df = 50k);
  *   - `needle`: a rare term (df = 5) — retrieval's actual target;
  *   - 10 globally-unique filler tokens per doc (~5M distinct) — the
  *     unique-heavy vocabulary worst case, nothing for map-side combine
  *     to collapse.
  *
  * Five shapes:
  *
  *   1. **invertedIndex(cap=20)**: the two-level postings window must
  *      spread the stopword's 500k postings across input partitions
  *      (level 1 keys include `spark_partition_id()`), so the worst
  *      shuffle task stays bounded by vocabulary spread, never df(`the`).
  *      Asserted via [[StageShuffleListener]]: worst task ≪ 500k.
  *   2. **bm25TopK** for (`needle`, `search`, `the`): per-term tf rides
  *      the scan (no token explode, no per-token shuffle), one
  *      map-side-reduced stats row, scoring ends in
  *      TakeOrderedAndProject. The five `needle` docs must rank at the
  *      top (idf(needle) ≫ idf(the) — the formula working as retrieval),
  *      and the scoring stage's plan must stay exchange-free at volume,
  *      not just at sf0.001 (QueryPlansSpec's pin).
  *   3. **bm25BatchTopK** (r15) for a 102-query TABLE including `the` —
  *      a query whose candidate set is the ENTIRE 500k corpus, the
  *      hot-query worst case the two-level (query, source-partition)
  *      top-k window exists for. 100 unique-token queries must each
  *      retrieve exactly their own doc at rank 1, `needle search` must
  *      surface the five planted docs, the stopword query returns its
  *      k rows without concentrating 500k candidate rows on one task
  *      (listener bound), and the whole batch runs in ONE plan.
  *   4. **bm25BatchTopK fallback regime** (r16): 10,002 queries forced
  *      through the distributed (no query-side broadcast/collect) regime —
  *      salted joins, native Bm25Idf, worst-task bound.
  *   5. **hot QUERY-SIDE term spill** (r17): 100k queries, a third
  *      sharing one term — the SMJ scoring join's buffered (term, salt)
  *      query group must take its SPILL path (asserted via task-metrics
  *      disk-spill bytes under forced buffer thresholds), the shape the
  *      r16 SMJ swap was designed for but shape 4 never exercised.
  *   6. **DERIVED above-floor salt width** (r18): a separate 9M-doc
  *      corpus (above the 8M floor boundary) with a universal term —
  *      autoSaltBuckets(9M) = 64 AND scoringSaltWidth(9M, maxDf = 9M)
  *      = 64, so BOTH derivations execute above the 32 floor with the
  *      width chosen by the data, not an explicit argument (the spec's
  *      forced-256 run covers the explicit path; before this shape no
  *      executed auto-width path had ever left the floor).
  *
  * Success criteria are printed and asserted; wall gates are generous
  * (they catch complexity-class regressions, not environment noise).
  */
object SearchVolume {
  def time[T](label: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[search-vol] $label: $s%.1f s")
    (r, s)
  }

  /** 500k docs: "the w<id>_0 .. w<id>_9 the [search] [needle]".
    *
    * The optional terms use `otherwise(lit(null))` — concat_ws DROPS nulls,
    * where a `lit("")` would leave trailing spaces on ~90% of docs. (Those
    * spaces never became tokens — `tokens` trims before the `\s+` split, so
    * the r14 advice's df("")≈500k reading was checked and refuted
    * empirically: empty-token count is 0 either way — but null keeps the
    * text bytes matching this comment's shape exactly.) */
  def corpus(spark: SparkSession, n: Long = 500000L): DataFrame =
    spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        lit("the"),
        concat_ws(" ", transform(sequence(lit(0), lit(9)),
          i => concat(lit("w"), col("id"), lit("_"), i))),
        lit("the"),
        when(col("id") % 10 === 0, lit("search")).otherwise(lit(null)),
        when(col("id") % 100000 === 0, lit("needle")).otherwise(lit(null)))
        .as("text"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = corpus(spark).localCheckpoint()
    val (nDocs, _) = time("build 500k corpus")(docs.count())
    println(s"[search-vol] corpus rows: $nDocs")

    // -- shape 1: inverted index under a df=500k stopword ------------------
    val listener = StageShuffleListener.install(spark)
    val (idx, tIdx) = time("invertedIndex cap=20 (hot stopword df=500k)") {
      SearchIndex.invertedIndex(docs, col("doc_id"), col("text"), cap = 20)
        .filter(col("df") >= 1000)   // hot + medium rows only reach the driver
        .orderBy(col("token")).collect()
    }
    listener.drain(minTotalRows = 1000000L)
    val worst = listener.worstTaskRows
    println(f"[search-vol] worst shuffle task: $worst%,d rows " +
      f"(naive per-token window would be ${nDocs}%,d on ONE task)")
    // ~6.5M posting rows over 32 tasks ≈ 200k/task balanced; a concentrated
    // hot key puts AT LEAST df(the) = 500k on one task — 0.7·df separates
    // the regimes with margin on both sides
    assert(worst < nDocs * 7 / 10,
      f"hot token concentrated: worst task $worst%,d rows vs df(the)=$nDocs%,d")
    val theRow = idx.find(_.getString(0) == "the").get
    assert(theRow.getLong(1) == nDocs, s"df(the)=${theRow.getLong(1)}, want $nDocs")
    assert(theRow.getString(2).split(",").length == 20,
      "hot token's postings must be capped at 20")
    val searchRow = idx.find(_.getString(0) == "search").get
    assert(searchRow.getLong(1) == nDocs / 10, s"df(search)=${searchRow.getLong(1)}")
    assert(tIdx < 120.0, f"inverted index took $tIdx%.1f s — complexity regression")

    // -- shape 2: BM25 top-k, rare term must win ---------------------------
    val q = SearchIndex.bm25TopK(docs, col("doc_id"), col("text"),
      queryTerms = Seq("needle", "search", "the"), k = 10)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "BM25 at volume must keep the top-k heap plan:\n" + plan.take(2000))
    assert(!plan.contains("Exchange"),
      "BM25 scoring must stay exchange-free at volume:\n" + plan.take(2000))
    val (top, tBm) = time("bm25TopK k=10 over 500k docs (3 terms incl. df=500k)") {
      q.collect()
    }
    val needleIds = (0L until 500000L by 100000L).toSet
    val top5 = top.take(5).map(_.getLong(0)).toSet
    assert(top5 == needleIds,
      s"the 5 needle docs must outrank 500k stopword matches: got ${top5.toSeq.sorted}")
    assert(top.length == 10 && tBm < 60.0,
      f"bm25TopK: ${top.length} rows in $tBm%.1f s")
    println("[search-vol] needle docs rank 1-5 over 500k stopword matches; " +
      "scoring plan exchange-free at volume")

    // -- shape 3: batch BM25, 102 queries incl. a df=500k stopword query ---
    val batchListener = StageShuffleListener.install(spark)
    val queries = spark.range(100).select(
        col("id").as("qid"),
        // two of doc (id*5000)'s globally-unique filler tokens
        concat(lit("w"), col("id") * 5000L, lit("_3 w"), col("id") * 5000L, lit("_7"))
          .as("qtext"))
      .unionAll(spark.range(1).select(lit(100000L).as("qid"), lit("needle search").as("qtext")))
      .unionAll(spark.range(1).select(lit(100001L).as("qid"), lit("the").as("qtext")))
    val (batch, tBatch) = time("bm25BatchTopK: 102 queries (one matching ALL 500k docs) k=10") {
      SearchIndex.bm25BatchTopK(docs, col("doc_id"), col("text"),
        queries, col("qid"), col("qtext"), k = 10).collect()
    }
    // getOrElse, not apply: a query that regresses to ZERO rows must fail
    // with the diagnostic message, not a bare key-not-found
    val byQ = batch.groupBy(_.getLong(0)).withDefaultValue(Array.empty)
    (0L until 100L).foreach { q =>
      val rows = byQ(q).sortBy(r => (-r.getLong(2), r.getLong(1)))
      assert(rows.nonEmpty && rows.head.getLong(1) == q * 5000L,
        s"query $q must rank its own doc first: got ${rows.map(_.getLong(1)).toSeq}")
    }
    assert(byQ(100000L).sortBy(r => (-r.getLong(2), r.getLong(1)))
      .take(5).map(_.getLong(1)).toSet == needleIds,
      "the needle query must surface the five planted docs")
    assert(byQ(100001L).length == 10,
      s"the stopword query returns k rows: ${byQ(100001L).length}")
    batchListener.drain(minTotalRows = 500000L)
    val worstBatch = batchListener.worstTaskRows
    println(f"[search-vol] batch worst shuffle task: $worstBatch%,d rows " +
      f"(single-level per-query ranking would put the stopword query's " +
      f"$nDocs%,d candidates on ONE task)")
    assert(worstBatch < nDocs * 7 / 10,
      f"hot query concentrated: worst task $worstBatch%,d rows")
    assert(tBatch < 120.0, f"batch BM25 took $tBatch%.1f s — complexity regression")

    // -- shape 4: batch BM25 LARGE-query-table regime (r16) -----------------
    // 10,002 queries forced through the distributed fallback
    // (broadcastQueryTermMax below the ~20k qterm rows): the vocabulary
    // prune and scoring joins become term-keyed shuffle-hash joins, idf is
    // computed by the native Bm25Idf expression, and NOTHING query-derived
    // is collected or broadcast — the regime a 10M-prompt decontamination
    // sweep runs in. Results must be identical in kind to shape 3: every
    // unique-token query ranks its own doc first, the stopword query still
    // can't concentrate its 500k candidates on one task.
    val bigListener = StageShuffleListener.install(spark)
    val bigQueries = spark.range(10000).select(
        col("id").as("qid"),
        concat(lit("w"), col("id") * 50L, lit("_3 w"), col("id") * 50L, lit("_7"))
          .as("qtext"))
      .unionAll(spark.range(1).select(lit(100000L).as("qid"), lit("needle search").as("qtext")))
      .unionAll(spark.range(1).select(lit(100001L).as("qid"), lit("the").as("qtext")))
    val (big, tBig) = time("bm25BatchTopK fallback regime: 10,002 queries, no query-side broadcast, k=10") {
      SearchIndex.bm25BatchTopK(docs, col("doc_id"), col("text"),
        bigQueries, col("qid"), col("qtext"), k = 10,
        broadcastQueryTermMax = 1000L).collect()
    }
    val byBigQ = big.groupBy(_.getLong(0)).withDefaultValue(Array.empty)
    (0L until 10000L).foreach { q =>
      val rows = byBigQ(q).sortBy(r => (-r.getLong(2), r.getLong(1)))
      assert(rows.nonEmpty && rows.head.getLong(1) == q * 50L,
        s"fallback query $q must rank its own doc first: got ${rows.map(_.getLong(1)).toSeq}")
    }
    assert(byBigQ(100000L).sortBy(r => (-r.getLong(2), r.getLong(1)))
      .take(5).map(_.getLong(1)).toSet == needleIds,
      "the needle query must surface the five planted docs in the fallback regime")
    assert(byBigQ(100001L).length == 10,
      s"the stopword query returns k rows in the fallback regime: ${byBigQ(100001L).length}")
    bigListener.drain(minTotalRows = 500000L)
    val worstBig = bigListener.worstTaskRows
    println(f"[search-vol] fallback worst shuffle task: $worstBig%,d rows")
    assert(worstBig < nDocs * 7 / 10,
      f"fallback regime concentrated a hot key: worst task $worstBig%,d rows")
    assert(tBig < 180.0, f"fallback batch BM25 took $tBig%.1f s — complexity regression")

    // -- shape 5: hot QUERY-SIDE term — the SMJ scoring join must SPILL -----
    // The r16 SMJ swap exists for a term appearing in a large fraction of a
    // prompt sweep: the scoring join's buffered side holds EVERY query row
    // of the current (term, salt) group, which for such a term is unbounded
    // — a shuffle-hash build there is memory-resident and OOMs, while SMJ's
    // ExternalAppendOnlyUnsafeRowArray spills the group to disk. Shape 4's
    // query side is benign (the stopword group is 32 rows), so this shape
    // plants `needle` (corpus df = 5, keeping the join OUTPUT small) into
    // a third of 100k queries: the (needle, salt) group buffers 33,334
    // query rows per salt bucket. The session's SMJ buffer thresholds are
    // forced low (in-memory 1,024 rows / spill 8,192 rows — the idiom
    // Spark's own SortMergeJoin spill tests use) so the group MUST take the
    // spill path at rehearsal scale; the assertion is on task-metrics disk
    // spill bytes: > 0 proves the buffer went through the spillable array,
    // not a resident buffer. Default thresholds are restored after.
    // fallbackSaltBuckets is left at the auto default — n = 500k derives
    // prune width 32, and the r18 max(df)-derived scoring width also lands
    // on the 32 floor here (the probe assertion below), so this shape
    // rehearses BOTH derivations end-to-end.
    spark.conf.set("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", "1024")
    spark.conf.set("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "8192")
    val spillListener = StageShuffleListener.install(spark)
    val hotQueries = spark.range(100000).select(
      col("id").as("qid"),
      concat(
        lit("w"), col("id") * 5L, lit("_3 w"), col("id") * 5L, lit("_7"),
        when(col("id") % 3 === 0, lit(" needle")).otherwise(lit("")))
        .as("qtext"))
    val (hot, tHot) = time("bm25BatchTopK hot query-side term: 100k queries, 33,334 share `needle`, k=5") {
      SearchIndex.bm25BatchTopK(docs, col("doc_id"), col("text"),
        hotQueries, col("qid"), col("qtext"), k = 5,
        broadcastQueryTermMax = 1000L).collect()
    }
    assert(SearchIndex.lastFallbackSaltBuckets == 32,
      s"auto salt width at n=500k must derive 32, got ${SearchIndex.lastFallbackSaltBuckets}")
    val byHotQ = hot.groupBy(_.getLong(0)).withDefaultValue(Array.empty)
    // every query's own doc (matched by its two globally-unique tokens)
    // must outrank the needle docs; non-needle queries match ONLY their doc
    (0L until 100000L by 997L).foreach { q =>   // stride keeps the driver loop cheap
      val rows = byHotQ(q).sortBy(r => (-r.getLong(2), r.getLong(1)))
      assert(rows.nonEmpty && rows.head.getLong(1) == q * 5L,
        s"hot-shape query $q must rank its own doc first: got ${rows.map(_.getLong(1)).toSeq}")
      val want = if (q % 3 == 0) 5 else 1
      assert(rows.length == want,
        s"hot-shape query $q: ${rows.length} rows, want $want (own doc ${if (want == 5) "+ 4 needle docs" else "only"})")
    }
    spillListener.drain(minTotalRows = 1000000L)
    val worstHot = spillListener.worstTaskRows
    val spillDisk = spillListener.totalDiskSpillBytes
    val spillMem = spillListener.totalMemorySpillBytes
    println(f"[search-vol] hot-query-side worst shuffle task: $worstHot%,d rows; " +
      f"spill: $spillMem%,d bytes memory / $spillDisk%,d bytes disk")
    // The row bound here is WIDER than shapes 1-4's 0.7·nDocs: this shape's
    // exploded query side is byte-tiny (~30 B/row), so AQE legitimately
    // COALESCES its 7.5M-row shuffle into ~15 even tasks of ~500k rows
    // (measured 506k — 7.47M / 506k ≈ 15 tasks at the 64 MB advisory
    // target). That is balance, not concentration; the hazard this shape
    // exists for is the SMJ's per-(term, salt) group BUFFER, which the
    // disk-spill assertion below covers. 2M rows still fails loudly on a
    // complexity-class regression (an unsalted hot key or an accidental
    // query×needle-doc blowup lands the full group product on one task).
    assert(worstHot < 2000000L,
      f"hot query-side term concentrated: worst task $worstHot%,d rows")
    assert(spillDisk > 0L,
      "the SMJ scoring join must SPILL the 33,334-row (needle, salt) query group " +
        "under the forced thresholds — zero disk spill means the group was " +
        "resident-buffered and the spillability claim is untested")
    assert(tHot < 240.0, f"hot query-side batch BM25 took $tHot%.1f s — complexity regression")
    spark.conf.unset("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold")
    spark.conf.unset("spark.sql.sortMergeJoinExec.buffer.spill.threshold")

    // -- shape 6: DERIVED above-floor salt width (r18) -----------------------
    // Every auto-width execution so far landed on the 32 floor (all
    // rehearsal corpora ≤ 8M docs); the spec's forced-256 run covers the
    // explicit-argument path but not the derivation choosing > 32 itself.
    // 9M two-token docs: autoSaltBuckets(9M) = nextPow2(36) = 64 for the
    // prune join, and the universal term `c` (df = 9M = n) drives
    // scoringSaltWidth(9M, 9M) = 64 — both joins execute at a DATA-CHOSEN
    // width above the floor, ×64 query-side explode and all. 50
    // unique-token queries must each rank exactly their own doc; the
    // universal-term query's 9M candidates spread over 64 salt buckets
    // (~140k/task at the scoring join) and return exactly k rows.
    val wideDocs = spark.range(9000000L).select(
      col("id").as("doc_id"),
      concat(lit("c w"), col("id")).as("text")).localCheckpoint()
    val wideListener = StageShuffleListener.install(spark)
    val wideQueries = spark.range(50).select(
        col("id").as("qid"),
        concat(lit("w"), col("id") * 137L).as("qtext"))
      .unionAll(spark.range(1).select(lit(100000L).as("qid"), lit("c").as("qtext")))
    val (wide, tWide) = time("bm25BatchTopK derived width 64: 9M docs, universal term, 51 queries, k=5") {
      SearchIndex.bm25BatchTopK(wideDocs, col("doc_id"), col("text"),
        wideQueries, col("qid"), col("qtext"), k = 5,
        broadcastQueryTermMax = 10L).collect()
    }
    assert(SearchIndex.lastFallbackPruneSaltBuckets == 64,
      s"n=9M must DERIVE prune width 64, got ${SearchIndex.lastFallbackPruneSaltBuckets}")
    assert(SearchIndex.lastFallbackSaltBuckets == 64,
      s"max(df)=9M must DERIVE scoring width 64, got ${SearchIndex.lastFallbackSaltBuckets}")
    val byWideQ = wide.groupBy(_.getLong(0)).withDefaultValue(Array.empty)
    (0L until 50L).foreach { q =>
      val rows = byWideQ(q)
      assert(rows.length == 1 && rows.head.getLong(1) == q * 137L,
        s"derived-width query $q must match exactly its own doc: got ${rows.map(_.getLong(1)).toSeq}")
    }
    assert(byWideQ(100000L).length == 5,
      s"the universal-term query returns k rows at derived width 64: ${byWideQ(100000L).length}")
    wideListener.drain(minTotalRows = 9000000L)
    val worstWide = wideListener.worstTaskRows
    println(f"[search-vol] derived-width-64 worst shuffle task: $worstWide%,d rows " +
      f"(unsalted, the universal term's 9,000,000 candidates land on ONE task)")
    // 18M stream rows / 32 partitions ≈ 560k/task balanced; the salted
    // scoring join sees ~9M/64 ≈ 140k/task for the universal term. 2.5M
    // fails loudly if the hot key ever re-concentrates (9M on one task).
    assert(worstWide < 2500000L,
      f"derived-width regime concentrated the universal term: worst task $worstWide%,d rows")
    assert(tWide < 300.0, f"derived-width batch BM25 took $tWide%.1f s — complexity regression")
    spark.stop()
  }
}
