package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.SparkEntry

/** Physical-plan shape assertions for the headline queries: these pin the
  * plans that survive a 100× scale-up, not just ones that pass on 60k rows.
  * A regression that un-broadcasts a dimension, un-pushes a filter, or turns
  * a top-k into a global sort changes results not at all — and cluster cost
  * by orders of magnitude — so the shape itself is under test.
  */
class QueryPlansSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-plans-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q_join_multi: every dimension rides a broadcast join — no shuffle join anywhere") {
    val p = plan("q_join_multi")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "a dimension fell out of broadcast:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_sort_limit: top-k plans as TakeOrderedAndProject, never a global sort") {
    val p = plan("q_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q_bm25_topk: scoring is scan-side — top-k heap, no exchange of the corpus") {
    val p = plan("q_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    // per-term tf rides the scan projection; the only shuffle anywhere is
    // inside the one-row stats aggregate already collected at plan time,
    // so the SCORING plan carries NO exchange of any kind (r20: the r19
    // round-robin rebalance was reverted here after the driver measured it
    // as a regression, so the r19 carve-out is gone and the original
    // strict no-exchange claim is restored; the regex is anchored so a
    // future BroadcastExchange would not be miscounted as a shuffle).
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(2000))
    val exchanges = "(?<!Broadcast)Exchange ".r.findAllIn(p).size
    assert(exchanges == 0,
      "BM25 scoring should ride the scan with a top-k heap (exchange found):\n" + p.take(2000))
  }

  test("q_bm25_batch: query-side-only broadcasts, corpus reads its checkpoint, candidate-sized shuffles only") {
    val p = plan("q_bm25_batch")
    // the batch plan must never fall back to a per-(query,doc) cartesian or
    // a nested-loop probe — that's the shape bm25BatchTopK exists to avoid
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // corpus-derived frames never shuffle INTO a join: the vocab prune and
    // the qterms×idf scoring join both ride broadcasts of query-side data
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "corpus side fell out of broadcast:\n" + p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // the (term, doc, tf) candidate frame was checkpointed at build time —
    // the scoring plan reads the materialized RDD, not the corpus scan
    assert(p.contains("Scan ExistingRDD"),
      "scoring must read the checkpointed candidates:\n" + p.take(3000))
    // candidate/query-sized hash shuffles only: qterms distinct (query-side,
    // inside the broadcast subtree), the per-(query,doc) score aggregate,
    // and the two top-k window levels; a 5th would mean the corpus token
    // stream leaked into the final plan
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles <= 4,
      s"expected ≤4 candidate/query-sized shuffles, got $hashShuffles:\n" + p.take(4000))
    // presentation sort of the ≤ queries×k result only
    assert("Exchange rangepartitioning".r.findAllIn(p).size <= 1, p.take(3000))
  }

  test("q_inverted_index: both top-k levels are spillable windowed ranks, two shuffles, cap-bounded list agg") {
    val p = plan("q_inverted_index")
    // level 1 (token, source-partition) + level 2 (token): each level is a
    // count/sum spec plus an ordered row_number spec = 4 Window operators,
    // all in the spillable window exec — a collect_list-as-window or a
    // pre-filter list merge would reintroduce the cap×partitions in-memory
    // group the r15 rewrite removed
    val windows = "Window \\[".r.findAllIn(p).size
    assert(windows == 4, s"expected 4 Window ops (2 per level), got $windows:\n" + p.take(3000))
    assert(!p.linesIterator.exists(l =>
        l.contains("collect_list") && l.contains("windowspecdefinition")),
      "collect_list must never run as a window function:\n" + p.take(3000))
    // Spark's rank-limit pushdown must hold on both levels: the top-cap
    // prune happens inside each sort (partial WindowGroupLimit) instead of
    // ranking the full partition first
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "rank-limit pushdown lost:\n" + p.take(3000))
    // two data shuffles only: one per window level; the final ≤cap-row
    // string aggregate reuses the level-2 (token) partitioning
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 2, s"expected 2 shuffles (one per level), got $hashShuffles:\n" + p.take(3000))
  }

  test("q_filter: predicates reach the parquet scan as PushedFilters") {
    val p = plan("q_filter")
    assert(p.contains("PushedFilters: ["), p.take(2000))
    // at least one real pushed predicate, not an empty list
    assert(!p.matches("(?s).*PushedFilters: \\[\\].*"), p.take(2000))
  }

  test("q_projection: scan reads only the projected columns") {
    val p = plan("q_projection")
    // lineitem has 16 columns; the query projects a handful — the scan's
    // ReadSchema must not contain a column the query never touches
    assert(p.contains("ReadSchema"), p.take(2000))
    assert(!p.contains("l_comment"), "column pruning lost:\n" + p.take(2000))
  }

  test("q_quality_gate: single-row threshold rides a broadcast nested loop, not a cartesian shuffle") {
    val p = plan("q_quality_gate")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q1_agg: aggregation is partial+final (map-side combine) inside codegen") {
    val df = SparkEntry.queries("q1_agg")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p.take(2000))
    // partial + final pair: map-side combine before the exchange
    assert(p.contains("partial_sum"), p.take(2000))
    // codegen spans only materialize once AQE finalizes the plan — execute,
    // then inspect the final plan
    df.collect()
    val finalP = df.queryExecution.executedPlan.toString
    // "*(n) " is the WholeStageCodegen span marker in the compact rendering
    assert(finalP.contains("*("), finalP.take(2000))
  }

  test("q_dedup_incremental: corpus side broadcasts into the anti-join") {
    val p = plan("q_dedup_incremental")
    assert(p.contains("Union"), p.take(2000))
    assert(p.contains("LeftAnti"), p.take(2000))
  }

  test("q_curation_pipeline: exactly two shuffles end-to-end (SCALE.md claim)") {
    // lang filter → percentile gate → exact dedup → hash split → rollup as
    // ONE plan: the only exchanges allowed are the dedup hash-aggregate and
    // the final small rollup. The percentile bounds must arrive by broadcast
    // (single row), never via a shuffled join.
    val p = plan("q_curation_pipeline")
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 2, s"expected 2 data shuffles (dedup agg + rollup), got $hashShuffles:\n" + p.take(3000))
    // the only other exchange allowed is the presentation ORDER BY on the
    // ~9-row rollup output (range partitioning of a trivial row count)
    assert("Exchange rangepartitioning".r.findAllIn(p).size <= 1, p.take(3000))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "percentile bounds must broadcast:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q_mixture_sample: the hash filter rides the scan — no Exchange before the aggregate") {
    val p = plan("q_mixture_sample")
    // membership is a codegen'd filter over md5-bucket arithmetic; the only
    // shuffles are the final per-source aggregate (+AQE artifacts), never
    // one feeding the filter itself
    assert(p.contains("Filter"), p.take(2000))
    val filterIdx = p.indexOf("Filter")
    val scanIdx = p.indexOf("FileScan")
    assert(scanIdx > filterIdx, "filter must sit directly on the scan:\n" + p.take(2000))
    assert(!p.substring(filterIdx, scanIdx).contains("Exchange"),
      "a shuffle crept between filter and scan:\n" + p.take(2000))
  }

  test("q_bpe_encode: the whole merge table rides ONE native expression, join is not cartesian") {
    // the r11 plan carried the table as a 6-deep StringReplace chain (one
    // call per rank — the O(100)-rank ceiling); the native BpeUnits
    // expression holds the table as one plan literal. Pin exactly one
    // BpeUnits in the whole optimized plan, zero residual replaces, and a
    // non-cartesian word join.
    import org.apache.spark.sql.catalyst.expressions.StringReplace
    val qe = SparkEntry.queries("q_bpe_encode")(spark, dir).queryExecution
    assert(!qe.executedPlan.toString.contains("CartesianProduct"))
    val bpePerNode = qe.optimizedPlan.collect { case n =>
      n.expressions.map(e =>
        e.collect { case _: graft.functions.NativeHashes.BpeUnits => 1 }.sum).sum
    }.filter(_ > 0)
    assert(bpePerNode == Seq(1),
      s"expected one node carrying one BpeUnits, got per-node counts $bpePerNode")
    val replaces = qe.optimizedPlan.collect { case n =>
      n.expressions.map(e => e.collect { case _: StringReplace => 1 }.sum).sum
    }.sum
    assert(replaces == 0, s"no per-rank replace chain may remain, found $replaces")
  }

  test("q_text_perplexity: c1 derives from the c12 aggregate — the corpus-scale bigram stage runs ONCE") {
    // c1(w1) = Σ_w2 c12(w1,w2), so the context counts re-aggregate the
    // (vocab²-sized) c12 table instead of running a second corpus-scale
    // pass over the occurrence stream. In plan terms: the c12 branch and
    // the c1 branch sit on CANONICALLY IDENTICAL bg-keyed exchanges, which
    // AQE dedupes at runtime into a ReusedExchange — the token-frame
    // checkpoint is touched twice (c12 + probe join), never three times.
    val df = SparkEntry.queries("q_text_perplexity")(spark, dir)
    val lazyScans = "Scan ExistingRDD".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(lazyScans == 3, s"expected 3 lazy token-frame scans (c12, c1-via-c12, probe), got $lazyScans")
    df.collect()
    val finalP = df.queryExecution.executedPlan.toString
    assert(finalP.contains("ReusedExchange"),
      "the c1 branch must reuse the c12 shuffle stage (a direct w1 aggregate over the " +
        "occurrence stream would be a third corpus-scale pass):\n" + finalP.take(3000))
  }

  test("q_ann_ivf / q_ann_lsh: the exact brute-force top-k runs ONCE, not per reference") {
    // annVsExact materializes the nQueries-row exact aggregate with a
    // localCheckpoint, so the lazy plan must carry NO brute-force
    // queries×corpus join at all (it already ran, once) — both output
    // columns read the checkpointed RDD instead of re-deriving it
    for (name <- Seq("q_ann_ivf", "q_ann_lsh")) {
      val p = plan(name)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$name re-runs the brute-force corpus scan per reference:\n" + p.take(3000))
      assert(p.contains("Scan ExistingRDD"), s"$name must read the checkpointed exact top-k:\n" + p.take(2000))
    }
    // ...and the two queries SHARE that checkpoint: the exact side is
    // memoized per (session, sfDir), so q_ann_lsh + q_ann_ivf together cost
    // one brute-force scan per session, not one each (r8 verdict item #4)
    assert(SimilarityQueries.exactTopK(spark, dir) eq SimilarityQueries.exactTopK(spark, dir),
      "exact top-k must be memoized per (session, dir)")
  }

  test("compat-dialect queries leave the shared session's function registry pure") {
    // DataFusionCompat OVERRIDES Spark builtins (array_remove → DataFusion's
    // remove-FIRST, log → log10, trunc, encode/decode). Verify/Bench run all
    // 120 queries through ONE shared session, so a query that registers the
    // compat layer into `s` instead of `s.newSession()` silently flips the
    // semantics of every later query that resolves those names — exactly how
    // q_date_bin (pre-fix) corrupted q_bm25_topk's per-term tf counts (its
    // array_remove-based count relies on remove-ALL) in full Verify runs
    // while every standalone run passed. Pin: after building every
    // compat-registering query, the shared registry still resolves the
    // Spark builtins.
    for (name <- Seq("q_date_bin", "q_df_dialect", "q_df_dialect2"))
      SparkEntry.queries(name)(spark, dir).collect()
    val r = spark.sql(
      "SELECT array_remove(array(1, 2, 1), 1) AS ar, round(log(100.0), 6) AS ln100").head()
    assert(r.getSeq[Int](0) == Seq(2),
      s"array_remove lost Spark's remove-ALL semantics in the shared session: ${r.getSeq[Int](0)}")
    assert(math.abs(r.getDouble(1) - 4.60517) < 1e-4,
      s"log lost Spark's natural-log semantics in the shared session: ${r.getDouble(1)}")
  }

  test("exactTopKCache is evictable: clear drops entries and a fresh build repopulates") {
    // Lifecycle contract (r9 advice): the memo must not pin checkpointed
    // RDDs forever — stopped-session entries purge on access (not
    // rehearsable in-suite: local tests share one SparkContext), and the
    // explicit clear hook Bench/Verify call must actually empty the map.
    val before = SimilarityQueries.exactTopK(spark, dir)
    assert(SimilarityQueries.exactTopKCacheSize >= 1)
    SimilarityQueries.clearExactTopKCache()
    assert(SimilarityQueries.exactTopKCacheSize == 0, "clear hook left entries behind")
    val after = SimilarityQueries.exactTopK(spark, dir)
    assert(!(after eq before), "post-clear access must rebuild, not resurrect")
    assert(SimilarityQueries.exactTopK(spark, dir) eq after, "memoization must resume after clear")
  }
}
