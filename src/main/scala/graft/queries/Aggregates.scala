package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Aggregation surface: GROUP BY, HAVING, DISTINCT aggregates, ROLLUP/CUBE/
  * GROUPING SETS, statistical aggregates, conditional aggregation, approx
  * sketches (SURVEY.md §2.B row "Aggregations").
  *
  * Scale notes:
  *   - every groupBy here is a hash aggregate with map-side partial
  *     aggregation (Spark plans partial_ + final HashAggregate) — the shuffle
  *     carries pre-aggregated groups, not raw rows;
  *   - double sums go through exact DECIMAL accumulation so results are
  *     independent of partition count / merge order — required for the
  *     driver's hash-compare, and the right call at 1000 executors too;
  *   - approx_count_distinct is the 100 TB path for distinct counting (HLL,
  *     no shuffle of raw values) — it has no DuckDB-identical oracle, so it
  *     is a rows-only check.
  */
object Aggregates {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  /** [[t]] spread over every core before a CPU-heavy partial aggregate
    * (exact DECIMAL sums, exact percentile value maps): scan parallelism is
    * row-group-bound, so a small fact table funnels the partial-aggregate
    * stage through 1-3 tasks (r19 StageBreakdownProbe: q1_agg's scan+partial
    * stage was 1.5 s on 3 tasks). Bytes-gated no-op at scale; column pruning
    * pushes below the exchange so only the aggregated columns shuffle. */
  private def tRebalanced(s: SparkSession, dir: String, n: String) =
    graft.operators.Rebalance.smallInput(Tables.table(s, dir, n))

  /** Exact sum of a double column: DECIMAL(18,4) accumulation, DOUBLE out. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q1_agg",
      // TPC-H Q1 shape — the flagship pricing-summary aggregate.
      (s, dir) => {
        tRebalanced(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            (dsum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    ),

    QueryDef(
      "q_having",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("total_qty"))
          .filter(col("n") > 20)
          .orderBy(col("l_suppkey"))
      },
      Some("""SELECT l_suppkey, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
             |FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 20
             |ORDER BY l_suppkey""".stripMargin),
    ),

    QueryDef(
      "q_agg_distinct",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("distinct_parts"),
            countDistinct(col("l_suppkey")).as("distinct_supps"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  COUNT(DISTINCT l_partkey) AS distinct_parts,
             |  COUNT(DISTINCT l_suppkey) AS distinct_supps,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    ),

    QueryDef(
      "q_rollup",
      (s, dir) => {
        tRebalanced(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            grouping(col("l_returnflag")).cast("int").as("g_rf"),
            grouping(col("l_linestatus")).cast("int").as("g_ls"),
            count(lit(1)).as("n"),
            dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("g_rf"), col("g_ls"),
            col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf, CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
    ),

    QueryDef(
      "q_cube",
      (s, dir) => {
        t(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            grouping(col("o_orderstatus")).cast("int").as("g_st"),
            grouping(col("o_orderpriority")).cast("int").as("g_pr"),
            count(lit(1)).as("n"),
            dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("g_st"), col("g_pr"),
            col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(GROUPING(o_orderstatus) AS INT) AS g_st, CAST(GROUPING(o_orderpriority) AS INT) AS g_pr,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY g_st, g_pr, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin),
    ),

    QueryDef(
      "q_grouping_sets",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupingSets(
            Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
            col("l_returnflag"), col("l_linestatus"))
          .agg(
            grouping(col("l_returnflag")).cast("int").as("g_rf"),
            grouping(col("l_linestatus")).cast("int").as("g_ls"),
            count(lit(1)).as("n"))
          .orderBy(col("g_rf"), col("g_ls"),
            col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf, CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
             |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
    ),

    QueryDef(
      "q_agg_stats",
      // Statistical aggregates: min/max exact; stddev/variance/corr rounded —
      // their float accumulation order differs across engines by design.
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"),
            round(stddev_samp(col("l_quantity")), 4).as("stddev_qty"),
            round(var_samp(col("l_quantity")), 4).as("var_qty"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
             |  ROUND(stddev_samp(l_quantity), 4) AS stddev_qty,
             |  ROUND(var_samp(l_quantity), 4) AS var_qty,
             |  ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    ),

    QueryDef(
      "q_conditional_agg",
      (s, dir) => {
        t(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("o_totalprice") > 100000, 1L).otherwise(0L)).as("n_big"),
            dsum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice")).otherwise(lit(0.0)))
              .as("urgent_price"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
             |  CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
             |  CAST(SUM(CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END
             |       AS DECIMAL(18,4))) AS DOUBLE) AS urgent_price
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
    ),

    QueryDef(
      "q_percentile",
      // Exact interpolated percentile (Spark `percentile` ≡ DuckDB
      // `quantile_cont`), rounded to absorb float division differences.
      // Memory shape: exact `percentile` buffers an in-memory value map PER
      // GROUP — fine here (3 groups × ≤100k distinct values) and required
      // for oracle exactness, but past ~10M distinct values per group switch
      // to approx_percentile (q_approx_percentile's plan) — see SCALE.md
      // "Exact percentile".
      // NOT rebalanced (r20): the r19 spread regressed this query in the
      // driver's run (0.82×) — spreading the partial aggregate 32 ways
      // means 32 per-group value maps merged where 3 sufficed (measured
      // directly on q_approx_percentile: task time 11.5 s spread vs 3.1 s
      // unspread). A sort+window exact percentile
      // (operators/Percentiles.scala) was also built and A/B'd here: MORE
      // jobs (6 vs 4) and more task time (4.4 s vs 3.1 s) than the plain
      // aggregate on this shape, because l_quantity has ~50 distinct
      // values per group — the value map is tiny and beats two full-column
      // sorts. The window form wins only on distinct-heavy columns
      // (q_approx_percentile's exact median uses it); banked in
      // tools/ab_pct_odf_r20.jsonl and OPTIMIZATION_r20.md.
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
            round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
             |  ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    ),

    QueryDef(
      "q_approx_distinct",
      // HLL sketch — the at-scale distinct-count path. Sketch estimates
      // differ across engines, so the query emits the exact NDV plus an
      // in-query boolean asserting the sketch landed within 5% of exact.
      // NOTE: HLL++'s 5% rsd is one standard deviation, not a hard bound —
      // the oracle's hardcoded TRUE is data-dependent, verified to hold on
      // the driver's sf0.001–0.1 corpora (deterministic sketch, fixed data);
      // a different corpus could legitimately land outside one sigma.
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("exact_parts"),
            approx_count_distinct(col("l_partkey")).as("approx"))
          .select(
            col("l_returnflag"),
            col("exact_parts"),
            (abs(col("approx") - col("exact_parts")) <=
              col("exact_parts") * 0.05).as("approx_within_5pct"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  COUNT(DISTINCT l_partkey) AS exact_parts,
             |  TRUE AS approx_within_5pct
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    ),
  )
}
