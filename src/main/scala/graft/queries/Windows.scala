package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Window-function surface: ranking, running aggregates, lag/lead, frames,
  * ntile/percent_rank/cume_dist, first/last value (SURVEY.md §2.B row
  * "Window functions").
  *
  * Every window is partitioned on a real key — at scale the shuffle is the
  * partitionBy hash exchange and each partition sorts locally; no global
  * single-partition windows (the reference's ROW_NUMBER-over-everything is
  * confined to the ODF offset stage, which is a contract requirement there).
  *
  * KEY-CARDINALITY CONTRACT: a single-level `Window.partitionBy(k)` sorts
  * each key's rows on ONE task, so it is only safe when rows-per-key is
  * bounded (here: natural entity keys — nation, custkey, orderstatus —
  * whose per-key row counts grow sublinearly with the corpus). For a key
  * that can degenerate (sentinel ids, null-bucketed defaults, whole-corpus
  * hot keys), use a two-level shape instead: rank within
  * (key, spark_partition_id()) then merge (SearchIndex.invertedIndex,
  * VectorOps.topKPerQuery), or segment the time axis and carry boundaries
  * (TemporalJoins.asofBackward). Don't copy a single-level window from
  * here into an unbounded-key context.
  *
  * Window ORDER BYs always end in a unique key so frame contents — and hence
  * results — are engine-independent.
  */
object Windows {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_window_rank",
      // Top-3 customers per nation by balance.
      (s, dir) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, dir, "customer")
          .select(
            col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
            row_number().over(w).as("rn"),
            rank().over(w).as("rk"),
            dense_rank().over(w).as("drk"))
          .filter(col("rn") <= 3)
          .orderBy(col("c_nationkey"), col("rn"))
      },
      Some("""SELECT * FROM (
             |  SELECT c_nationkey, c_custkey, c_acctbal,
             |         CAST(ROW_NUMBER() OVER w AS INT) AS rn, CAST(RANK() OVER w AS INT) AS rk, CAST(DENSE_RANK() OVER w AS INT) AS drk
             |  FROM customer
             |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
             |) WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin),
    ),

    QueryDef(
      "q_window_runsum",
      // Running revenue per customer over order history (exact DECIMAL
      // accumulation so the running values match the oracle bit-for-bit).
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .filter(col("o_custkey") < 200)
          .select(
            col("o_custkey"), col("o_orderkey"),
            sum(dec(col("o_totalprice"))).over(w).cast("double").as("run_total"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
             |FROM orders WHERE o_custkey < 200
             |ORDER BY o_custkey, o_orderkey""".stripMargin),
    ),

    QueryDef(
      "q_window_lag",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .filter(col("o_custkey") < 200)
          .select(
            col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"),
            (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta_prev"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  LAG(o_totalprice, 1) OVER w AS prev_price,
             |  LEAD(o_totalprice, 1) OVER w AS next_price,
             |  o_totalprice - LAG(o_totalprice, 1) OVER w AS delta_prev
             |FROM orders WHERE o_custkey < 200
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin),
    ),

    QueryDef(
      "q_window_frame",
      // Sliding 3-row frame: moving sum + explicit moving average (exact
      // sum / exact count, so the division is deterministic).
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(-2, Window.currentRow)
        t(s, dir, "orders")
          .filter(col("o_custkey") < 200)
          .select(
            col("o_custkey"), col("o_orderkey"),
            sum(dec(col("o_totalprice"))).over(w).cast("double").as("mov_sum"),
            (sum(dec(col("o_totalprice"))).over(w).cast("double") /
              count(lit(1)).over(w)).as("mov_avg"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS mov_sum,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
             |    / COUNT(*) OVER w AS mov_avg
             |FROM orders WHERE o_custkey < 200
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, o_orderkey""".stripMargin),
    ),

    QueryDef(
      "q_window_range_frame",
      // RANGE frame over a numeric ordering column: all orders within
      // ±10000 of the current price count as peers.
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice"))
          .rangeBetween(-10000L, 10000L)
        t(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .select(
            col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
            count(lit(1)).over(w).as("n_peers"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice,
             |  COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
             |                 RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS n_peers
             |FROM orders WHERE o_custkey < 100
             |ORDER BY o_orderkey""".stripMargin),
    ),

    QueryDef(
      "q_window_ntile",
      (s, dir) => {
        val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .select(
            col("o_orderkey"), col("o_totalprice"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice,
             |  CAST(NTILE(4) OVER w AS INT) AS quartile,
             |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
             |  ROUND(CUME_DIST() OVER w, 6) AS cume
             |FROM orders WHERE o_custkey < 100
             |WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)
             |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin),
    ),

    QueryDef(
      "q_window_firstlast",
      (s, dir) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "customer")
          .filter(col("c_custkey") < 500)
          .select(
            col("c_nationkey"), col("c_custkey"),
            first(col("c_name")).over(w).as("richest"),
            last(col("c_name")).over(w).as("poorest"))
          .orderBy(col("c_nationkey"), col("c_custkey"))
      },
      Some("""SELECT c_nationkey, c_custkey,
             |  FIRST_VALUE(c_name) OVER w AS richest,
             |  LAST_VALUE(c_name) OVER w AS poorest
             |FROM customer WHERE c_custkey < 500
             |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY c_nationkey, c_custkey""".stripMargin),
    ),
  )
}
