package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Join surface: inner/left/full/cross equi joins, semi/anti (EXISTS / IN
  * subqueries), multi-way star join, scalar subquery (SURVEY.md §2.B row
  * "Joins").
  *
  * Scale notes:
  *   - `nation`/`region` are bounded dimensions — always `broadcast()`: the
  *     probe side streams map-side with no shuffle at any scale;
  *   - fact⋈fact joins (orders⋈lineitem) shuffle on the join key; AQE picks
  *     sort-merge vs shuffled-hash and handles skew at runtime;
  *   - semi/anti joins ship only the key column of the build side — Catalyst
  *     plans LeftSemi/LeftAnti, never materializing the subquery result.
  */
object Joins {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_join_inner",
      (s, dir) => {
        t(s, dir, "orders").join(t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
    ),

    QueryDef(
      "q_join_multi",
      // TPC-H Q5 shape: star join over two facts and three broadcast dims.
      (s, dir) => {
        val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(18, 4))
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .join(t(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(sum(rev).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
    ),

    QueryDef(
      "q_join_left",
      (s, dir) => {
        broadcast(t(s, dir, "nation"))
          .join(t(s, dir, "customer"), col("n_nationkey") === col("c_nationkey"), "left")
          .groupBy(col("n_nationkey"), col("n_name"))
          .agg(
            count(col("c_custkey")).as("n_customers"),
            coalesce(dsum(col("c_acctbal")), lit(0.0)).as("total_bal"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey, n_name, COUNT(c_custkey) AS n_customers,
             |  COALESCE(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS total_bal
             |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
             |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin),
    ),

    QueryDef(
      "q_join_right",
      // Right outer join: all nations kept from the right side even with no
      // matching supplier.
      (s, dir) => {
        t(s, dir, "supplier")
          .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"), "right")
          .groupBy(col("n_nationkey"), col("n_name"))
          .agg(
            count(col("s_suppkey")).as("n_suppliers"),
            coalesce(dsum(col("s_acctbal")), lit(0.0)).as("total_bal"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey, n_name, COUNT(s_suppkey) AS n_suppliers,
             |  COALESCE(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS total_bal
             |FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin),
    ),

    QueryDef(
      "q_join_full",
      // Full outer join of two pre-aggregated sides (aggregate-then-join:
      // the join input is one row per key, not the raw fact table).
      (s, dir) => {
        val cust = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk_c"))
          .agg(count(lit(1)).as("n_cust"))
        val supp = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk_s"))
          .agg(count(lit(1)).as("n_supp"))
        cust.join(supp, col("nk_c") === col("nk_s"), "full")
          .select(
            coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy(col("nationkey"))
      },
      Some("""SELECT COALESCE(c.nk, s.nk) AS nationkey,
             |       COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
             |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
             |FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
             |ON c.nk = s.nk ORDER BY nationkey""".stripMargin),
    ),

    QueryDef(
      "q_join_semi",
      // EXISTS → LeftSemi: only c_custkey of the build side crosses the wire.
      (s, dir) => {
        val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
        t(s, dir, "customer")
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin),
    ),

    QueryDef(
      "q_join_anti",
      // NOT EXISTS → LeftAnti.
      (s, dir) => {
        val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
        t(s, dir, "customer")
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin),
    ),

    QueryDef(
      "q_join_cross",
      (s, dir) => {
        val statuses = t(s, dir, "orders").select(col("o_orderstatus")).distinct()
        t(s, dir, "region").crossJoin(statuses)
          .select(col("r_regionkey"), col("r_name"), col("o_orderstatus"))
          .orderBy(col("r_regionkey"), col("o_orderstatus"))
      },
      Some("""SELECT r_regionkey, r_name, o_orderstatus
             |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
             |ORDER BY r_regionkey, o_orderstatus""".stripMargin),
    ),

    QueryDef(
      "q_subquery_scalar",
      // Scalar subquery: single-row aggregate joined below the filter.
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val avgPrice = orders.agg(
          (dsum(col("o_totalprice")) / count(lit(1))).as("avg_price"))
        orders.crossJoin(broadcast(avgPrice))
          .filter(col("o_totalprice") > col("avg_price") * 1.5)
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             |                             / COUNT(*) FROM orders) * 1.5
             |ORDER BY o_orderkey""".stripMargin),
    ),

    QueryDef(
      "q_subquery_in",
      // IN subquery → LeftSemi on the distinct key set.
      (s, dir) => {
        val heavy = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
          .select(col("l_partkey"))
        t(s, dir, "part")
          .join(heavy, col("p_partkey") === col("l_partkey"), "left_semi")
          .select(col("p_partkey"), col("p_name"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
             |ORDER BY p_partkey""".stripMargin),
    ),

    QueryDef(
      "q_asof_join",
      // Backward as-of join: each view/click event picks up the user's
      // latest purchase value at-or-before it. Implemented as union-tag +
      // one window scan per key (graft.operators.TemporalJoins) — not an
      // inequality join; oracle is DuckDB's native ASOF LEFT JOIN.
      (s, dir) => {
        val ev = t(s, dir, "events")
        val left = ev.filter(col("event_type").isin("view", "click"))
          .select(col("event_id"), col("user_id"), col("ts"))
        val right = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts").as("pts"))
          .agg(max(col("value")).as("pvalue"))
        graft.operators.TemporalJoins.asofBackward(left, right, "user_id", "ts", "pts")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            unix_micros(col("pts")).as("pts_us"),
            round(col("pvalue"), 6).as("pvalue"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT l.event_id, l.user_id,
             |  epoch_us(CAST(l.ts AS TIMESTAMP)) AS ts_us,
             |  epoch_us(CAST(r.pts AS TIMESTAMP)) AS pts_us,
             |  round(r.pvalue, 6) AS pvalue
             |FROM (SELECT event_id, user_id, ts FROM events
             |      WHERE event_type IN ('view', 'click')) l
             |ASOF LEFT JOIN (SELECT user_id, ts AS pts, max(value) AS pvalue
             |                FROM events WHERE event_type = 'purchase'
             |                GROUP BY 1, 2) r
             |  ON l.user_id = r.user_id AND l.ts >= r.pts
             |ORDER BY event_id""".stripMargin),
    ),

    QueryDef(
      "q_range_join",
      // Interval-overlap self-join: orders of the same customer whose
      // 30-day windows overlap. Binned decomposition (equi-join on
      // (key, 16-day bucket) + exact filter) — no per-key cross product.
      (s, dir) => {
        val w = t(s, dir, "orders").filter(col("o_custkey") < 200)
          .select(col("o_orderkey"), col("o_custkey"),
            unix_date(col("o_orderdate").cast("date")).as("start_d"))
          .withColumn("end_d", col("start_d") + 30)
        val w2 = w.select(col("o_custkey"), col("o_orderkey").as("o_orderkey2"),
          col("start_d").as("start2_d"), col("end_d").as("end2_d"))
        graft.operators.TemporalJoins
          .rangeOverlapJoin(w, w2, "o_custkey", "start_d", "end_d", "start2_d", "end2_d", 16L)
          .filter(col("o_orderkey") < col("o_orderkey2"))
          .select(col("o_custkey"), col("o_orderkey").as("k1"), col("o_orderkey2").as("k2"))
          .orderBy(col("o_custkey"), col("k1"), col("k2"))
      },
      Some("""WITH w AS (
             |  SELECT o_orderkey, o_custkey,
             |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS start_d,
             |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 30 AS end_d
             |  FROM orders WHERE o_custkey < 200)
             |SELECT a.o_custkey AS o_custkey, a.o_orderkey AS k1, b.o_orderkey AS k2
             |FROM w a JOIN w b ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
             |  AND a.start_d <= b.end_d AND b.start_d <= a.end_d
             |ORDER BY a.o_custkey, k1, k2""".stripMargin),
    ),
  )
}
