package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Core relational surface: projection, filtering, dedup, sort/limit,
  * set operations, conditionals and casts (SURVEY.md §2.B rows
  * "Projection", "Filter", "Sort / limit", "Set operations", "casts").
  *
  * All pure narrow transformations except the set ops — no shuffles besides
  * the final orderBy; filters and column pruning push down to the parquet
  * scans.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_projection",
      (s, dir) => {
        t(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            upper(col("l_returnflag")).as("rf"))
          // (l_orderkey, l_linenumber) is not unique in the synthetic data —
          // order by every output column for a total, engine-independent order.
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("revenue"), col("rf"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |       l_extendedprice * (1.0 - l_discount) AS revenue,
             |       upper(l_returnflag) AS rf
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, rf""".stripMargin),
    ),

    QueryDef(
      "q_not_in_null",
      // The NOT IN + NULL trap: a NULL in the subquery set makes
      // `x NOT IN (...)` unknown for every non-member x, so the with_null
      // leg returns 0 — standard three-valued logic, pinned on both
      // engines with the same SQL text.
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("customer")
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT 'with_null' AS leg, COUNT(*) AS n FROM customer
                 WHERE c_custkey NOT IN
                   (SELECT CASE WHEN o_custkey % 97 = 0 THEN NULL ELSE o_custkey END FROM orders)
                 UNION ALL
                 SELECT 'no_null' AS leg, COUNT(*) AS n FROM customer
                 WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
                 ORDER BY leg""")
      },
      Some("""SELECT 'with_null' AS leg, COUNT(*) AS n FROM customer
             |WHERE c_custkey NOT IN
             |  (SELECT CASE WHEN o_custkey % 97 = 0 THEN NULL ELSE o_custkey END FROM orders)
             |UNION ALL
             |SELECT 'no_null' AS leg, COUNT(*) AS n FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
             |ORDER BY leg""".stripMargin),
    ),

    QueryDef(
      "q_setop_all",
      // Multiset set operations: INTERSECT ALL / EXCEPT ALL preserve
      // duplicate multiplicity (min / difference of counts), unlike their
      // DISTINCT cousins; multiplicities surfaced via GROUP BY for a
      // stable comparison.
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey < 200),
                      b AS (SELECT l_suppkey AS k FROM lineitem
                            WHERE l_orderkey >= 100 AND l_orderkey < 300)
                 SELECT 'intersect_all' AS op, k, COUNT(*) AS n
                 FROM ((SELECT k FROM a) INTERSECT ALL (SELECT k FROM b)) GROUP BY k
                 UNION ALL
                 SELECT 'except_all' AS op, k, COUNT(*) AS n
                 FROM ((SELECT k FROM a) EXCEPT ALL (SELECT k FROM b)) GROUP BY k
                 ORDER BY op, k""")
      },
      Some("""WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey < 200),
             |     b AS (SELECT l_suppkey AS k FROM lineitem
             |           WHERE l_orderkey >= 100 AND l_orderkey < 300)
             |SELECT 'intersect_all' AS op, k, COUNT(*) AS n
             |FROM ((SELECT k FROM a) INTERSECT ALL (SELECT k FROM b)) GROUP BY k
             |UNION ALL
             |SELECT 'except_all' AS op, k, COUNT(*) AS n
             |FROM ((SELECT k FROM a) EXCEPT ALL (SELECT k FROM b)) GROUP BY k
             |ORDER BY op, k""".stripMargin),
    ),

    QueryDef(
      "q_null_semantics",
      // NULL behavior — the classic cross-engine divergence zone: NULL as
      // its own GROUP BY key, COUNT(*) vs COUNT(col), null-skipping AVG
      // (exact DECIMAL accumulation so the value is partition-order-free),
      // null-safe equality, and explicit NULLS FIRST ordering (Spark
      // defaults NULLS FIRST, DuckDB NULLS LAST — never leave it implicit).
      (s, dir) => {
        t(s, dir, "lineitem")
          .select(
            nullif(col("l_returnflag"), lit("N")).as("rf"),
            when(col("l_quantity") > 25, lit(null)).otherwise(col("l_quantity")).as("q"))
          .groupBy(col("rf"))
          .agg(
            count(lit(1)).as("n_all"),
            count(col("q")).as("n_q"),
            (sum(col("q").cast("decimal(18,4)")) /
              greatest(count(col("q")), lit(1L))).cast("double").as("avg_q"),
            count(when(col("rf") <=> lit(null), 1)).as("n_nullsafe_eq"))
          .orderBy(col("rf").asc_nulls_first)
      },
      Some("""SELECT NULLIF(l_returnflag, 'N') AS rf,
             |  COUNT(*) AS n_all,
             |  COUNT(q) AS n_q,
             |  CAST(sum(CAST(q AS DECIMAL(18,4))) / greatest(COUNT(q), 1) AS DOUBLE) AS avg_q,
             |  COUNT(CASE WHEN NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM NULL
             |             THEN 1 END) AS n_nullsafe_eq
             |FROM (SELECT l_returnflag,
             |        CASE WHEN l_quantity > 25 THEN NULL ELSE l_quantity END AS q
             |      FROM lineitem)
             |GROUP BY 1 ORDER BY rf ASC NULLS FIRST""".stripMargin),
    ),

    QueryDef(
      "q_filter",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_quantity").between(10, 20)
            && col("l_returnflag").isin("A", "R")
            && col("l_discount") > 0.05)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount
             |FROM lineitem
             |WHERE l_quantity BETWEEN 10 AND 20
             |  AND l_returnflag IN ('A', 'R') AND l_discount > 0.05
             |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin),
    ),

    QueryDef(
      "q_filter_like",
      (s, dir) => {
        t(s, dir, "part")
          .filter(col("p_name").like("%bolt%") || (col("p_name").like("red%") && col("p_type") === "ECONOMY"))
          .select(col("p_partkey"), col("p_name"), col("p_type"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, p_name, p_type FROM part
             |WHERE p_name LIKE '%bolt%' OR (p_name LIKE 'red%' AND p_type = 'ECONOMY')
             |ORDER BY p_partkey""".stripMargin),
    ),

    QueryDef(
      "q_distinct",
      (s, dir) => {
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"))
          .distinct()
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    ),

    QueryDef(
      "q_sort_limit",
      // Catalyst plans this as TakeOrderedAndProject (top-k, no full sort).
      (s, dir) => {
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),
    ),

    QueryDef(
      "q_case_cast",
      (s, dir) => {
        t(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            when(col("l_quantity") < 10, "low")
              .when(col("l_quantity") < 30, "mid")
              .otherwise("high").as("bucket"),
            col("l_quantity").cast("int").as("qty_int"),
            col("l_orderkey").cast("string").as("okey_str"),
            coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("rf_or_none"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("qty_int"), col("bucket"), col("rf_or_none"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |       CASE WHEN l_quantity < 10 THEN 'low'
             |            WHEN l_quantity < 30 THEN 'mid'
             |            ELSE 'high' END AS bucket,
             |       CAST(l_quantity AS INT) AS qty_int,
             |       CAST(l_orderkey AS VARCHAR) AS okey_str,
             |       COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS rf_or_none
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, qty_int, bucket, rf_or_none""".stripMargin),
    ),

    QueryDef(
      "q_union_all",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .filter(col("c_nationkey") === 1)
          .select(lit("customer").as("src"), col("c_custkey").as("id"))
        val sup = t(s, dir, "supplier")
          .filter(col("s_nationkey") === 1)
          .select(lit("supplier").as("src"), col("s_suppkey").as("id"))
        c.unionAll(sup).orderBy(col("src"), col("id"))
      },
      Some("""SELECT 'customer' AS src, c_custkey AS id FROM customer WHERE c_nationkey = 1
             |UNION ALL
             |SELECT 'supplier' AS src, s_suppkey AS id FROM supplier WHERE s_nationkey = 1
             |ORDER BY src, id""".stripMargin),
    ),

    QueryDef(
      "q_decimal_arith",
      // Exact DECIMAL arithmetic surface: cast, multiply, sum — fixed-point
      // money math with no float drift (SURVEY §1.3 decimals row).
      (s, dir) => {
        val price = col("o_totalprice").cast(DecimalType(18, 2))
        t(s, dir, "orders")
          .filter(col("o_custkey") < 500)
          .groupBy(col("o_orderstatus"))
          .agg(
            // arithmetic stays fixed-point; the wire type is DOUBLE because
            // DECIMAL surfaces differently in the two engines' pandas bridges
            sum(price).cast("double").as("total"),
            max((price * lit(2)).cast(DecimalType(18, 2))).cast("double").as("max_doubled"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  CAST(CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2)) * 2) AS DECIMAL(18,2)) AS DOUBLE) AS max_doubled,
             |  COUNT(*) AS n
             |FROM orders WHERE o_custkey < 500
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
    ),

    QueryDef(
      "q_union_distinct",
      // UNION (dedup) semantics — vs q_union_all's bag semantics.
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        c.union(sup).distinct().orderBy(col("nationkey"))
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |UNION
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin),
    ),

    QueryDef(
      "q_intersect",
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        c.intersect(sup).orderBy(col("nationkey"))
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin),
    ),

    QueryDef(
      "q_union_evolve",
      // Schema-evolving union (UNION ALL BY NAME): the new slice carries a
      // column the old slice lacks; rows from the old slice read it as
      // NULL — the same chosen semantics as the ODF input schema-evolution
      // path (Inputs.scala footer-merge), here on the SQL surface.
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val old = orders.filter(year(col("o_orderdate")) < 1995)
          .select(col("o_orderkey"), col("o_totalprice"))
        val nw = orders.filter(year(col("o_orderdate")) >= 1995)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        old.unionByName(nw, allowMissingColumns = true)
          .agg(
            count(lit(1)).as("n"),
            count(col("o_orderpriority")).as("n_with_priority"),
            sum(col("o_totalprice").cast(DecimalType(18, 4))).cast("double").as("total"))
      },
      Some("""WITH u AS (
             |  SELECT o_orderkey, o_totalprice FROM orders WHERE year(CAST(o_orderdate AS DATE)) < 1995
             |  UNION ALL BY NAME
             |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE year(CAST(o_orderdate AS DATE)) >= 1995)
             |SELECT COUNT(*) AS n, COUNT(o_orderpriority) AS n_with_priority,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
             |FROM u""".stripMargin),
    ),

    QueryDef(
      "q_except",
      (s, dir) => {
        val n = t(s, dir, "nation").select(col("n_nationkey").as("nationkey"))
        val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        n.except(sup).orderBy(col("nationkey"))
      },
      Some("""SELECT n_nationkey AS nationkey FROM nation
             |EXCEPT
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin),
    ),
  )
}
