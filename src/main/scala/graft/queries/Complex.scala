package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.sources.Tables

/** Complex-type and reshaping surface: arrays, structs, maps, explode/unnest,
  * pivot (SURVEY.md §2.B row "Array / struct / map functions").
  */
object Complex {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_array_funcs",
      (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            size(toks).as("n_tokens"),
            element_at(toks, 1).as("first_tok"),
            element_at(toks, -1).as("last_tok"),
            array_contains(toks, "data").as("has_data"),
            size(array_distinct(toks)).as("n_distinct"),
            array_join(slice(sort_array(array_distinct(toks)), 1, 3), ",").as("top3_sorted"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CAST(len(toks) AS INT) AS n_tokens,
             |  toks[1] AS first_tok,
             |  toks[-1] AS last_tok,
             |  list_contains(toks, 'data') AS has_data,
             |  CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
             |  array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS top3_sorted
             |FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
             |      FROM documents) ORDER BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_explode",
      // explode/unnest: one row per token, with position.
      (s, dir) => {
        t(s, dir, "documents")
          .filter(col("doc_id") < 50)
          .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
          .orderBy(col("doc_id"), col("pos"))
      },
      Some("""SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[CAST(i AS INT)] AS tok
             |FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
             |      FROM documents WHERE doc_id < 50),
             |  UNNEST(range(1, len(toks) + 1)) AS t(i)
             |ORDER BY doc_id, pos""".stripMargin),
    ),

    QueryDef(
      "q_struct_map",
      // struct construction + field access + map literal lookup.
      (s, dir) => {
        t(s, dir, "nation")
          .select(
            col("n_nationkey"),
            struct(col("n_name").as("name"), col("n_regionkey").as("rk")).as("info"))
          .select(
            col("n_nationkey"),
            col("info.name").as("name"),
            col("info.rk").as("rk"),
            element_at(
              map(lit(0), lit("africa"), lit(1), lit("america"), lit(2), lit("asia"),
                lit(3), lit("europe"), lit(4), lit("mideast")),
              col("info.rk")).as("region_tag"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey, n_name AS name, n_regionkey AS rk,
             |  MAP([0,1,2,3,4], ['africa','america','asia','europe','mideast'])[n_regionkey][1] AS region_tag
             |FROM nation ORDER BY n_nationkey""".stripMargin),
    ),

    QueryDef(
      "q_pivot",
      // Pivot: order-status counts per market segment, statuses as columns.
      (s, dir) => {
        t(s, dir, "orders").join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment,
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
    ),

    QueryDef(
      "q_recursive_cte",
      // Recursive CTE (Spark 4 WITH RECURSIVE): a 90-day date spine LEFT
      // JOINed to orders — the gap-filling calendar pattern; zero-order
      // days survive with n_orders = 0.
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""WITH RECURSIVE spine(d) AS (
                  SELECT 0 UNION ALL SELECT d + 1 FROM spine WHERE d < 89)
                SELECT d, count(o_orderkey) AS n_orders
                FROM spine LEFT JOIN orders
                  ON CAST(o_orderdate AS DATE) = date_add(DATE '1995-01-01', d)
                GROUP BY d ORDER BY d""")
      },
      Some("""WITH RECURSIVE spine(d) AS (
             |  SELECT 0 UNION ALL SELECT d + 1 FROM spine WHERE d < 89)
             |SELECT d, count(o_orderkey) AS n_orders
             |FROM spine LEFT JOIN orders
             |  ON CAST(o_orderdate AS DATE) = DATE '1995-01-01' + d
             |GROUP BY d ORDER BY d""".stripMargin),
    ),

    QueryDef(
      "q_lateral_join",
      // Correlated LATERAL subquery with per-row ORDER BY + LIMIT: first
      // two nations per region — the top-k-per-group SQL surface.
      (s, dir) => {
        t(s, dir, "region").createOrReplaceTempView("region")
        t(s, dir, "nation").createOrReplaceTempView("nation")
        s.sql("""SELECT r.r_name, t.n_name
                FROM region r,
                LATERAL (SELECT n_name FROM nation
                         WHERE n_regionkey = r.r_regionkey
                         ORDER BY n_name LIMIT 2) t
                ORDER BY r_name, n_name""")
      },
      Some("""SELECT r.r_name, t.n_name
             |FROM region r,
             |LATERAL (SELECT n_name FROM nation
             |         WHERE n_regionkey = r.r_regionkey
             |         ORDER BY n_name LIMIT 2) t
             |ORDER BY r_name, n_name""".stripMargin),
    ),

    QueryDef(
      "q_distinct_on",
      // DISTINCT ON (latest order per customer). Spark-first shape is an
      // arg-max hash-aggregate — max over a (sort-key..., payload) struct
      // compares fields left-to-right, so one map-side-combined aggregate
      // replaces the window-sort-over-every-order formulation (which at
      // 100 TB sorts the full per-customer history to keep one row).
      (s, dir) => {
        t(s, dir, "orders")
          .filter(col("o_custkey") < 300)
          .groupBy(col("o_custkey"))
          .agg(max(struct(col("o_orderdate"), col("o_orderkey"),
            col("o_totalprice"))).as("m"))
          .select(
            col("o_custkey"),
            col("m.o_orderkey").as("o_orderkey"),
            col("m.o_orderdate").cast("date").cast("string").as("last_date"),
            col("m.o_totalprice").as("o_totalprice"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS last_date,
             |       o_totalprice
             |FROM (SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate, o_totalprice
             |      FROM orders WHERE o_custkey < 300
             |      ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC)
             |ORDER BY o_custkey""".stripMargin),
    ),

    QueryDef(
      "q_hof_lambda",
      // Higher-order array functions (transform / filter / aggregate
      // lambdas) over per-order quantity vectors. The arrays are small
      // (≤7 lineitems/order) so the interpreted-lambda cost stays per-row
      // negligible; the sort inside the row keeps the fold order — and
      // therefore the double sum — engine-independent.
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(array_sort(collect_list(col("l_quantity"))).as("qs"))
          .select(
            col("l_orderkey"),
            size(col("qs")).as("n_items"),
            aggregate(
              filter(transform(col("qs"), x => x * 2), x => x > lit(50.0)),
              lit(0.0), (acc, x) => acc + x).as("hot_sum"))
          .filter(col("n_items") >= 6)
          .orderBy(col("l_orderkey"))
      },
      Some("""SELECT l_orderkey,
             |  CAST(len(qs) AS INT) AS n_items,
             |  COALESCE(list_sum(list_filter(list_transform(qs, x -> x * 2),
             |                                x -> x > 50.0)), 0) AS hot_sum
             |FROM (SELECT l_orderkey, list_sort(list(l_quantity)) AS qs
             |      FROM lineitem GROUP BY l_orderkey)
             |WHERE len(qs) >= 6
             |ORDER BY l_orderkey""".stripMargin),
    ),
  )
}
