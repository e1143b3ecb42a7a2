package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.SkewOps
import graft.sources.Tables

/** Skew-mitigation patterns under the oracle gate: salting reshapes the
  * shuffle but must NOT change results, so both queries hash-match plain
  * unsalted DuckDB SQL — which is exactly the property worth checking.
  */
object SkewQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_salted_agg",
      // Hot-key aggregation spread over 8 salt buckets, then combined.
      (s, dir) => {
        SkewOps.saltedAggregate(
          t(s, dir, "lineitem"),
          keys = Seq(col("l_returnflag")),
          buckets = 8,
          partial = Seq(
            "sum_qty" -> sum(col("l_quantity").cast(DecimalType(18, 4))),
            "n" -> count(lit(1))),
          finalAgg = Seq(c => sum(c).cast("double"), c => sum(c)))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    ),

    QueryDef(
      "q_salted_join",
      // Salted orders⋈customer join aggregated per segment — identical to
      // the plain join's results.
      (s, dir) => {
        SkewOps.saltedJoin(
          t(s, dir, "orders"), t(s, dir, "customer"),
          col("o_custkey"), col("c_custkey"), buckets = 8)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
    ),
  )
}
