package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2 + LLM-pipeline ops);
  * `oracleSql` carries the DuckDB-equivalent SQL for each hash-checkable
  * query. Column names are aliased identically on both sides.
  */
object SparkEntry {

  private val all: Seq[QueryDef] =
    Relational.defs ++ Aggregates.defs ++ Joins.defs ++ Windows.defs ++
      Functions.defs ++ TextAnalysis.defs ++ DedupQueries.defs ++
      SimilarityQueries.defs ++ MultimodalQueries.defs ++ Complex.defs ++
      OdfQueries.defs ++ SkewQueries.defs ++ PipelineQueries.defs ++
      CurationQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.name == "q1_agg").get.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
