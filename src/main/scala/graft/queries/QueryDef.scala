package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark-first (DataFrame API) build function
  * over the testdata tables plus, when SQL-expressible, a DuckDB oracle that
  * must produce value-identical results on the same parquet tables.
  *
  * Determinism rules applied across the inventory (the driver hash-compares
  * values after sorting columns by name):
  *   - every query ends in a total ORDER BY (unique key suffix) in both
  *     engines, so row order is identical;
  *   - SUM/AVG over doubles go through an exact DECIMAL accumulation and are
  *     cast back to DOUBLE, making the result independent of partial-
  *     aggregation order (Spark) vs single-threaded fold (DuckDB);
  *   - column aliases match the oracle exactly (driver compares by name).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)
