package graft.odf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A1-A4: input registration (/root/reference/src/engine.rs:186-271).
  *
  *   - A1 multi-file parquet scan (absolute paths, no extension filtering,
  *     schema inferred from footers),
  *   - A2 schema-file fallback for inputs with no new data (scan the schema
  *     file, drop all rows → empty but correctly-typed table),
  *   - A3 offset-interval filter (`offset BETWEEN start AND end` — Catalyst
  *     pushes it to the parquet scan, so row-group min/max stats prune, the
  *     same effect as DataFusion's `parquet_pruning`),
  *   - A4 temp-view registration under the query alias.
  */
object Inputs {

  /** Build the (lazy) DataFrame for one input slice. */
  def inputDataFrame(spark: SparkSession, input: TransformRequestInput): DataFrame = {
    // Invariant from the reference (engine.rs:193-196).
    require(
      (input.dataPaths.isEmpty && input.offsetInterval.isEmpty) ||
        (input.dataPaths.nonEmpty && input.offsetInterval.nonEmpty),
      s"input ${input.queryAlias}: dataPaths and offsetInterval must both be present or both absent",
    )

    input.offsetInterval match {
      case Some(iv) =>
        spark.read.parquet(input.dataPaths: _*)
          .filter(col(input.vocab.offsetColumn).between(lit(iv.start), lit(iv.end)))
      case None =>
        // A2: empty input — schema file gives the shape, filter(false) the
        // emptiness; Catalyst's PruneFilters folds this to an empty relation
        // so downstream queries short-circuit (engine.rs:213-221, :263-265).
        spark.read.parquet(input.schemaFile).filter(lit(false))
    }
  }

  /** A4: expose the slice as a bare table reference for the SQL steps. */
  def register(spark: SparkSession, input: TransformRequestInput): Unit =
    inputDataFrame(spark, input).createOrReplaceTempView(input.queryAlias)
}
