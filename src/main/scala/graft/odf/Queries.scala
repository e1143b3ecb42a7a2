package graft.odf

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}

/** A5-A6: multi-step SQL views and invalid-query detection
  * (/root/reference/src/engine.rs:276-308).
  *
  * Each [[SqlQueryStep]] becomes a named temp view; the unaliased step is the
  * output view `__output__`; later steps reference earlier aliases. Spark
  * inlines temp views into the final plan exactly as DataFusion inlines its
  * views, so the engine's offset filter and the user's SQL fuse into one
  * Catalyst plan — predicate pushdown and column pruning reach the parquet
  * scan (SURVEY.md §4.1).
  *
  * `spark.sql` parses AND analyzes eagerly, matching the reference's
  * `create_logical_plan` error surface (engine.rs:287-296): unknown columns,
  * bad types, syntax errors all surface here as [[InvalidQuery]].
  */
object Queries {

  val OutputViewName = "__output__"

  /** Register one step's view; analysis errors → InvalidQuery.
    *
    * The step's SQL first passes through [[JsonOperatorRewrite]] so
    * DataFusion-dialect `->` / `->>` JSON operators (registered by the
    * reference via `datafusion-functions-json`, engine.rs:51) parse here
    * too — Spark's parser has no operator extension point, so the rewrite
    * happens in text space before `spark.sql`.
    */
  def registerViewForStep(
      spark: SparkSession,
      step: SqlQueryStep,
  ): Either[InvalidQuery, Unit] =
    try {
      val df = spark.sql(JsonOperatorRewrite(step.query)) // eager parse + analysis
      // quoted(): step aliases come from the request and may be keywords or
      // contain non-identifier characters — same contract as input aliases
      df.createOrReplaceTempView(Normalize.quoted(step.alias.getOrElse(OutputViewName)))
      Right(())
    } catch {
      // ParseException extends AnalysisException, so this covers syntax
      // errors too — matching the reference's create_logical_plan surface
      case e: AnalysisException => Left(InvalidQuery(e.getMessage))
    }

  /** Register all steps in order, then return the output view's DataFrame. */
  def buildOutput(
      spark: SparkSession,
      steps: Seq[SqlQueryStep],
  ): Either[InvalidQuery, DataFrame] = {
    val failed = steps.iterator
      .map(registerViewForStep(spark, _))
      .collectFirst { case Left(e) => e }
    failed match {
      case Some(e) => Left(e)
      case None =>
        try Right(spark.table(OutputViewName))
        catch {
          case e: AnalysisException => Left(InvalidQuery(e.getMessage))
        }
    }
  }
}
