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
  *
  * On the reference's `file_sort_order` TODO (engine.rs:238-239): Spark's
  * path-based parquet reader has no sort-order declaration API, and the
  * engine path never needs one — scan order IS ledger order, offset
  * numbering is arithmetic over it, and no transform-path plan contains a
  * Sort (EngineSpec pins this). The ledger's monotone offsets pay off
  * through A3's pushed filter (tight row-group min/max); a user query that
  * explicitly orders by offset plans a real Sort, elidable in Spark only
  * via a catalog-level bucketed+sorted table ([[graft.sources.Bucketing]]).
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

    val df = input.offsetInterval match {
      case Some(iv) =>
        // Schema evolution across slices is a CHOSEN behavior, not an
        // accident of file listing order (the reference left it open —
        // `TODO: Schema evolution`, engine.rs:235): mergeSchema unions the
        // footers, so a column added in a later slice exists everywhere and
        // reads as NULL from older slices. Cost is one footer per file
        // (a parallel metadata job), not data.
        // quoted(): a vocabulary offset name containing dots/backticks must
        // resolve verbatim, not as a struct-field path (contract fuzz find)
        spark.read.option("mergeSchema", "true").parquet(input.dataPaths: _*)
          .filter(col(Normalize.quoted(input.vocab.offsetColumn))
            .between(lit(iv.start), lit(iv.end)))
      case None =>
        // A2: empty input — schema file gives the shape, filter(false) the
        // emptiness; Catalyst's PruneFilters folds this to an empty relation
        // so downstream queries short-circuit (engine.rs:213-221, :263-265).
        spark.read.parquet(input.schemaFile).filter(lit(false))
    }
    narrowUnsignedOp(spark, df, input)
  }

  /** The `UInt32 → Int32` leg of the reference's op-column widening
    * (engine.rs:351-362): Spark surfaces parquet UINT32 as LongType, so the
    * unsignedness is only visible in the parquet footer. If the footer says
    * the op column is a 32-bit UNSIGNED int, narrow it to Int32 here (ANSI
    * cast = loud range check for values above Int32.Max); a LongType op from
    * any other origin stays Long and is rejected by Validate, matching the
    * reference's wrong-type error (engine.rs:394-413). UINT8/UINT16 need no
    * handling: Spark already reads them as Short/Integer, which result-side
    * normalization widens. */
  private def narrowUnsignedOp(
      spark: SparkSession, df: DataFrame, input: TransformRequestInput): DataFrame = {
    import Normalize.quoted
    val opName = input.vocab.operationTypeColumn
    val isLongOp = df.schema.fields.exists(f =>
      f.name == opName && f.dataType == org.apache.spark.sql.types.LongType)
    // With mergeSchema the op column may be absent (or signed) in earlier
    // slices and UINT32 only in a later one, so consult footers across ALL
    // paths and trust the first footer that actually declares the column —
    // not just dataPaths.head.
    val files = if (input.dataPaths.nonEmpty) input.dataPaths else Seq(input.schemaFile)
    if (isLongOp &&
      files.iterator.flatMap(f => opColumnUnsigned32(spark, f, opName)).nextOption().contains(true))
      df.withColumn(opName, col(quoted(opName)).cast(org.apache.spark.sql.types.IntegerType))
    else df
  }

  /** Reads one parquet footer: Some(isUnsigned32) if it declares `opName`,
    * None if the column is absent from this file. Footer-only read (no row
    * groups) — the same metadata Spark itself fetches for schema inference. */
  private def opColumnUnsigned32(
      spark: SparkSession, path: String, opName: String): Option[Boolean] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation.IntLogicalTypeAnnotation
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), spark.sessionState.newHadoopConf())
    val reader = ParquetFileReader.open(in)
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      if (!schema.containsField(opName)) None
      else Some {
        val t = schema.getType(schema.getFieldIndex(opName))
        t.isPrimitive && (t.asPrimitiveType().getLogicalTypeAnnotation match {
          case i: IntLogicalTypeAnnotation => !i.isSigned && i.getBitWidth == 32
          case _ => false
        })
      }
    } finally reader.close()
  }

  /** A4: expose the slice as a bare table reference for the SQL steps.
    * The alias is backtick-quoted before registration: `createOrReplaceTempView`
    * parses its argument as an identifier, so an alias that is a SQL keyword
    * or contains non-identifier characters (unicode, dots) would otherwise be
    * rejected — DataFusion's `register_table` (engine.rs:266-270) accepts any
    * alias string, and the ODF contract puts no lexical bound on it
    * (contract fuzz find). */
  def register(spark: SparkSession, input: TransformRequestInput): Unit =
    inputDataFrame(spark, input)
      .createOrReplaceTempView(Normalize.quoted(input.queryAlias))
}
