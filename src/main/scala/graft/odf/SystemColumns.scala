package graft.odf

import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** A10-A13: system-column injection (/root/reference/src/engine.rs:478-562).
  *
  *   - A10 offset assignment: dense, order-preserving numbering starting at
  *     `startOffset`, cast Int64 (Int64 not UInt64 — Spark parquet compat,
  *     engine.rs:514-516);
  *   - A11 default op injection: literal `Append (0)` as Int32 when the query
  *     didn't propagate an op column (engine.rs:521-533);
  *   - A12 system-time stamping: one constant ms-UTC timestamp for the whole
  *     batch (engine.rs:536-545) — a Catalyst literal, constant-folded;
  *   - A13 column reordering: `offset, op, system_time, event_time, data...`
  *     (engine.rs:485-493, :548-557).
  *
  * Scale note (SURVEY.md §7.4): the reference gets a deterministic row order
  * for free from `target_partitions = 1`. Offset numbering is inherently a
  * serial decision, but the work feeding it must not be:
  *
  *   - `prefixSum` (DEFAULT, scale path): per-partition row counts →
  *     driver-side prefix sums → offset computed map-side as
  *     `prefix(partition) + intra-partition index`, where the intra index is
  *     recovered from `monotonically_increasing_id()`'s documented layout
  *     (partition id in the upper bits, per-partition counter in the lower
  *     33). No shuffle, no RDD round-trip, stays columnar inside whole-stage
  *     codegen; scan/filter/SQL stages keep native parallelism. Honest cost
  *     accounting: any distributed dense numbering needs a counting pass, so
  *     the plan executes twice — but the counting pass only aggregates the
  *     partition id, so Catalyst prunes every payload column out of it (the
  *     scan skeleton + filters run; wide projections don't), while
  *     `zipWithIndex`'s equivalent count job drags full rows through an RDD
  *     conversion. The `collect()` of the per-partition counts runs eagerly
  *     at plan-construction time. This is the plan that survives a 100 TB
  *     input.
  *   - `zipWithIndex` (scale path, RDD formulation): same numbering via RDD
  *     `zipWithIndex` — also one extra count job, but forces a
  *     row-serialization round-trip out of Tungsten. Kept as a second,
  *     independently-derived implementation for property cross-checks.
  *   - `windowed`: `coalesce(1)` then `row_number()` over a
  *     single-partition window. NOTE `coalesce(1)` inserts no shuffle
  *     boundary, so it drags the ENTIRE upstream stage — scan, filters, the
  *     user's map-side SQL — into one task, exactly like the reference's
  *     `target_partitions = 1`. That makes it the WRONG strategy ahead of a
  *     parallel multi-file sink, but the RIGHT one ahead of the A14
  *     single-file sink (r20): the sink's own `coalesce(1)` forces the
  *     identical single-task execution in the write pass regardless of
  *     strategy, so windowed numbering costs nothing extra there while
  *     skipping the counting pass's full second evaluation of the plan —
  *     see Engine's default.
  *
  * Both parallel strategies assume partition contents are identical between
  * the count job and the numbering job — true for deterministic plans (file
  * scans + narrow ops, which is the ODF transform shape).
  */
object SystemColumns {

  sealed trait OffsetStrategy
  case object WindowedOffsets extends OffsetStrategy
  case object ZipWithIndexOffsets extends OffsetStrategy
  case object PrefixSumOffsets extends OffsetStrategy

  def withSystemColumns(
      df: DataFrame,
      vocab: DatasetVocabulary,
      systemTime: Instant,
      startOffset: Long,
      strategy: OffsetStrategy = PrefixSumOffsets,
  ): DataFrame = {
    import Normalize.quoted

    // Data columns captured before injection; event_time and op are hoisted
    // into the fixed prefix (engine.rs:485-493).
    val dataColumns = df.schema.fieldNames.toSeq
      .filterNot(n => n == vocab.eventTimeColumn || n == vocab.operationTypeColumn)

    val withOffset = strategy match {
      case WindowedOffsets =>
        val w = Window.partitionBy(lit(1)).orderBy(monotonically_increasing_id())
        df.coalesce(1).withColumn(
          vocab.offsetColumn,
          row_number().over(w).cast(LongType) + lit(startOffset - 1L))
      case ZipWithIndexOffsets =>
        zipWithIndexOffsets(df, vocab.offsetColumn, startOffset)
      case PrefixSumOffsets =>
        prefixSumOffsets(df, vocab.offsetColumn, startOffset)
    }

    val withOp =
      if (withOffset.schema.fieldNames.contains(vocab.operationTypeColumn)) withOffset
      else withOffset.withColumn(vocab.operationTypeColumn, lit(OperationType.Append))

    val withSystemTime = withOp.withColumn(
      vocab.systemTimeColumn,
      lit(java.sql.Timestamp.from(systemTime)))

    val ordered = Seq(
      vocab.offsetColumn,
      vocab.operationTypeColumn,
      vocab.systemTimeColumn,
      vocab.eventTimeColumn,
    ) ++ dataColumns

    withSystemTime.select(ordered.map(n => col(quoted(n))): _*)
  }

  /** Distributed, order-stable, codegen-preserving offset assignment:
    * count rows per partition (tiny job), prefix-sum on the driver, then
    * compute `offset = prefix(pid) + intraPartitionIndex + startOffset`
    * entirely map-side. The intra-partition index comes from
    * `monotonically_increasing_id() - (spark_partition_id() << 33)` — the
    * id's documented layout. The prefix array rides along as an array
    * literal indexed by partition id (O(1) `GetArrayItem`). */
  private def prefixSumOffsets(df: DataFrame, offsetColumn: String, startOffset: Long): DataFrame = {
    import Normalize.quoted
    val pid = "__graft_pid"
    val mid = "__graft_mid"
    val withIds = df
      .withColumn(pid, spark_partition_id())
      .withColumn(mid, monotonically_increasing_id())
    val counts: Map[Int, Long] = withIds
      .groupBy(col(pid)).count()
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val nParts = if (counts.isEmpty) 1 else counts.keys.max + 1
    val prefix = new Array[Long](nParts)
    var acc = 0L
    for (p <- 0 until nParts) {
      prefix(p) = acc
      acc += counts.getOrElse(p, 0L)
    }
    withIds
      .withColumn(
        offsetColumn,
        element_at(typedLit(prefix.toSeq), col(pid) + 1) +
          (col(mid) - shiftleft(col(pid).cast(LongType), 33)) +
          lit(startOffset))
      .drop(pid, mid)
      .select(df.schema.fieldNames.map(n => col(quoted(n))) :+ col(quoted(offsetColumn)): _*)
  }

  /** Distributed, order-stable offset assignment: `zipWithIndex` numbers rows
    * by (partition index, position within partition) without collapsing
    * parallelism. */
  private def zipWithIndexOffsets(df: DataFrame, offsetColumn: String, startOffset: Long): DataFrame = {
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(offsetColumn, LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (idx + startOffset))
    }
    spark.createDataFrame(rdd, schema)
  }
}
