package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators for event streams.
  *
  * The reference engine has no as-of support (it parses and ignores the
  * request's `temporal_tables` field — engine.rs:139); these are part of
  * the beyond-parity operator set for event/training-data pipelines.
  *
  * Scale design: the naive formulation is an inequality join
  * (`l.k = r.k AND r.t <= l.t` + keep latest), which Spark plans as a
  * per-key cross product — quadratic in events-per-key. The union-tag
  * implementation here is the scalable shape: tag both sides, union, ONE
  * shuffle on the key, and a single ordered window scan per key carries
  * the latest right-side payload forward. Cost is sort-based, linear in
  * rows, and skew behaves like any window (one hot key = one fat
  * partition task, no pair explosion).
  */
object TemporalJoins {

  /** Backward (most common) as-of join: for every left row, attach the
    * right row with the largest `rightTime <= leftTime` for the same key;
    * left rows with no prior right row keep NULLs (left-outer semantics,
    * matching DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`).
    *
    * Right rows must be unique per (key, rightTime) — pre-aggregate
    * duplicates first, otherwise "the" match at a tied timestamp is
    * undefined in any engine. Timestamps are assumed non-null (null-time
    * rows have no defined as-of position in any engine).
    *
    * Skew: the running-`last` window is NOT partitioned by the key alone —
    * that shape would hand a degenerate hot key's entire history to one
    * task's sort. Instead each row gets a coarse time segment (the union's
    * [min, max] time span split into `targetSegments` equal bins — one
    * cheap min/max job decides the bins), the window runs per
    * (key, segment), and a second pass over the tiny per-(key, segment)
    * frame (≤ targetSegments + 1 rows per key) carries the latest right
    * row across segment boundaries: any right row in an earlier segment is
    * `<=` every left time in a later one, so
    * `coalesce(withinSegmentLast, carriedBoundaryLast)` is exactly the
    * single-level answer. A hot key's per-task cost drops from O(its full
    * history) to O(history / targetSegments); only a key whose rows all
    * share ONE timestamp still serializes (and such ties have no
    * meaningful as-of order to exploit anyway).
    *
    * Returns left columns followed by `rightTime` and the right payload
    * columns (caller guarantees no name clashes).
    *
    * `smallInputRows` gates the segmentation: below it the plain per-key
    * window runs instead — on a small input the segment grid buys nothing
    * (even a fully-skewed key sorts in one task in well under a second at
    * 2M rows) while its carry pass costs three extra jobs (measured 3× on
    * the 100k-row sf0.1 bench). The row count rides the same single
    * aggregation job that already computes the time bounds, so the gate
    * itself is free. Pass 0 to force segmentation (volume rehearsals). */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      targetSegments: Int = 128,
      smallInputRows: Long = 2000000L): DataFrame = {
    val rPayload = right.columns.filterNot(c => c == key || c == rightTime).toSeq
    val lStruct = struct(left.columns.toSeq.map(col): _*)
    val rStruct = struct((rightTime +: rPayload).map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    // side 0 (right) sorts before side 1 (left) at equal timestamps, making
    // the match inclusive: rightTime == leftTime counts.
    val lTagged = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val rTagged = right.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r"))
    val unioned = lTagged.unionByName(rTagged)

    def project(matched: DataFrame): DataFrame = matched
      .filter(col("__side") === 1)
      .select(
        left.columns.toSeq.map(c => col(s"__l.`$c`").as(c)) ++
          (rightTime +: rPayload).map(f => col(s"__match.`$f`").as(f)): _*)

    // the single-level plan, shared by the three non-segmented routes
    def singleLevel: DataFrame = {
      val w = Window.partitionBy(col("__k"))
        .orderBy(col("__t"), col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      project(unioned.withColumn(
        "__match", last(col("__r"), ignoreNulls = true).over(w)))
    }

    // segmentation explicitly off: skip the bounds/count aggregation too —
    // its results would be ignored, and on a huge ledger that aggregate is
    // a full extra input scan for nothing (r15; AsofVolume's
    // targetSegments = 1 baseline leg hit exactly this)
    if (targetSegments <= 1) return singleLevel

    // Free small-input shortcut: Catalyst's size estimate (file bytes for
    // parquet scans, propagated through the union) routes clearly-small
    // inputs to the single-level window without running ANY extra job —
    // the bounds aggregation below re-executes the whole input (including
    // any shuffle feeding it) just to pick a grid the small path never
    // uses. 32 B/row is deliberately tight for compressed columnar data:
    // an under-estimate merely sends a somewhat-larger-than-threshold
    // input down the single-level path, which stays correct (one task
    // sorts a few million rows at worst); an over-estimate only costs the
    // exact count below. smallInputRows = 0 disables both gates.
    val statsBytes = unioned.queryExecution.optimizedPlan.stats.sizeInBytes
    if (statsBytes < BigInt(smallInputRows) * 32) return singleLevel

    // One cheap min/max job picks the segment grid. `cast(double)` is
    // monotone for every orderable time type we accept (numerics,
    // date/timestamp → epoch seconds), and the double is used ONLY for
    // binning — ordering inside a bin stays on the original column.
    val bounds = unioned
      .agg(min(col("__t").cast("double")), max(col("__t").cast("double")),
        count(lit(1))).head()
    val span = if (bounds.isNullAt(0)) 0.0 else bounds.getDouble(1) - bounds.getDouble(0)
    val totalRows = bounds.getLong(2)

    if (span <= 0.0 || totalRows < smallInputRows) {
      // Empty input, a single distinct timestamp, or a small input:
      // segmentation cannot spread anything worth three extra jobs — run
      // the plain per-key window.
      singleLevel
    } else {
      val t0 = bounds.getDouble(0)
      val width = span / targetSegments
      // max(t) lands exactly on bin `targetSegments`; `least` also caps any
      // floating-point rounding above it. Monotone in __t, ties stay together.
      val segExpr = least(
        floor((col("__t").cast("double") - lit(t0)) / lit(width)),
        lit(targetSegments.toLong)).cast("long")
      val tagged = unioned.withColumn("__seg", segExpr)

      val wSeg = Window.partitionBy(col("__k"), col("__seg"))
        .orderBy(col("__t"), col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = tagged.withColumn(
        "__local", last(col("__r"), ignoreNulls = true).over(wSeg))

      // Boundary carry: latest right row of each (key, segment), rolled
      // forward per key across the segment axis. Both frames are
      // O(#keys × #segments) — the window below sorts ≤ targetSegments + 1
      // rows per key regardless of how hot the key is.
      val segLast = tagged.filter(col("__side") === 0)
        .groupBy(col("__k"), col("__seg"))
        .agg(max_by(col("__r"), col("__t")).as("__segLast"))
      val wCarry = Window.partitionBy(col("__k")).orderBy(col("__seg"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = tagged.select(col("__k"), col("__seg")).distinct()
        .join(segLast, Seq("__k", "__seg"), "left")
        .withColumn("__carry", last(col("__segLast"), ignoreNulls = true).over(wCarry))
        .select(col("__k"), col("__seg"), col("__carry"))

      // Equi-join on (__k, __seg): the big side already carries exactly that
      // hash partitioning (and a (__k, __seg, …) sort) out of `wSeg`, so the
      // join adds no shuffle or sort on the data; the carry side is tiny.
      project(local.join(carry, Seq("__k", "__seg"), "left")
        .withColumn("__match", coalesce(col("__local"), col("__carry"))))
    }
  }

  /** Interval (range-overlap) join: pairs (l, r) where
    * `[l.start, l.end] ∩ [r.start, r.end] ≠ ∅`, both sides keyed.
    *
    * Scalable shape: intervals are exploded onto a fixed-width bucket grid
    * (`binWidth` in the time column's units), candidate pairs come from an
    * equi-join on (key, bucket), and the exact overlap predicate filters —
    * the standard binning decomposition of a range join. A pair spanning
    * several shared buckets is kept only in its CANONICAL bin (the first
    * bin both intervals share, = the max of the two start bins) — a pure
    * filter, so join multiplicity is preserved exactly (duplicate input
    * rows yield duplicate output rows, like a real join) and no dedup
    * shuffle is needed.
    *
    * Caller guarantees no column-name clashes between the two sides
    * beyond `key` (the [[asofBackward]] convention — rename payload
    * columns first, as q_range_join does); `binWidth` must be positive
    * (zero would NULL every bin under non-ANSI division and silently
    * return an EMPTY join instead of an error). */
  def rangeOverlapJoin(
      left: DataFrame, right: DataFrame, key: String,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"rangeOverlapJoin: binWidth must be positive, got $binWidth")
    def binOf(c: String) = (col(c).cast("long") / binWidth).cast("long")
    def binned(df: DataFrame, s: String, e: String) = df.withColumn(
      "__bin", explode(sequence(binOf(s), binOf(e))))
    val l = binned(left, lStart, lEnd)
    val r = binned(right, rStart, rEnd)
    l.join(r, Seq(key, "__bin"))
      .filter(col("__bin") === greatest(binOf(lStart), binOf(rStart)))
      .drop("__bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
  }
}
