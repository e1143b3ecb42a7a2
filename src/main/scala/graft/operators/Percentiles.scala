package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort-based exact interpolated percentile (r20, guide §4 "expressions"
  * + §5 "memory"): value-identical to Spark's `percentile(v, p)` aggregate,
  * computed with a sort + row_number window instead of the aggregate's
  * per-group value map.
  *
  * Why: `percentile()` buffers a boxed OpenHashMap[AnyRef, Long] of every
  * DISTINCT value per group inside each partial aggregate, serializes the
  * maps between partial and final, and merges them single-threaded per
  * group — on a distinct-heavy double column (prices) that map is the size
  * of the group and the aggregate is the most expensive in the suite
  * (driver r19: q_percentile + q_approx_percentile = 4.27 s combined).
  * The sort formulation shuffles (group, value) PAIRS through a codegen'd
  * sort that spills gracefully, never holds a per-group map, and reads the
  * two interpolation endpoints by row number — the shape that survives a
  * 10M-distinct-values group where the value map OOMs (SCALE.md "Exact
  * percentile").
  *
  * When to use which (r20 A/B, tools/ab_pct_odf_r20.jsonl +
  * JobCountProbe): on DISTINCT-HEAVY columns this form wins decisively
  * (q_approx_percentile's exact median over l_extendedprice: aggregate
  * task time 11.5 s → 3.1 s for the whole query); on LOW-CARDINALITY
  * columns the aggregate's value map is tiny and beats a full-column
  * sort (q_percentile kept the aggregate: 4 jobs / 3.1 s task time vs
  * 6 jobs / 4.4 s for a fused two-column window variant).
  *
  * Exactness contract: reproduces Percentile.getPercentile bit for bit —
  *   position = (n − 1) · p  (Long→Double multiply),
  *   lower = floor(position), higher = ceil(position),
  *   result = v[lower]                        when lower == higher
  *          = v[lower]                        when v[lower] == v[higher]
  *          = (higher − position) · v[lower]
  *            + (position − lower) · v[higher] otherwise
  * including both shortcut branches (the interpolation formula applied to
  * equal endpoints can differ in the last ulp, so the shortcuts are part
  * of the contract, not an optimization). NULL values are excluded from n
  * and from the order, exactly as the aggregate ignores them. Ties in v
  * get arbitrary row numbers, but both endpoints of a tie carry the same
  * value, so the result is deterministic.
  */
object Percentiles {

  /** One exact percentile per group: returns `(groupAlias, outAlias)` with
    * one row per group that has ≥ 1 non-NULL value — the same group set
    * the `percentile` aggregate emits (all-NULL groups yield NULL there,
    * so callers joining this back should use a left join from the group
    * frame when such groups are possible). */
  def exactPercentile(
      df: DataFrame, grp: Column, value: Column, p: Double,
      groupAlias: String, outAlias: String): DataFrame = {
    val in = df.filter(value.isNotNull)
      .select(grp.as(groupAlias), value.cast("double").as("__v"))
    val counts = in.groupBy(col(groupAlias)).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(groupAlias)).orderBy(col("__v"))
    // __n joins back as a broadcast (one row per group); position and the
    // two endpoint row numbers are then per-row expressions of it
    val pos = (col("__n") - 1L).cast("double") * lit(p)
    val lower = floor(pos)
    val higher = ceil(pos)
    val rn = col("__rn").cast("long")
    in.withColumn("__rn", row_number().over(w))
      .join(broadcast(counts), Seq(groupAlias))
      .filter(rn === lower + 1L || rn === higher + 1L)
      .groupBy(col(groupAlias))
      .agg(
        min(when(rn === lower + 1L, col("__v"))).as("__vlo"),
        max(when(rn === higher + 1L, col("__v"))).as("__vhi"),
        first(pos).as("__pos"),
        first(lower).as("__lo"),
        first(higher).as("__hi"))
      .select(col(groupAlias), interp(outAlias))
  }

  /** Percentile.getPercentile's result expression over the aggregated
    * endpoint columns — both shortcut branches included (see the
    * exactness contract above). */
  private def interp(outAlias: String): Column =
    when(col("__lo") === col("__hi") || col("__vlo") === col("__vhi"), col("__vlo"))
      .otherwise(
        (col("__hi").cast("double") - col("__pos")) * col("__vlo") +
          (col("__pos") - col("__lo").cast("double")) * col("__vhi"))
      .as(outAlias)
}
