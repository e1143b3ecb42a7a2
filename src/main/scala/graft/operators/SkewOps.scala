package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators: salted aggregation and salted broadcast-free
  * joins — the manual patterns for when AQE's runtime skew handling isn't
  * enough (a single hot key larger than one executor's memory).
  *
  * Salting never changes results, only the shuffle layout:
  *   - salted aggregation runs two partial rounds, so one hot key spreads
  *     over `buckets` reducers before the final combine;
  *   - salted join replicates the small side `buckets` times so each salted
  *     shard of the hot key finds its match locally.
  */
object SkewOps {

  /** Two-phase aggregation: groupBy (key, salt) partially, then by key.
    * `aggs` must be algebraic (sum/count/min/max — mergeable partials). */
  def saltedAggregate(
      df: DataFrame, keys: Seq[Column], buckets: Int,
      partial: Seq[(String, Column)], finalAgg: Seq[Column => Column]): DataFrame = {
    // named validation (r17, the lshBuckets idiom): pmod(·, 0) is NULL,
    // which would silently collapse the salting into one NULL bucket
    require(buckets >= 1, s"saltedAggregate needs buckets >= 1, got $buckets")
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val stage1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    stage1
      .groupBy(keys: _*)
      .agg(
        finalAgg.head(col(partial.head._1)).as(partial.head._1),
        partial.tail.zip(finalAgg.tail).map { case ((n, _), f) => f(col(n)).as(n) }: _*)
  }

  /** Salted equi-join for a skewed left side: left rows get a random salt in
    * [0, buckets), the right side is replicated once per salt value, and the
    * join key becomes (key, salt). Row-level results are identical to the
    * plain join; the hot key's rows land on `buckets` different reducers. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, leftKey: Column, rightKey: Column,
      buckets: Int): DataFrame = {
    // named validation (r17): buckets = 0 gives NULL left salts vs a
    // [0, -1] right sequence — a silently EMPTY join, the worst failure
    require(buckets >= 1, s"saltedJoin needs buckets >= 1, got $buckets")
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight,
        leftKey === rightKey && saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }
}
