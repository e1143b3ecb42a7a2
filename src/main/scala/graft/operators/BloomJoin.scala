package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NativeHashes

/** Bloom-filter semi-join reduction: shrink a join's big side BEFORE its
  * shuffle using a compact membership sketch of the small side's keys.
  *
  * Why it matters at 100 TB: a shuffle join materializes and moves every
  * big-side row, including the (often vast) majority that will never find a
  * partner. A bloom filter of the small side's keys is a few MB even for
  * tens of millions of keys (independent of the big side!), ships to every
  * task like a broadcast, and drops non-joining rows AT THE SCAN — before
  * the shuffle write, often before column-heavy projection. False positives
  * (rate `fpp`) are harmless: the real join still runs and removes them, so
  * the result is bit-identical to the plain join — which is exactly what the
  * q_bloom_join oracle checks. False negatives don't exist by construction.
  *
  * Spark's AQE can inject this itself for some plan shapes
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); this operator is the
  * explicit, always-available form, probing via the codegen'd
  * [[NativeHashes.BloomMightContainLong]] expression.
  */
object BloomJoin {

  /** Serialized bloom filter of `small`'s key column (cast to long).
    * Two jobs over the SMALL side only: a count to size the filter, then
    * the sketch aggregation (partial filters merged via OR). A key set
    * that is empty after the NULL drop yields an empty filter (every
    * probe misses) — `stat.bloomFilter` aggregated over zero rows returns
    * a null buffer it would NPE deserializing. */
  def keyBloom(small: DataFrame, keyCol: String, fpp: Double = 0.01): Array[Byte] = {
    val keys = small.select(col(keyCol).cast("long").as("k")).na.drop()
    val n = keys.count()
    val bf =
      if (n == 0L) org.apache.spark.util.sketch.BloomFilter.create(64L, fpp)
      else keys.stat.bloomFilter("k", math.max(n, 64L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Filter `big` to rows whose key might be in the bloom. Pure codegen'd
    * filter — no shuffle, pushes below wide projections. */
  def semiReduce(big: DataFrame, bigKey: Column, bloomBytes: Array[Byte]): DataFrame = {
    NativeHashes.register(big.sparkSession)
    big.filter(call_function("bloom_might_contain", bigKey.cast("long"), lit(bloomBytes)))
  }

  /** Anti-join (NOT EXISTS) with a bloom fast path — the incremental-dedup
    * shape: `big` is an incoming batch, `small` is the key set of an existing
    * corpus. Rows whose key the bloom *definitely hasn't seen* (no false
    * negatives by construction) skip the shuffle entirely; only the
    * maybe-seen minority pays the real anti-join, which then removes bloom
    * false positives. Result is bit-identical to a plain anti-join.
    *
    * A NULL probe key (a NULL in `bigKey`, or a non-numeric key the long
    * cast nulls out) makes the bloom probe NULL — such rows route to the
    * exact-join branch, where `condition`'s own NULL semantics decide
    * their fate exactly as in the plain anti-join. Filtering them with
    * `!probe` instead would silently drop them from BOTH branches.
    *
    * `big` is scanned twice (once per branch) — both scans are parallel
    * column-pruned parquet reads, which at 100 TB is far cheaper than
    * shuffling the ~all-new majority of the batch. */
  def bloomAntiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: Column,
      smallKey: Column,
      condition: Column,
      fpp: Double = 0.01): DataFrame = {
    val bytes = keyBloom(small.select(smallKey.cast("long").as("k")), "k", fpp)
    NativeHashes.register(big.sparkSession)
    val probe = coalesce(
      call_function("bloom_might_contain", bigKey.cast("long"), lit(bytes)),
      lit(true))
    val definitelyNew = big.filter(!probe)
    val survivors = big.filter(probe).join(small, condition, "left_anti")
    definitelyNew.unionByName(survivors)
  }

  /** The full pattern: sketch the small side, pre-filter the big side, then
    * run the real equi-join (which eliminates bloom false positives). */
  def bloomReducedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      fpp: Double = 0.01): DataFrame = {
    val reduced = semiReduce(big, col(bigKey), keyBloom(small, smallKey, fpp))
    reduced.join(small, col(bigKey) === col(smallKey))
  }
}
