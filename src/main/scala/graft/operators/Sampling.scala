package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent sampling for training-data pipelines.
  *
  * `df.sample()` is seed × partitioning dependent — rerun the pipeline with
  * a different file split and the sample changes, which poisons train/eval
  * hygiene. Every operator here derives membership from a content hash of a
  * stable key, so the same row lands in the same sample on any engine, any
  * cluster size, any run — the same property as q_split_hash's
  * train/val/test assignment (and the same md5-bucket arithmetic).
  *
  * Scale shapes: fraction/stratified sampling are pure codegen'd filters —
  * no shuffle, no state, they ride the scan. Fixed-size sampling is a top-k
  * by hash (TakeOrderedAndProject: per-partition heaps + driver merge of k
  * rows — never a global sort).
  */
object Sampling {

  /** Uniform bucket in [0, 256) from the first two hex chars of md5(key). */
  def hashBucket256(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 2), 16, 10).cast("int")

  /** Keep rows with bucket < threshold: threshold/256 of the data,
    * deterministically. */
  def fractionSample(df: DataFrame, key: Column, threshold: Int): DataFrame =
    df.filter(hashBucket256(key) < threshold)

  /** Per-stratum thresholds (of 256): downsample dominant strata, keep the
    * rare ones — the standard rebalancing step for multilingual corpora.
    * `thresholds` maps stratum value → bucket threshold; `defaultThreshold`
    * applies to unlisted strata. */
  def stratifiedSample(
      df: DataFrame,
      key: Column,
      stratum: Column,
      thresholds: Map[String, Int],
      defaultThreshold: Int): DataFrame = {
    val cut = thresholds.toSeq.sortBy(_._1).foldLeft(lit(defaultThreshold)) {
      case (acc, (value, t)) => when(stratum === value, lit(t)).otherwise(acc)
    }
    df.filter(hashBucket256(key) < cut)
  }

  /** Exactly-n uniform sample without replacement: the n smallest md5
    * hashes. A deterministic reservoir — growing the corpus only evicts
    * rows with the largest hashes, it never reshuffles the survivors.
    *
    * Duplicate keys (r18, closing the r17 review caveat): rows sharing a
    * key share a hash, so the md5 order alone would leave WHICH duplicate
    * survives an n-boundary straddle to partition order. A full-row
    * xxhash64 tiebreak makes the survivor set a pure function of content —
    * same rows in, same rows out, on any partitioning. Rows identical in
    * EVERY column still tie, and interchangeably so: whichever survives,
    * the multiset of returned rows is the same. The plan stays the same
    * TakeOrderedAndProject (per-partition heaps, driver merge of n rows —
    * never a global sort).
    *
    * Map-typed columns are excluded from the tiebreak hash (xxhash64
    * rejects MapType — maps have no canonical entry order); rows differing
    * only in a map column therefore still tie, which is the pre-r18
    * behavior for exactly those columns and exact-tie behavior for all
    * others. */
  def fixedSizeSample(df: DataFrame, key: Column, n: Int): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType    => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType  => hasMap(a.elementType)
      case _             => false
    }
    // The key hash is computed first (the caller's Column resolves against
    // the original names), then every column is renamed POSITIONALLY before
    // the tiebreak references them: `col(name)` parses dots as struct
    // access, so a legal top-level column named `a.b` — or two columns
    // sharing a name — would otherwise fail analysis (r18 ADVICE).
    val names = df.columns.toIndexedSeq
    val tmp = names.indices.map(i => s"_gfs_c$i")
    val renamed = df.withColumn("_gfs_h", md5(key.cast("string").cast("binary")))
      .toDF(tmp :+ "_gfs_h": _*)
    val hashable = renamed.schema.fields.dropRight(1)
      .filterNot(f => hasMap(f.dataType)).map(f => col(f.name)).toIndexedSeq
    val tiebreak = if (hashable.isEmpty) lit(0L) else xxhash64(hashable: _*)
    renamed
      .withColumn("_gfs_rh", tiebreak)
      .orderBy(col("_gfs_h"), col("_gfs_rh"))
      .limit(n)
      .drop("_gfs_h", "_gfs_rh")
      .toDF(names: _*)
  }

  /** Deterministic uniform draw in (0, 1]: 24 bits of md5(key). Coarse
    * enough to rebuild with integer arithmetic in any engine, fine enough
    * that collisions are ~n²/2²⁵ (none at corpus-shard scale). */
  def hashUniform(key: Column): Column =
    (conv(substring(md5(key.cast("string").cast("binary")), 1, 6), 16, 10)
      .cast("long") + lit(1L)) / lit(16777216.0)

  /** Exactly-k weighted sample without replacement (Efraimidis–Spirakis
    * A-Res): rank rows by ln(u)/w where u = hashUniform(key) — equivalent
    * to ranking by u^(1/w) — and keep the k largest. Heavier rows win
    * proportionally more often, membership is a pure function of
    * (key, weight), and the plan is the same TakeOrderedAndProject top-k
    * as fixedSizeSample: per-partition heaps, driver merge of k rows,
    * never a global sort.
    *
    * Non-positive (or NULL) weights rank −∞ — the A-Res limit w→0⁺ gives
    * u^(1/w)→0, i.e. "never beats a positively-weighted row"; such rows
    * fill remaining slots in key order. The guard also keeps the raw
    * ln(u)/0 division out of the plan, which ANSI mode would reject at
    * runtime instead of returning the IEEE ±Inf/NaN. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int): DataFrame = {
    val w = weight.cast("double")
    df.withColumn("_wk",
        when(w > 0.0, log(hashUniform(key)) / w)
          .otherwise(lit(Double.NegativeInfinity)))
      .orderBy(col("_wk").desc, key)
      .limit(k)
      .drop("_wk")
  }

  /** Uniform bucket in [0, 65536) from the first four hex chars of
    * md5(key) — 16-bit granularity for DATA-DERIVED acceptance rates,
    * where the 8-bit bucket would quantize a computed rate too coarsely. */
  def hashBucket65536(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 4), 16, 10).cast("int")

  /** One stratum's computed acceptance plan: corpus mass found, the
    * acceptance rate hitting the target share of the budget (capped at 1 —
    * sampling is without replacement), and the 16-bit hash threshold. */
  final case class MixtureRate(stratum: String, total: Long, rate: Double, threshold: Int)

  final case class MixtureResult(sampled: DataFrame, plan: Seq[MixtureRate])

  /** Domain-mixture construction (the Pile/DoReMi recipe): given target
    * mixture weights over a stratum column and a total mass budget, keep
    * each stratum at rate `min(1, (w/Σw · budget) / mass_s)` so the sample
    * approaches the target mixture — deterministically, by content hash.
    *
    * Two passes: one hash-aggregate for per-stratum mass (the collect is
    * bounded at one row per stratum — corpus catalogs, not corpus rows),
    * then a pure codegen'd hash filter that rides the scan: no shuffle,
    * no state, any partitioning. Strata not in `targetWeights` get weight
    * 0 and are dropped. An under-massed stratum caps at rate 1 (can't
    * oversample without replacement) — visible in the returned plan as
    * threshold 65536, so mixture shortfall is measured, never silent.
    *
    * Rate arithmetic is pinned to `((w / wsum) * budget) / total` with
    * wsum summed over strata in SORTED order — double addition isn't
    * associative, and the oracle must replay the same floating-point
    * steps to land on the same 16-bit threshold. */
  def mixtureSample(
      df: DataFrame,
      key: Column,
      stratum: Column,
      mass: Column,
      targetWeights: Map[String, Double],
      budget: Long): MixtureResult = {
    val ordered = targetWeights.toSeq.sortBy(_._1)
    val wsum = ordered.map(_._2).sum
    // type hygiene at the collect boundary: stratum is cast to string and
    // the mass sum rounded to long IN the aggregate, so a non-string stratum
    // column or a DoubleType mass never throws ClassCastException at collect
    // time. Mass is a row/byte/token count in every in-repo caller (the sum
    // is already integral and round is the identity), but a fractional-mass
    // caller gets HALF_UP rounding of the SUM, not silent truncation —
    // 10.4 + 10.4 = 20.8 counts as 21, not 20, so the computed rate is
    // never inflated by a dropped fraction. A NULL stratum aggregates like
    // any other value but can never
    // match a key of targetWeights (Map[String, _] holds no null), so its
    // rows fall to threshold 0 and are dropped — same rule as any unlisted
    // stratum.
    val totals = strataTotalsFrame(df, stratum, mass, ordered.map(_._1))
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .toMap
    val plan = ordered.map { case (s, w) =>
      val t = totals.getOrElse(s, 0L)
      val rate = if (t == 0L) 0.0 else math.min(1.0, ((w / wsum) * budget) / t)
      MixtureRate(s, t, rate, math.floor(rate * 65536.0).toInt)
    }
    val thr = plan.foldLeft(lit(0)) { case (acc, m) =>
      when(stratum.cast("string") === m.stratum, lit(m.threshold)).otherwise(acc)
    }
    MixtureResult(df.filter(hashBucket65536(key) < thr), plan)
  }

  /** The per-stratum totals aggregate `mixtureSample` collects — exposed
    * (package-private) so the spec can pin its boundedness directly. The
    * listed-strata filter sits BELOW the aggregate, so the driver collect
    * is structurally capped at |targetWeights| rows (r16): a hostile
    * per-row-unique stratum column prunes map-side instead of shuffling
    * corpus-many groups into a corpus-sized collect. Unlisted strata fall
    * to threshold 0 regardless, and a NULL stratum can never match a
    * `Map[String, _]` key, so pre-filtering changes nothing downstream. */
  private[operators] def strataTotalsFrame(
      df: DataFrame, stratum: Column, mass: Column, listed: Seq[String]): DataFrame =
    df.filter(stratum.cast("string").isInCollection(listed))
      .groupBy(stratum.cast("string").as("_s"))
      .agg(round(sum(mass)).cast("long").as("_t"))

  /** Leakage-safe train/val/test split: a naive per-row hash split puts two
    * copies of the same document on opposite sides of the split — the
    * test set then "measures" memorization of training rows. Here every
    * row hashes its duplicate-class REPRESENTATIVE (min `id` over
    * `groupKey`, e.g. a normalized-text fingerprint), so an entire dup
    * class always lands on one side. Plug a near-dup cluster label in as
    * `groupKey` to extend the guarantee from exact to fuzzy duplicates.
    *
    * Scale shape: one hash-aggregate builds the (groupKey → rep) frame
    * (map-side combine shuffles one row per distinct class), one equi-join
    * hands each row its rep — a mega-duplicated document only skews probe
    * partition sizes (AQE-split) — and the bucket/split columns are pure
    * codegen'd md5 arithmetic. Assignment is a function of content alone:
    * engine-, run-, and partitioning-independent.
    *
    * Growth stability caveat: the class representative is `min(id)`, so
    * assignments survive corpus growth ONLY when ids are assigned
    * monotonically (a later-ingested duplicate with a smaller id would
    * re-elect the rep and could move its whole class). Append-only
    * pipelines with monotone ids — the ODF ledger model — satisfy this
    * by construction. */
  def leakageSafeSplit(
      df: DataFrame,
      id: Column,
      groupKey: Column,
      trainUpper: Int = 205,
      valUpper: Int = 230): DataFrame = {
    // null-safe key equality: a NULL groupKey (e.g. the fingerprint of a
    // NULL text) forms its own dup class — groupBy already emits the NULL
    // group, and <=> lets its rows find their rep instead of vanishing
    // from the split (a plain equi-join never matches NULL keys)
    val reps = df.groupBy(groupKey.as("_gkr")).agg(min(id).as("rep"))
    df.select(id.as("id"), groupKey.as("_gk"))
      .join(reps, col("_gk") <=> col("_gkr"))
      .select(col("id"), col("rep"), hashBucket256(col("rep")).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainUpper, "train")
          .when(col("bucket") < valUpper, "val")
          .otherwise("test"))
  }
}
