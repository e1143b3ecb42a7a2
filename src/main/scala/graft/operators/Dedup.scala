package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard.
  *
  * Scale design:
  *   - signatures are pure map-stage expression trees (codegen'd, no UDFs);
  *   - candidate generation is a bucket equi-join (shuffle on bucket id),
  *     never an all-pairs product: at 100 TB the only quadratic work happens
  *     inside LSH buckets, whose expected size is controlled by the band/row
  *     parameters;
  *   - verification (exact Jaccard / Hamming) runs only on candidate pairs.
  */
object Dedup {

  /** Exact dedup: one representative (min of `tieBreak`) per `key`, with the
    * duplicate count. A single hash-aggregate — map-side partial combine
    * makes this shuffle only one row per distinct key. */
  def exact(df: DataFrame, key: Column, tieBreak: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(tieBreak).as("keep_id"), count(lit(1)).as("n_copies"))

  // --- MinHash + LSH ------------------------------------------------------

  /** MinHash signature over a shingle array: `numHashes` universal-hash
    * permutations h_i(x) = (a_i * x + b_i) mod p applied to
    * xxhash64(shingle); signature[i] = min over shingles.
    *
    * a_i/b_i are derived from the index via xxhash64 so the whole signature
    * is one deterministic expression tree. All operands are reduced mod p
    * (31 bits) before the multiply, so a·x + b stays below 2^63 — ANSI mode
    * (Spark 4 default) would otherwise throw on long overflow. */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column = {
    val p = lit(2147483647L) // 2^31 - 1
    transform(sequence(lit(0), lit(numHashes - 1)), i => {
      val a = pmod(xxhash64(concat(lit("mh-a-"), i.cast("string"))), p - 1) + lit(1L) // ∈ [1, p-1]
      val b = pmod(xxhash64(concat(lit("mh-b-"), i.cast("string"))), p)
      array_min(transform(shinglesCol, s => pmod(a * pmod(xxhash64(s), p) + b, p)))
    })
  }

  /** Banded LSH buckets: split the signature into `bands` equal bands and
    * hash each band's content. Returns one row per (id, band) with a bucket
    * id; docs sharing any bucket are near-dup candidates. */
  def lshBuckets(df: DataFrame, id: Column, sig: Column, bands: Int): DataFrame = {
    val rows = posexplode(sig)
    df.select(id.as("id"), rows.as(Seq("pos", "h")))
      .withColumn("band", col("pos") % bands)
      .groupBy(col("id"), col("band"))
      .agg(xxhash64(concat_ws(",", collect_list(col("h").cast("string")))).as("bucket"))
  }

  /** Candidate pairs from LSH buckets: self-equi-join on (band, bucket).
    * The join shuffles on the bucket id — no cross product. */
  def lshCandidatePairs(buckets: DataFrame): DataFrame = {
    val l = buckets.select(col("band"), col("bucket"), col("id").as("id1"))
    val r = buckets.select(col("band"), col("bucket"), col("id").as("id2"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
  }

  /** End-to-end MinHash+LSH near-dup candidates over a text column. */
  def minhashCandidates(
      df: DataFrame, id: Column, text: Column,
      numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3): DataFrame = {
    val withSig = df.select(
      id.as("id"),
      minhashSignature(array_distinct(TextOps.shingles(text, shingleSize)), numHashes).as("sig"))
    lshCandidatePairs(lshBuckets(withSig, col("id"), col("sig"), bands))
  }

  // --- SimHash ------------------------------------------------------------

  /** 64-bit SimHash over a token array, returned as 4 × 16-bit chunk values
    * (chunked for pigeonhole banding: Hamming distance ≤ 3 ⇒ at least one
    * of 4 chunks identical).
    *
    * bit_j = sign of Σ_tokens (bit_j(xxhash64(token)) ? +1 : -1). */
  def simhashChunks(tokensCol: Column): Column = {
    // per-token ±1 bit vectors folded with an array accumulator
    val bitSums = aggregate(
      tokensCol,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, j) => a + when(call_function("getbit", h, j.cast("int")) === 1, 1L).otherwise(-1L))
      })
    transform(sequence(lit(0), lit(3)), c =>
      aggregate(
        sequence(lit(0), lit(15)),
        lit(0L),
        (acc, j) => acc + when(element_at(bitSums, (c * 16 + j + 1).cast("int")) > 0,
          call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(lit(0L))))
  }

  /** Hamming distance between two 4-chunk SimHash signatures. */
  def hammingDistance(sig1: Column, sig2: Column): Column =
    aggregate(zip_with(sig1, sig2, (a, b) => bit_count(a.bitwiseXOR(b)).cast("long")),
      lit(0L), (acc, x) => acc + x).cast("int")

  /** SimHash near-dup pairs: pigeonhole-band on chunks (candidates share at
    * least one chunk value), then verify Hamming ≤ maxDist exactly. */
  def simhashPairs(df: DataFrame, id: Column, text: Column, maxDist: Int = 6): DataFrame = {
    val sigs = df.select(id.as("id"), simhashChunks(TextOps.tokens(text)).as("sig"))
    val exploded = sigs.select(col("id"), col("sig"), posexplode(col("sig")).as(Seq("chunk_idx", "chunk_val")))
    val l = exploded.select(col("chunk_idx"), col("chunk_val"), col("id").as("id1"), col("sig").as("sig1"))
    val r = exploded.select(col("chunk_idx"), col("chunk_val"), col("id").as("id2"), col("sig").as("sig2"))
    l.join(r, Seq("chunk_idx", "chunk_val"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), hammingDistance(col("sig1"), col("sig2")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // --- Exact n-gram Jaccard ----------------------------------------------

  /** Exact n-gram Jaccard similarity join: pairs sharing ≥1 shingle, scored
    * |A∩B| / |A∪B|, kept above `threshold`.
    *
    * The shingle explode + equi-join is the classic inverted-index join: at
    * scale, frequency-cap hot shingles before joining (a shingle appearing
    * in k docs contributes k² candidate pairs). */
  def ngramJaccardPairs(
      df: DataFrame, id: Column, text: Column,
      threshold: Double, shingleSize: Int = 3): DataFrame = {
    val toks = df.select(id.as("id"),
      array_distinct(TextOps.shingles(text, shingleSize)).as("shs"))
    val sizes = toks.select(col("id"), size(col("shs")).as("n_sh"))
    val sh = toks.select(col("id"), explode(col("shs")).as("sh"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("n_sh", "n1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("n_sh", "n2"), "id2")
      .withColumn("jaccard",
        round(col("n_common").cast("double") / (col("n1") + col("n2") - col("n_common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("n_common"), col("jaccard"))
  }
}
