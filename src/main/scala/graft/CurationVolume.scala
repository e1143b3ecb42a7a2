package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Volume rehearsal for the end-to-end curation pipeline (the
  * q_curation_pipeline chain), pattern of [[DedupVolume]]/[[AnnVolume]]:
  * ~500k documents (sf0.1 corpus replicated 100× with per-replica id
  * offsets; every 10th replica keeps its text verbatim — planted exact-dup
  * clusters the dedup stage must collapse — and the rest get unique
  * synthetic text so the corpus isn't pathologically duplicated).
  *
  * The chain runs as ONE composed plan, exactly like the query: language
  * allowlist → global-percentile length gate (single-row broadcast) →
  * exact dedup (hash aggregate on text) → deterministic hash split →
  * per-(lang, split) rollup. Success criterion is shape, not a golden
  * value: the 100× corpus must take ~10× the 10× corpus (linear in rows —
  * the only shuffles are the dedup hash-agg and the tiny rollup), and the
  * driver sees only the final rollup rows (nothing data-volume is ever
  * collected).
  */
object CurationVolume {
  def time[T](label: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[curation-vol] $label: $s%.1f s")
    (r, s)
  }

  /** The q_curation_pipeline chain over an arbitrary ledger. */
  def pipeline(ledger: DataFrame): DataFrame = {
    val langGated = ledger.filter(col("lang").isin("en", "de", "fr"))
    val bounds = langGated.agg(
      percentile(col("n_chars"), lit(0.05)).as("lo"),
      percentile(col("n_chars"), lit(0.95)).as("hi"))
    val gated = langGated.crossJoin(broadcast(bounds))
      .filter(col("n_chars") >= col("lo") && col("n_chars") <= col("hi"))
    val deduped = gated
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"),
        min(col("lang")).as("lang"), min(col("n_chars")).as("n_chars"))
    val split = deduped.withColumn("bucket", Sampling.hashBucket256(col("doc_id")))
      .withColumn("split",
        when(col("bucket") < 205, "train")
          .when(col("bucket") < 230, "val")
          .otherwise("test"))
    split.groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"), col("split"))
  }

  /** sf0.1 documents × `reps` replicas; every 10th replica verbatim. */
  def corpus(spark: SparkSession, reps: Int): DataFrame = {
    val d = graft.sources.Tables.table(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    d.crossJoin(spark.range(reps).select(col("id").as("rep")))
      .select(
        (col("doc_id") + col("rep") * 1000000L).as("doc_id"),
        when(col("rep") % 10 === 0, col("text"))
          .otherwise(concat_ws(" ", transform(sequence(lit(1), lit(40)),
            i => concat(lit("w"), col("rep"), lit("_"), col("doc_id"), lit("_"), i))))
          .as("text"),
        col("lang"),
        col("n_chars"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val big = corpus(spark, 100)
    val (n, _) = time("build 500k corpus")(big.count())
    println(s"[curation-vol] corpus rows: $n")

    // warm-up + linearity reference on the 10× corpus
    val (smallRows, tSmall) = time("pipeline on 10x (~50k docs)")(
      pipeline(corpus(spark, 10)).collect())
    val (bigRows, tBig) = time("pipeline on 100x (~500k docs)")(
      pipeline(big).collect())
    val kept = bigRows.map(_.getAs[Long]("n_docs")).sum
    println(s"[curation-vol] rollup rows: ${bigRows.length}, docs kept: $kept of $n " +
      s"(small run kept ${smallRows.map(_.getAs[Long]("n_docs")).sum})")
    println(f"[curation-vol] 100x/10x runtime ratio: ${tBig / tSmall}%.1f (linear target ~10)")
    spark.stop()
  }
}
