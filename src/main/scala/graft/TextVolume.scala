package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.operators.TextOps

/** Volume rehearsal for the text-analysis family, pattern of
  * [[DedupVolume]]/[[AnnVolume]]/[[CurationVolume]]: 500k documents
  * (same replicated corpus as CurationVolume), two representative shapes:
  *
  *   1. the pure map stages (langid + quality + token count + fingerprint)
  *      in ONE pass, sunk into a tiny aggregate so nothing data-volume
  *      reaches the driver;
  *   2. the two-level aggregate shape (explode tokens → per-token counts →
  *      top-k vocabulary), the family's only shuffle pattern.
  *
  * Success criterion is shape: both runs finish in seconds at 500k docs and
  * the 100×/10× ratio stays ~linear (the map pass has no shuffle at all;
  * the vocab pass shuffles pre-aggregated token counts, not token streams).
  */
object TextVolume {
  def time[T](label: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[text-vol] $label: $s%.1f s")
    (r, s)
  }

  private def mapPass(docs: org.apache.spark.sql.DataFrame) =
    docs.select(
        TextOps.langId(col("text")).as("lang_id"),
        TextOps.qualityScore(col("text")).as("q"),
        TextOps.tokenCount(col("text")).as("n_tok"),
        TextOps.fingerprint(col("text")).as("fp"))
      .agg(
        countDistinct(col("lang_id")).as("langs"),
        avg(col("q")).as("avg_q"),
        sum(col("n_tok")).as("toks"),
        countDistinct(col("fp")).as("distinct_fps"))
      .collect()(0)

  private def vocabPass(docs: org.apache.spark.sql.DataFrame) =
    docs.select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(50)
      .collect()

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val big = CurationVolume.corpus(spark, 100)
    val (n, _) = time("build 500k corpus")(big.count())
    println(s"[text-vol] corpus rows: $n")

    val (_, tSmallMap) = time("map pass on 10x (~50k docs)")(
      mapPass(CurationVolume.corpus(spark, 10)))
    val (bigAgg, tBigMap) = time("map pass on 100x (~500k docs)")(mapPass(big))
    println(s"[text-vol] map-pass rollup: langs=${bigAgg.getLong(0)} " +
      s"toks=${bigAgg.getLong(2)} distinct_fps=${bigAgg.getLong(3)}")
    println(f"[text-vol] map 100x/10x ratio: ${tBigMap / tSmallMap}%.1f (linear target ~10)")

    val (_, tSmallVocab) = time("vocab top-50 on 10x")(
      vocabPass(CurationVolume.corpus(spark, 10)))
    val (top, tBigVocab) = time("vocab top-50 on 100x")(vocabPass(big))
    println(s"[text-vol] top token: ${top.head.getString(0)} x ${top.head.getLong(1)}")
    println(f"[text-vol] vocab 100x/10x ratio: ${tBigVocab / tSmallVocab}%.1f (linear target ~10)")
    spark.stop()
  }
}
