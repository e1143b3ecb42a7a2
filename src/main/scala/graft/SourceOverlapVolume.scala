package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Volume rehearsal for the cross-source overlap matrix under a viral
  * gram: 500k docs across 20 sources, EVERY doc carrying the same 8-token
  * boilerplate phrase (a gram present in all |S| sources at 500k raw
  * occurrences) inside unique filler text.
  *
  * What the claim "no df cap needed — the per-key bound is structural"
  * must mean in task terms:
  *   - the DISTINCT (source, gram) aggregate eats the 500k raw
  *     occurrences of the viral gram map-side; it reaches the shuffle as
  *     ≤ #partitions × |S| combined rows and survives as exactly |S|
  *     distinct rows;
  *   - the gram self-join then fans the viral gram out to (|S| choose 2)
  *     = 190 pairs — constant in corpus size — while every unique filler
  *     gram joins nothing;
  *   - the matrix aggregate emits ≤ |S|² rows.
  * The listener asserts no task reads a raw-occurrence-scale row count;
  * the result assertion pins all 190 source pairs sharing ≥ the planted
  * gram count. */
object SourceOverlapVolume {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[srcovl-vol] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val boiler = (1 to 8).map(i => s"viral$i").mkString(" ")
    // 11 unique tokens + the viral 8-token phrase + 11 more unique tokens:
    // exactly one gram per doc is shared corpus-wide, the rest join nothing
    val corpus = spark.range(500000).select(
      col("id").as("doc_id"),
      concat(lit("src"), col("id") % 20).as("source"),
      concat_ws(" ",
        concat_ws(" ", (1 to 11).map(i => concat(lit("u"), col("id"), lit(s"_a$i"))): _*),
        lit(boiler),
        concat_ws(" ", (1 to 11).map(i => concat(lit("u"), col("id"), lit(s"_b$i"))): _*))
        .as("text"))

    val listener = StageShuffleListener.install(spark)
    val m = time("cross-source overlap, 500k docs / 20 sources / 1 viral gram")(
      graft.operators.Dedup.crossSourceOverlap(corpus, col("source"), col("text"))
        .collect())
    println(s"[srcovl-vol] matrix rows: ${m.length}")
    assert(m.length == 190, s"all (20 choose 2) source pairs must appear: ${m.length}")
    // windows sliding across the viral phrase are doc-unique (they mix in
    // filler tokens); only the pure 8-token phrase itself is shared, so
    // every pair shares EXACTLY that one gram
    assert(m.forall(_.getLong(2) == 1L),
      s"every pair shares exactly the planted gram: ${m.take(3).mkString(", ")}")

    listener.drain(minTasks = 50L)
    // ~500k docs × 23 grams ≈ 11.5M distinct-stage rows spread by
    // (source, gram) hash ≈ 180k/task uniform; a plan that shuffled raw
    // viral postings (or joined before the distinct) would put 500k rows
    // on one task
    val worst = listener.worstTaskRows
    assert(worst < 400000, s"a task read a raw-occurrence-scale row count: $worst")
    println(s"[srcovl-vol] worst task shuffle rows: $worst (bound 400000)")
    spark.stop()
  }
}
