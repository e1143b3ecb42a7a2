package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Volume rehearsal for duplicate-substring span detection under viral
  * boilerplate: 500k docs, EVERY one carrying the same 20-token paragraph
  * (a cookie banner at k = 500,000 occurrences — the adversarial case for
  * any posting-list design) inside unique filler text.
  *
  * What the claim "linear in k, no df cap needed" must mean in task terms:
  *   - the (win, id) distinct shuffle spreads by the PAIR, so the viral
  *     window's 500k postings hash across all partitions;
  *   - the df count is map-side combined — reducers read O(#map partitions
  *     × #keys), never one task per hot window key;
  *   - the duplicated-window set (6 keys here) broadcasts into the
  *     semi-join, so the posting stream re-derivation never shuffles by
  *     window at all;
  *   - the per-doc coverage groupBy distributes by doc id (uniform).
  * The listener asserts no task reads a hot-key-sized row count; the
  * result assertion pins every doc flagged at exactly the paragraph's 20
  * merged tokens. */
object DupSpanVolume {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[dupspan-vol] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // optional first arg "longdoc": the REWRITE-step rehearsal — 64 pairs
    // of identical 100k-token docs, so covered ≈ L for every doc. The old
    // per-token array_contains probe was O(L×C) ≈ 10^10 comparisons per
    // doc (hours); the interval-walk rewrite is O(L + C) and must clear
    // the whole corpus in well under two minutes.
    if (args.headOption.contains("longdoc")) {
      val L = 100000
      val docs = spark.range(64).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(L)),
          i => concat(lit("t"), (col("id") % 2) * 1000000 + i))).as("text"))
      val t0 = System.nanoTime()
      val agg = graft.operators.Dedup
        .removeDuplicateSpans(docs, col("doc_id"), col("text"), windowSize = 15)
        .agg(count(lit(1)), sum(col("dup_tokens")), max(col("n_clean_tokens")))
        .collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[dupspan-vol] longdoc: 64 x ${L} fully-duplicated tokens " +
        f"rewritten in $sec%.1f s")
      assert(agg.getLong(0) == 64L && agg.getLong(1) == 64L * L && agg.getInt(2) == 0,
        s"every token of every doc must be excised: $agg")
      assert(sec < 120.0, f"rewrite took $sec%.1f s — quadratic probe regressed?")
      spark.stop()
      return
    }

    val boiler = (1 to 20).map(i => s"boiler$i").mkString(" ")
    // 15 unique tokens + the 20-token banner + 15 more unique tokens:
    // only windows fully inside the banner (6 per doc) are duplicated
    val corpus = spark.range(500000).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        concat_ws(" ", (1 to 15).map(i => concat(lit("u"), col("id"), lit(s"_a$i"))): _*),
        lit(boiler),
        concat_ws(" ", (1 to 15).map(i => concat(lit("u"), col("id"), lit(s"_b$i"))): _*))
        .as("text"))

    val listener = StageShuffleListener.install(spark)
    val spans = graft.operators.Dedup
      .duplicateSpans(corpus, col("doc_id"), col("text"), windowSize = 15)
    val agg = time("duplicate spans, 500k docs, one 500k-viral paragraph")(
      spans.agg(
        count(lit(1)).as("n_docs"),
        min(col("dup_tokens")).as("min_cov"),
        max(col("dup_tokens")).as("max_cov"),
        max(col("n_dup_windows")).as("max_wins")).collect()(0))
    println(s"[dupspan-vol] flagged=${agg.getLong(0)} cov=[${agg.getInt(1)},${agg.getInt(2)}] " +
      s"maxWins=${agg.getInt(3)}")
    assert(agg.getLong(0) == 500000L, s"every doc carries the banner: ${agg.getLong(0)}")
    assert(agg.getInt(1) == 20 && agg.getInt(2) == 20, "merged coverage must be the banner only")
    assert(agg.getInt(3) == 6, "exactly the 6 fully-inside windows")

    listener.drain(minTasks = 150L)
    for ((sid, (mx, sum, n)) <- listener.stages.take(6))
      println(s"[dupspan-vol] stage $sid: maxTaskRows=$mx sumRows=$sum tasks=$n")
    // 500k docs × 36 windows ≈ 18M postings over 128 partitions ≈ 140k/task
    // uniform; a win-keyed concentration of the viral window would put
    // 500k+ rows (6 keys × 500k ÷ reuse) on ONE task
    val worst = listener.worstTaskRows
    assert(worst < 400000, s"a task read a hot-window-sized row count: $worst")
    println(s"[dupspan-vol] worst task shuffle rows: $worst (bound 400000)")
    spark.stop()
  }
}
