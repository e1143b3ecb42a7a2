package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Volume rehearsal for full BPE training over a 2M-word vocabulary with a
  * planted dominant pair: 40% of words start with "qz" (an 800k-count pair
  * — the Zipf-head case), the rest are base-36 serials whose ~1300 distinct
  * pairs spread a few thousand counts each.
  *
  * What the claim "per-round work is vocab-sized and skew-proof" must mean
  * in task terms:
  *   - pair counting is a hash aggregate over the exploded adjacent pairs:
  *     map-side combine emits at most one row per (pair × map partition),
  *     so the 800k-hot (q,z) key reaches its reducer as ≤ #partitions
  *     combined rows — the listener asserts no task reads a hot-pair-sized
  *     row count;
  *   - the argmax is TakeOrdered(1): per-partition top-1 heaps, a 1-row
  *     driver merge — never a global sort;
  *   - re-segmentation is a narrow literal `replace` over the
  *     localCheckpoint-ed vocab — no shuffle at all between rounds.
  * The result assertion pins round 0 to the planted (q, z) merge with its
  * exact corpus count. */
object BpeVolume {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[bpe-vol] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
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

    // one word per row: 40% "qz"-prefixed serials, 60% plain serials
    val corpus = spark.range(2000000).select(
      col("id").as("doc_id"),
      when(col("id") % 5 < 2, concat(lit("qz"), lower(conv(col("id"), 10, 36))))
        .otherwise(lower(conv(col("id") + 7777777L, 10, 36))).as("text"))

    // optional first arg "encode32k": rehearse PRODUCTION-scale encode —
    // a synthetic well-formed 32,768-rank merge table (all 1,296 base-36
    // char pairs ranked lexicographically, then 2-char-unit + char pairs
    // up to the budget) applied to the 2M-word corpus through the native
    // BpeUnits expression. The plan-literal replace chain this replaced
    // ceilinged at O(100) ranks; the native path holds the whole table in
    // one expression and skips inapplicable ranks in O(1).
    if (args.headOption.contains("encode32k")) {
      val alpha = "0123456789abcdefghijklmnopqrstuvwxyz"
      val pairs1 = for (a <- alpha; b <- alpha) yield (a.toString, b.toString)
      val pairs2 = for (a <- alpha; b <- alpha; c <- alpha)
        yield (s"$a$b", c.toString)
      val table = (pairs1 ++ pairs2).take(32768)
      println(s"[bpe-vol] merge table ranks: ${table.length}")

      // driver-side replica of the rank-order pass rule for spot checks
      def encodeLocal(word: String): Int = {
        var units = word.map(_.toString).toArray
        val present = scala.collection.mutable.HashSet.empty[String] ++ units
        for ((a, b) <- table if units.length > 1) {
          if (present.contains(a) && present.contains(b)) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < units.length) {
              if (i + 1 < units.length && units(i) == a && units(i + 1) == b) {
                out += (a + b); present += (a + b); i += 2
              } else { out += units(i); i += 1 }
            }
            units = out.toArray
          }
        }
        units.length
      }

      val corpus = spark.range(2000000).select(
        col("id").as("doc_id"),
        when(col("id") % 5 < 2, concat(lit("qz"), lower(conv(col("id"), 10, 36))))
          .otherwise(lower(conv(col("id") + 7777777L, 10, 36))).as("text"))
      val t0 = System.nanoTime()
      val enc = graft.operators.LanguageModel
        .bpeEncode(corpus, col("doc_id"), col("text"), table)
      val agg = enc.agg(count(lit(1)), sum(col("n_words")), sum(col("n_units")))
        .collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      val chars = corpus.agg(sum(length(col("text")))).collect()(0).getLong(0)
      println(f"[bpe-vol] encode32k: 2M words, 32768 ranks in $sec%.1f s — " +
        s"docs=${agg.getLong(0)} words=${agg.getLong(1)} " +
        s"units=${agg.getLong(2)} (chars=$chars)")
      assert(agg.getLong(0) == 2000000L && agg.getLong(1) == 2000000L)
      assert(agg.getLong(2) < chars / 2,
        s"32k ranks must at least halve the unit count: ${agg.getLong(2)} vs $chars")
      // spot-check three words end-to-end against the driver replica
      val sample = corpus.filter(col("doc_id").isin(0L, 1L, 999999L))
        .select(col("doc_id"), col("text")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val got = enc.filter(col("id").isin(0L, 1L, 999999L))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      sample.foreach { case (id, w) =>
        assert(got(id) == encodeLocal(w).toLong,
          s"doc $id ('$w'): native ${got(id)} != replica ${encodeLocal(w)}")
      }
      println(s"[bpe-vol] spot checks vs driver replica: ok")
      spark.stop()
      return
    }

    // optional first arg "driver" [n]: the PRODUCTION-rank training
    // rehearsal — the driver in-memory merge loop (the default path when
    // the vocab fits) trains n ranks (default 4,096) over the 2M-word
    // vocabulary. The distributed loop at this budget would be ~n
    // sequential Spark jobs of pure scheduling latency; the driver loop
    // collects the (word, wf) table once and runs the incremental
    // Sennrich loop with zero jobs per round. Cross-checked: the first 64
    // ranks must equal the distributed loop's 64-rank table exactly.
    if (args.headOption.contains("driver")) {
      val n = args.lift(1).flatMap(_.toIntOption).getOrElse(4096)
      val t0 = System.nanoTime()
      val m = graft.operators.LanguageModel
        .bpeTrainMerges(corpus, col("text"), numMerges = n).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      // assert BEFORE the m.last dereference: a zero-merge outcome should
      // fail with the shortfall message, not NoSuchElementException
      assert(m.length == n, s"corpus must sustain $n merges, got ${m.length}")
      println(f"[bpe-vol] driver train: $n ranks over the 2M-word vocab in $sec%.1f s " +
        f"(last n=${m.last.getLong(3)})")
      assert(m.map(r => (r.getString(1), r.getString(2))).distinct.length == n,
        "merged pairs must be distinct")
      val t1 = System.nanoTime()
      val dist = graft.operators.LanguageModel
        .bpeTrainMerges(corpus, col("text"), numMerges = 64, driverVocabMax = 0L)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      println(f"[bpe-vol] distributed 64-rank cross-check trained in " +
        f"${(System.nanoTime() - t1) / 1e9}%.1f s")
      val drv64 = m.take(64).map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      assert(drv64.sameElements(dist),
        s"driver vs distributed 64-rank prefix diverged:\n  driver=${drv64.toSeq}\n  dist=${dist.toSeq}")
      println(s"[bpe-vol] driver/distributed 64-rank prefix: identical")
      spark.stop()
      return
    }

    // optional numeric first arg (e.g. 256): the DISTRIBUTED loop's
    // replace-chain-depth rehearsal — train numMerges/2 then numMerges
    // ranks (driverVocabMax = 0 forces the fallback path; the driver loop
    // would otherwise absorb this vocab) and compare wall times. With the
    // every-16-rounds vocab re-checkpoint the per-round cost is flat, so
    // t(n) ≈ 2·t(n/2); the unbounded chain's O(rounds²) growth would give
    // ~4×. Bound 3×.
    // toIntOption: an unrecognized arg (e.g. the typo "encode32K") falls
    // through to the default rehearsal instead of a NumberFormatException
    args.headOption.flatMap(_.toIntOption).filter(_ >= 64).foreach { n =>
      def train(rounds: Int): Double = {
        val t0 = System.nanoTime()
        val m = graft.operators.LanguageModel
          .bpeTrainMerges(corpus, col("text"), numMerges = rounds, driverVocabMax = 0L)
          .collect()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[bpe-vol] $rounds%4d ranks: $sec%.1f s (${m.length} merges, " +
          f"last n=${m.last.getLong(3)})")
        assert(m.length == rounds, s"corpus must sustain $rounds merges, got ${m.length}")
        sec
      }
      val tHalf = train(n / 2)
      val tFull = train(n)
      val ratio = tFull / tHalf
      println(f"[bpe-vol] per-round flatness: t($n)/t(${n / 2}) = $ratio%.2f (bound 3.0)")
      assert(ratio < 3.0,
        f"replace-chain depth not bounded: doubling ranks cost $ratio%.2fx")
      spark.stop()
      return
    }

    val listener = StageShuffleListener.install(spark)
    // distributed loop forced (driverVocabMax = 0): this mode rehearses the
    // fallback path's per-round SHUFFLE shape — the driver loop (rehearsed
    // by the "driver" mode above) runs no jobs inside the loop at all
    val merges = time("BPE training (distributed loop), 2M-word vocab, 6 merge rounds")(
      graft.operators.LanguageModel
        .bpeTrainMerges(corpus, col("text"), numMerges = 6, driverVocabMax = 0L)
        .collect())
    merges.foreach(r => println(s"[bpe-vol] merge ${r.getInt(0)}: " +
      s"(${r.getString(1)}, ${r.getString(2)}) n=${r.getLong(3)}"))
    assert(merges.length == 6, s"expected 6 merges, got ${merges.length}")
    // ≥ 800k: the planted prefix, plus incidental "qz" runs inside the
    // base-36 serials themselves
    assert(merges(0).getString(1) == "q" && merges(0).getString(2) == "z" &&
      merges(0).getLong(3) >= 800000L,
      s"round 0 must learn the planted (q, z) pair (n >= 800000)")
    val pairs = merges.map(r => (r.getString(1), r.getString(2))).toSeq
    assert(pairs.distinct.length == 6, s"merged pairs must be distinct: $pairs")

    listener.drain(minTasks = 50L)
    // ~2M words × ~4 adjacent pairs = ~8M exploded rows per round, but the
    // SHUFFLE sees only map-side-combined (pair × partition) rows: ~1300
    // distinct pairs × 64 partitions ≈ 85k rows/round ceiling. A plan that
    // shuffled raw postings would put the 800k-count hot pair's rows on
    // one reducer task.
    val worst = listener.worstTaskRows
    assert(worst < 400000, s"a task read a hot-pair-sized row count: $worst")
    println(s"[bpe-vol] worst task shuffle rows: $worst (bound 400000)")
    spark.stop()
  }
}
