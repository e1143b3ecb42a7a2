package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Measurement hygiene (round-1 verdict + round-8 verdict #3): queries run
  * in sorted-name order (deterministic); each gets one untimed warm pass
  * (absorbs parquet footer reads + codegen compilation) and then
  * SPARK_GRAFT_REPS timed passes (default 3), reporting the MIN. The
  * r6→r8 history showed 1.5–3× single-run noise on identical code
  * (q_dedup_minhash r7, q_json_funcs r7→r8) that twice triggered
  * regression hunts, and the r16 pinned-commit A/B measured the
  * same-CODE run-to-run band on this machine at 8–18% — min-of-N-warm
  * is the estimator that reproduces across driver runs (min-of-3 per
  * query as of r17; SCALE.md records the protocol and the band). The
  * JSON line is printed (and flushed) before `spark.stop()` so no shutdown
  * logging can interleave with or truncate it.
  *
  * Both JSON lines carry `calib_pre`/`calib_post` (r18): min-of-3 seconds
  * of a FROZEN synthetic workload run in the same session, before and
  * after the sweep — the machine-phase scalar that lets cross-round totals
  * be normalized instead of adjudicated (SCALE.md round 18 records the
  * protocol).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warm = sys.env.getOrElse("SPARK_GRAFT_WARM", "1") == "1"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // JVM/codegen warmup so the first query doesn't absorb session startup
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    // Machine-phase calibration anchor (r17 verdict #2): the driver total
    // drifted 90 → 100 s over three rounds while same-tree min-of-3 runs sat
    // flat, and each round re-ARGUED machine phase after the fact. This
    // workload is FROZEN — pure Spark over spark.range, zero dependence on
    // repo code or test data, DO NOT CHANGE IT — so its min-of-3 seconds in
    // a given bench session is a pure machine-phase scalar: to compare
    // BENCH_rN totals across rounds, normalize by the calib fields first.
    // Measured once before the sweep and once after (calib_pre/calib_post),
    // so intra-session drift is visible too. Shape: one 8M-row shuffle into
    // a 9973-group aggregate with string min/max (codegen + exchange + sort
    // — the suite's dominant cost classes in one plan).
    def calibPass(): Double = {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      spark.range(0L, 8000000L, 1L, 32)
        .selectExpr("id % 9973 AS k", "cast(id AS string) AS s", "id")
        .groupBy("k")
        .agg(Map("id" -> "sum", "s" -> "max", "k" -> "count"))
        .orderBy("k")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def calibrate(): Double = { calibPass(); (1 to 3).map(_ => calibPass()).min }
    val calibPre = calibrate()
    // noop sink materializes every output column (count() would let
    // Catalyst prune the projections and under-report map-heavy queries)
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    // Dev convenience: SPARK_GRAFT_ONLY=q_a,q_b restricts the sweep to the
    // named queries (unset = full suite; the driver never sets it).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    only.foreach { names =>
      val unknown = names.filterNot(SparkEntry.queries.contains)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.mkString(", ")} — " +
          "a typo here would silently time an empty sweep")
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      if (warm) run(name, fn)
      val times = (1 to reps).map { _ =>
        // steady-state hygiene: don't charge this query for the previous
        // pass's garbage (measured: a 600k-row sort reads 2.4s isolated but
        // 10s mid-sweep without this)
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        run(name, fn)
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val calibPost = calibrate()
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    def fmt(v: Double): String = f"$v%.3f"
    val calib = s""""calib_pre":${fmt(calibPre)},"calib_post":${fmt(calibPost)}"""
    // Full-precision line for humans / logs goes to STDERR: the harness
    // captures only the last 2000 chars of stdout, and this line outgrew
    // that window once the suite passed ~70 queries (BENCH_r0{1,2,3}.json:
    // parsed=null). stdout carries exactly one, bounded, JSON line.
    System.err.println(s"""{"metric":"total_full","value":$total,"unit":"sec",$calib,"queries":$qs,"sf":"$sfDir"}""")
    // The LAST stdout line is the machine-readable one: kept under ~1900
    // chars so it always sits entirely inside the tail window. Per-query
    // seconds at 3 decimals, slowest queries first, greedily filled until
    // the budget is hit (the slow ones are the ones worth grading).
    val preamble = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},$calib,"sf":"$sfDir","queries":{"""
    val epilogue = "}}"
    val budget = 1900 - preamble.length - epilogue.length
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    results.sortBy(-_._2).foreach { case (k, v) =>
      val e = "\"" + k + "\":" + fmt(v)
      val cost = e.length + (if (entries.isEmpty) 0 else 1)
      if (used + cost <= budget) { entries += e; used += cost }
    }
    System.out.println(preamble + entries.mkString(",") + epilogue)
    System.out.flush()
    graft.queries.SimilarityQueries.clearExactTopKCache()
    spark.stop()
  }
}
