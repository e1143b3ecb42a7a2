package graft.fuzz

import java.io.File
import java.nio.file.Files

import scala.sys.process._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Differential fuzzing of the delegated-SQL dialect surface against DuckDB
  * (round-10 verdict item #2).
  *
  * [[ExprGen]] generates seeded random expression trees over the
  * DataFusionCompat dialect + shared-builtin surface with boundary-value
  * leaves (NULLs, '', empty/NULL arrays, NaN/±Inf, ±0.0, a bigint whose
  * square overflows, pre-epoch timestamps, unicode). [[FuzzHarness]]
  * evaluates them through an ODF request session — the same surface
  * engine.rs:287 delegates arbitrary SQL to — and tools/fuzz_check.py
  * replays the identical SQL text over the identical parquet fixture bytes
  * in DuckDB, comparing value-by-value (both-error = agreement; numeric
  * tolerance 1e-12 for libm tails).
  *
  * Divergences found by this harness during development were FIXED in the
  * engine where the contract (DataFusion) disagrees with Spark:
  * `list_extract`/`array_element`/`list_element` index 0 / out-of-bounds /
  * BIGINT-index handling (elementTotal — Spark's ElementAt throws where
  * DataFusion yields NULL); `atan2` negative-zero normalization
  * (Atan2Ieee); `round(double)` negative-zero normalization (RoundIeee —
  * Rust/DuckDB preserve the sign); `power(±1, NaN/Inf)` (PowIeee — Java's
  * Math.pow yields NaN where IEEE defines 1); `lcm` silent i64 overflow
  * (DataFusion/DuckDB raise); `corr` ANSI DIVIDE_BY_ZERO on zero
  * variance (CorrNullOnZeroVariance, found by the aggregate harness);
  * JSON-null extraction (JsonFunctions, found by the JSON harness). One
  * Spark parser-level deviation is PINNED instead of forked (string→float
  * casts accept Java float syntax — DataFusionCompat header, ExprGen's SL
  * type). Oracle-only deviations (DuckDB quirks vs the DataFusion
  * semantics this engine implements — sqrt/log domains, abs sign-of-zero,
  * list NULL ordering) are guarded at the generator with per-Sig
  * comments. Harness-side lesson pinned in ExprGen: magnitude guards must
  * be CASE range GATES, never fmod — fmod of a huge value turns an
  * upstream last-ulp libm difference into an arbitrary remainder.
  *
  * The seed is fixed so CI is deterministic; sweep fresh seeds manually
  * with `runMain graft.fuzz.FuzzDump <dir> <seed> <n>
  * [scalar|agg|win|json|rel|cte|dec] [depth]` (green at round 10: scalar
  * seeds 20260813/7/424242/777/555001/42424243/111/222/2222(depth 5) +
  * a 1500-case depth-4 sweep at 4444, agg 101/31337/909090/111/222/606,
  * win 202/787878/13131/111/222/404, json 55/606/909/111/222/777,
  * rel 77/888/3131/999, cte 42/1717/2929 — ~25k cases; round 11 adds
  * dec 20260813(300)/555001(400)/7777(400) — 1100 cases, a 200-case
  * scalar sanity sweep at 999123 after the tree refactor, a 200-case
  * cte sweep at 246810 after the CTE tree refactor, and a 7-mode
  * fresh-seed batch: scalar 13579(400, depth 4), agg 8642(300),
  * win 97531(300), json 31415(300), rel 27182(300), cte 16180(300),
  * dec 14142(300) — all green, 0 divergences. Late round 11 adds two
  * modes: hof 20260813(300 CI)/20260814(800) — Spark lambda HOFs vs
  * DuckDB list-function mirrors, the equivalence layer the inventory's
  * array-rebuilding oracle translations rest on — and subq
  * 20260813(400)/20260814(800) — [NOT] IN / correlated / scalar-agg /
  * derived-table shapes; both green, 0 divergences. Two fresh-seed finds,
  * both ORACLE defects guarded at the generator: (1) win 20260814 —
  * DuckDB can't type lag/lead of an untyped-NULL tree against a non-NULL
  * default, so VALUE args carry a no-op CAST; (2) subq 20260814
  * #643/#717 — DuckDB 1.0.0 mis-flattens correlated NOT IN with a
  * NULLABLE subquery output (empty-per-row-set outer rows are dropped;
  * Spark matches the standard), so the negated correlated shape
  * coalesces its subquery output and NULL-output NOT-IN poison coverage
  * lives in the uncorrelated shapes. Post-guard all-nine-modes batch:
  * scalar 33221(400, depth 5), agg 44332(300), win 55443(300),
  * json 66554(300), rel 77665(300), cte 88776(300), dec 99887(300),
  * hof 11998(300), subq 22119(300) — 2,800 cases, 0 divergences;
  * plus third-seed sweeps of the two new modes, subq 31337(500) and
  * hof 424242(500), and two depth-5 scalar sweeps 555777(400) /
  * 888999(400) — all green).
  */
class FuzzDifferentialSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-fuzz-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def duckdbAvailable: Boolean =
    try Seq("python3", "-c", "import duckdb").! == 0
    catch { case _: Exception => false }

  test("1000 random dialect expressions agree with DuckDB value-by-value") {
    assume(duckdbAvailable, "python3+duckdb not on PATH — differential half skipped")
    val dir = Files.createTempDirectory("graft-fuzz").toFile.getAbsolutePath
    val (ok, err) = FuzzHarness.run(spark, seed = 20260813L, n = 1000, outDir = dir)
    assert(ok + err == 1000)
    // engine errors are legitimate cases (overflow etc.) — the comparator
    // verifies DuckDB errors on exactly the same ones — but if MOST cases
    // error the generator is broken, not the engine
    assert(err < 100, s"$err/1000 cases errored in the engine — generator degenerate?")
    val out = new StringBuilder
    val rc = Process(Seq("python3", "tools/fuzz_check.py", dir, "--max-print", "10"),
      new File("."))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    assert(rc == 0, s"differential divergences:\n$out")
    assert(out.toString.contains("1000 cases"), s"comparator ran wrong case count:\n$out")
  }

  test("300 random aggregate/GROUP BY queries agree with DuckDB value-by-value") {
    assume(duckdbAvailable, "python3+duckdb not on PATH — differential half skipped")
    val dir = Files.createTempDirectory("graft-fuzz-agg").toFile.getAbsolutePath
    val (ok, err) = FuzzHarness.runAgg(spark, seed = 20260813L, n = 300, outDir = dir)
    assert(ok + err == 300)
    assert(err < 30, s"$err/300 aggregate cases errored in the engine — generator degenerate?")
    val out = new StringBuilder
    val rc = Process(Seq("python3", "tools/fuzz_check.py", dir, "--max-print", "10"),
      new File("."))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    assert(rc == 0, s"differential divergences:\n$out")
    assert(out.toString.contains("300 cases"), s"comparator ran wrong case count:\n$out")
  }

  test("300 random window-function queries agree with DuckDB value-by-value") {
    assume(duckdbAvailable, "python3+duckdb not on PATH — differential half skipped")
    val dir = Files.createTempDirectory("graft-fuzz-win").toFile.getAbsolutePath
    val (ok, err) = FuzzHarness.runWin(spark, seed = 20260813L, n = 300, outDir = dir)
    assert(ok + err == 300)
    assert(err < 30, s"$err/300 window cases errored in the engine — generator degenerate?")
    val out = new StringBuilder
    val rc = Process(Seq("python3", "tools/fuzz_check.py", dir, "--max-print", "10"),
      new File("."))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    assert(rc == 0, s"differential divergences:\n$out")
    assert(out.toString.contains("300 cases"), s"comparator ran wrong case count:\n$out")
  }

  test("300 random JSON-path queries agree with DuckDB value-by-value") {
    assume(duckdbAvailable, "python3+duckdb not on PATH — differential half skipped")
    val dir = Files.createTempDirectory("graft-fuzz-json").toFile.getAbsolutePath
    val (ok, err) = FuzzHarness.runJson(spark, seed = 20260813L, n = 300, outDir = dir)
    assert(ok + err == 300)
    assert(err < 30, s"$err/300 JSON cases errored in the engine — generator degenerate?")
    val out = new StringBuilder
    val rc = Process(Seq("python3", "tools/fuzz_check.py", dir, "--max-print", "10"),
      new File("."))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    assert(rc == 0, s"differential divergences:\n$out")
    assert(out.toString.contains("300 cases"), s"comparator ran wrong case count:\n$out")
  }

  test("300 random relational-shape queries agree with DuckDB value-by-value") {
    assume(duckdbAvailable, "python3+duckdb not on PATH — differential half skipped")
    val dir = Files.createTempDirectory("graft-fuzz-rel").toFile.getAbsolutePath
    val (ok, err) = FuzzHarness.runRel(spark, seed = 20260813L, n = 300, outDir = dir)
    assert(ok + err == 300)
    assert(err < 30, s"$err/300 relational cases errored in the engine — generator degenerate?")
    val out = new StringBuilder
    val rc = Process(Seq("python3", "tools/fuzz_check.py", dir, "--max-print", "10"),
      new File("."))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    assert(rc == 0, s"differential divergences:\n$out")
    assert(out.toString.contains("300 cases"), s"comparator ran wrong case count:\n$out")
  }

  test("300 random HOF lambda/list-function pairs agree with DuckDB value-by-value") {
    // mode #8: Spark lambda HOFs vs DuckDB list-function mirrors — the
    // equivalence layer every array-rebuilding oracle translation rests on
    assume(duckdbAvailable, "python3+duckdb not on PATH — differential half skipped")
    val dir = Files.createTempDirectory("graft-fuzz-hof").toFile.getAbsolutePath
    val (ok, err) = FuzzHarness.runHof(spark, seed = 20260813L, n = 300, outDir = dir)
    assert(ok + err == 300)
    assert(err < 30, s"$err/300 HOF cases errored in the engine — generator degenerate?")
    val out = new StringBuilder
    val rc = Process(Seq("python3", "tools/fuzz_check.py", dir, "--max-print", "10"),
      new File("."))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    assert(rc == 0, s"differential divergences:\n$out")
    assert(out.toString.contains("300 cases"), s"comparator ran wrong case count:\n$out")
  }

  test("300 random subquery shapes agree with DuckDB value-by-value") {
    // mode #9: [NOT] IN (the NULL-poison corner), correlated IN, scalar
    // aggregate subqueries in projection and WHERE, derived-table FROM —
    // the three-valued-logic surface the relational mode's EXISTS misses
    assume(duckdbAvailable, "python3+duckdb not on PATH — differential half skipped")
    val dir = Files.createTempDirectory("graft-fuzz-subq").toFile.getAbsolutePath
    val (ok, err) = FuzzHarness.runSubq(spark, seed = 20260813L, n = 300, outDir = dir)
    assert(ok + err == 300)
    assert(err < 30, s"$err/300 subquery cases errored in the engine — generator degenerate?")
    val out = new StringBuilder
    val rc = Process(Seq("python3", "tools/fuzz_check.py", dir, "--max-print", "10"),
      new File("."))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    assert(rc == 0, s"differential divergences:\n$out")
    assert(out.toString.contains("300 cases"), s"comparator ran wrong case count:\n$out")
  }

  test("300 random multi-step CTE chains agree with DuckDB value-by-value") {
    assume(duckdbAvailable, "python3+duckdb not on PATH — differential half skipped")
    val dir = Files.createTempDirectory("graft-fuzz-cte").toFile.getAbsolutePath
    val (ok, err) = FuzzHarness.runCte(spark, seed = 20260813L, n = 300, outDir = dir)
    assert(ok + err == 300)
    assert(err < 30, s"$err/300 CTE cases errored in the engine — generator degenerate?")
    val out = new StringBuilder
    val rc = Process(Seq("python3", "tools/fuzz_check.py", dir, "--max-print", "10"),
      new File("."))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    assert(rc == 0, s"differential divergences:\n$out")
    assert(out.toString.contains("300 cases"), s"comparator ran wrong case count:\n$out")
  }

  test("300 random decimal/interval cases agree with DuckDB value-by-value") {
    assume(duckdbAvailable, "python3+duckdb not on PATH — differential half skipped")
    val dir = Files.createTempDirectory("graft-fuzz-dec").toFile.getAbsolutePath
    val (ok, err) = FuzzHarness.runDec(spark, seed = 20260813L, n = 300, outDir = dir)
    assert(ok + err == 300)
    assert(err < 30, s"$err/300 decimal cases errored in the engine — generator degenerate?")
    val out = new StringBuilder
    val rc = Process(Seq("python3", "tools/fuzz_check.py", dir, "--max-print", "10"),
      new File("."))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    assert(rc == 0, s"differential divergences:\n$out")
    assert(out.toString.contains("300 cases"), s"comparator ran wrong case count:\n$out")
  }

  test("generator is deterministic in the seed") {
    val a = (0 until 50).map(i => ExprGen.caseExpr(99L, i))
    val b = (0 until 50).map(i => ExprGen.caseExpr(99L, i))
    assert(a == b)
    // and actually varies across cases
    assert(a.distinct.size > 30, s"only ${a.distinct.size}/50 distinct expressions")
  }

  test("tree generation renders the identical SQL as the string generator") {
    for (i <- 0 until 100; d <- Seq(3, 4))
      assert(ExprGen.caseTree(424242L, i, d).sql == ExprGen.caseExpr(424242L, i, d))
  }

  test("minimizer shrinks a planted raw-pow divergence to <= 2 operator nodes") {
    import graft.fuzz.ExprGen.{D, LeafNode, Node, OpNode, Sig}
    import graft.odf.OdfSessions
    // Two request sessions over the same fixture content; in one, the
    // dialect's IEEE-correct power (PowIeee) is shadowed by raw
    // java.lang.Math.pow — the exact engine bug round 10 fixed (pow(±1,
    // NaN/Inf) is 1 in IEEE 754 / DataFusion / DuckDB, NaN in Java).
    val good = OdfSessions.newRequestSession(spark)
    val bad = OdfSessions.newRequestSession(spark)
    val dirG = Files.createTempDirectory("graft-shrink-good").toFile.getAbsolutePath
    val dirB = Files.createTempDirectory("graft-shrink-bad").toFile.getAbsolutePath
    FuzzHarness.writeAndRegisterFixture(good, dirG)
    FuzzHarness.writeAndRegisterFixture(bad, dirB)
    bad.udf.register("power", (a: java.lang.Double, b: java.lang.Double) =>
      if (a == null || b == null) null
      else java.lang.Double.valueOf(java.lang.Math.pow(a, b)))

    def diverges(n: Node): Boolean =
      FuzzHarness.evalExpr(bad, n.sql) != FuzzHarness.evalExpr(good, n.sql)

    // Plant: power(-1, d2) — d2's fixture rows include NaN and ±Inf, where
    // the raw path yields NaN and IEEE yields 1 — buried inside a random
    // depth-3 filler tree the minimizer must strip away.
    val powSig = Sig(as => s"power(${as(0)}, ${as(1)})", Seq(D, D), D)
    val plusSig = Sig(as => s"(${as(0)} + ${as(1)})", Seq(D, D), D)
    val filler = Iterator.from(0)
      .map(i => ExprGen.caseTree(31337L, i, 3))
      .find(t => t.ty == D && t.internalNodes >= 3).get
    val planted: Node = OpNode(plusSig, Seq(
      OpNode(powSig, Seq(LeafNode(D, "(0.0e0 - 1.0e0)"), LeafNode(D, "d2"))),
      filler))
    assert(diverges(planted), "planted divergence did not reproduce")

    val minimal = FuzzHarness.shrink(planted, diverges)
    assert(diverges(minimal), "shrink lost the divergence")
    assert(minimal.sql.contains("power("), s"shrink removed the culprit: ${minimal.sql}")
    assert(minimal.internalNodes <= 2,
      s"shrunk to ${minimal.internalNodes} op nodes, expected <= 2: ${minimal.sql}")
  }

  test("CTE reducer strips a planted divergence to one step, one rebinding, TRUE predicate") {
    import graft.fuzz.ExprGen.{B, CteCase, CteStep, D, L, LeafNode, Node, OpNode, Sig}
    import graft.odf.OdfSessions
    val good = OdfSessions.newRequestSession(spark)
    val bad = OdfSessions.newRequestSession(spark)
    val dirG = Files.createTempDirectory("graft-cteshrink-good").toFile.getAbsolutePath
    val dirB = Files.createTempDirectory("graft-cteshrink-bad").toFile.getAbsolutePath
    FuzzHarness.writeAndRegisterFixture(good, dirG)
    FuzzHarness.writeAndRegisterFixture(bad, dirB)
    bad.udf.register("power", (a: java.lang.Double, b: java.lang.Double) =>
      if (a == null || b == null) null
      else java.lang.Double.valueOf(java.lang.Math.pow(a, b)))
    def diverges(c: CteCase): Boolean =
      FuzzHarness.evalSql(bad, c.sql) != FuzzHarness.evalSql(good, c.sql)

    val powSig = Sig(as => s"power(${as(0)}, ${as(1)})", Seq(D, D), D)
    val orSig = Sig(as => s"(${as(0)} OR ${as(1)})", Seq(B, B), B)
    def filler(ty: ExprGen.Ty): Node = Iterator.from(0)
      .map(i => ExprGen.caseTree(777L, i, 2))
      .find(t => t.ty == ty && t.internalNodes >= 1).get
    // row-preserving but non-trivial predicate: (b1 OR TRUE) is always TRUE
    def keepAllPred: Node = OpNode(orSig, Seq(LeafNode(B, "b1"), LeafNode(B, "TRUE")))
    val planted = CteCase(Seq(
      CteStep(Seq(
        "l1" -> filler(L),
        "d1" -> OpNode(powSig, Seq(LeafNode(D, "(0.0e0 - 1.0e0)"), LeafNode(D, "d2"))),
        "b1" -> filler(B)), keepAllPred),
      CteStep(Seq("d2" -> filler(D)), keepAllPred)))
    assert(diverges(planted), "planted CTE divergence did not reproduce")

    val minimal = FuzzHarness.shrinkCte(planted, diverges)
    assert(diverges(minimal), "CTE shrink lost the divergence")
    assert(minimal.steps.length == 1, s"steps: ${minimal.sql}")
    assert(minimal.steps.head.muts.map(_._1) == Seq("d1"), s"rebindings: ${minimal.sql}")
    assert(minimal.steps.head.pred.sql == "TRUE", s"predicate: ${minimal.sql}")
    assert(minimal.steps.head.muts.head._2.internalNodes <= 2, s"tree: ${minimal.sql}")
    assert(minimal.sql.contains("power("), s"culprit gone: ${minimal.sql}")
  }
}
