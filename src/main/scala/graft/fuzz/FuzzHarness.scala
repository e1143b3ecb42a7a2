package graft.fuzz

import java.io.{BufferedWriter, File, FileWriter}
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.odf.OdfSessions

/** Differential-fuzz harness, Spark side (round-10 verdict item #2).
  *
  * Evaluates [[ExprGen]] cases through an ODF request session — the exact
  * delegated-SQL surface the reference exposes (engine.rs:287: arbitrary
  * SQL through the session's function registry, here Spark +
  * DataFusionCompat + JsonFunctions) — over a small boundary-value fixture,
  * and dumps `(expr, result-or-error)` per case as JSON lines.
  * `tools/fuzz_check.py` then replays the SAME SQL text over the SAME
  * parquet fixture bytes in DuckDB and compares value-by-value (numeric
  * tolerance for libm tails, both-error = agreement). FuzzDifferentialSpec
  * drives ≥1000 cases in CI; `graft.FuzzDump` runs bigger sweeps manually.
  *
  * The fixture is written once by Spark and READ BACK for evaluation, so
  * both engines consume identical parquet bytes — no second literal-parsing
  * path to diverge on.
  */
object FuzzHarness {

  /** Boundary-value fixture: NULLs in every column, empty/whitespace/
    * unicode/pattern-metachar strings, ±0.0/NaN/±Inf doubles, a bigint
    * whose square overflows by a hair (3037000499² ≈ Long.Max + 5.8e9 —
    * both engines must agree on the overflow error), 2^53+1 as an array
    * element (double-lossy the same way in both), empty and NULL arrays,
    * pre-epoch / leap-day / fractional-second timestamps; `j1` JSON docs
    * with a fixed key→type contract (ExprGen's pools), nested containers,
    * heterogeneous arrays, JSON nulls vs missing keys, escaped quotes and
    * unicode strings, an empty object, a top-level array, and a SQL NULL
    * (numbers stay in plain form — DuckDB re-renders exponent forms). */
  private val fixtureSql: String = """
    SELECT id, l1, l2, d1, d2, s1, s2, b1, a1, timestamp_micros(tsu) AS ts1, j1
    FROM VALUES
      (0L,  0L,    1L,  0.0e0,    1.5e0,   '',            'a',    true,
       array(), 1577836800000000L,
       '{"a": 1, "b": "x", "c": true, "f": 1.5, "si": "123", "n": null, "arr": [1, 2, 3], "obj": {"a": 7, "b": "y", "arr": [4], "obj": {"a": 9}}}'),
      (1L,  1L,   -1L,  -0.0e0,   -2.25e0, 'a',           'b',    false,
       array(1L), -1L,
       '{"a": -42, "b": "", "c": false, "f": -0.25, "si": "-7", "arr": [], "obj": {"a": 0, "b": "z", "arr": [1, 2, 3, 4, 5], "obj": {}}}'),
      (2L, -1L,    2L,  1.0e0,    0.1e0,   'abc',         'ABC',  CAST(NULL AS BOOLEAN),
       array(1L, 2L, 3L), 0L,
       '{"b": "He said \\\"hi\\\"", "arr": [10, {"a": 5}, [1, 2]], "obj": {"b": "Héllo"}}'),
      (3L,  7L,    3L,  -1.5e0,   CAST('NaN' AS DOUBLE), 'Hello World', 'hello', true,
       array(3L, 2L, 1L), 951825600000000L,
       '{}'),
      (4L,  100L,  10L, 1.0e6,    CAST('Infinity' AS DOUBLE), 'a,b,c', ',', false,
       array(0L, -1L, 7L), 1735689599500000L,
       '[1, 2, 3]'),
      (5L, -37L,   100L, 1.0e-6,  CAST('-Infinity' AS DOUBLE), ' pad ', '  ', true,
       array(100L, 100L, -37L), 915246245678901L,
       CAST(NULL AS STRING)),
      (6L,  1000000L, -5L, 2.5e0, 3.5e0,   '123',         '-42',  false,
       array(9007199254740993L), 1171243445000000L,
       '{"a": 1000000, "f": 100.0, "c": true, "si": "0", "n": null, "arr": [[1], [2, 3]], "obj": {"c": false, "f": 2.5, "si": "9"}}'),
      (7L,  3037000499L, 42L, -100.25e0, 1.0e308, 'Héllo Wörld', 'aaa', true,
       array(5L, 5L, 5L, 5L), 1209600000000L,
       '{"a": 0, "b": "a,b,c", "c": false, "f": 0.5, "arr": [7], "obj": {"a": -1, "n": null}}'),
      (8L,  CAST(NULL AS BIGINT), 6L, CAST(NULL AS DOUBLE), 2.0e0, 'not a number', '_%',
       CAST(NULL AS BOOLEAN), array(2L, 4L, 8L), CAST(NULL AS BIGINT),
       '{"a": 13, "b": "_%", "f": 3.5, "si": "1000000", "arr": [0, -1, 7, 9], "obj": {"arr": []}}'),
      (9L,  13L,  CAST(NULL AS BIGINT), 0.5e0, CAST(NULL AS DOUBLE), CAST(NULL AS STRING),
       'a_c', true, array(-5L), 386459112000000L,
       '{"n": null, "zz": 1}'),
      (10L, 2L,    7L,  7.25e0,   -1.0e6,  'aaa',         CAST(NULL AS STRING), false,
       CAST(NULL AS ARRAY<BIGINT>), 788918400000000L,
       '{"a": 7, "arr": [1, "two", 3.5, true, null], "obj": {"obj": {"obj": {"a": 1}}}}'),
      (11L, 4L,   -3L,  3.125e0,  0.25e0,  'xyz',         'x',    true,
       array(42L), 946684800000000L,
       '{"b": "日本語", "c": true, "obj": {"si": "42"}}')
      AS v(id, l1, l2, d1, d2, s1, s2, b1, a1, tsu, j1)"""

  /** Write the fixture parquet and register the read-back as temp view `t`
    * on `session`. Returns the read-back frame. */
  def writeAndRegisterFixture(session: SparkSession, outDir: String): DataFrame = {
    val path = s"$outDir/fixture.parquet"
    session.sql(fixtureSql).coalesce(1).write.mode("overwrite").parquet(path)
    val back = session.read.parquet(path)
    back.createOrReplaceTempView("t")
    back
  }

  /** Canonical value rendering shared (by construction) with
    * tools/fuzz_check.py's DuckDB-side canon: NULL → "NULL", booleans
    * lowercase, timestamps → "us:<epoch-micros>", arrays element-joined in
    * brackets, doubles via Double.toString (python float() parses the
    * "1.0E-6"/"NaN"/"Infinity" renderings; the comparator matches numerics
    * with tolerance, never strings). */
  def canon(v: Any): String = v match {
    case null => "NULL"
    case b: Boolean => if (b) "true" else "false"
    case t: java.sql.Timestamp =>
      val i = t.toInstant
      "us:" + (i.getEpochSecond * 1000000L + i.getNano / 1000)
    case i: Instant => "us:" + (i.getEpochSecond * 1000000L + i.getNano / 1000)
    case d: java.sql.Date => "us:" + (d.toLocalDate.toEpochDay * 86400000000L)
    case d: java.time.LocalDate => "us:" + (d.toEpochDay * 86400000000L)
    // collection.Seq, not the 2.13 immutable default: Spark rows hold
    // mutable.ArraySeq for ARRAY columns
    case s: scala.collection.Seq[_] => s.map(canon).mkString("[", ",", "]")
    case bd: java.math.BigDecimal => bd.toPlainString
    case bd: BigDecimal => bd.bigDecimal.toPlainString
    case other => other.toString
  }

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Evaluate cases `[0, n)` for `seed` and write `cases.jsonl` +
    * `fixture.parquet` under `outDir`. Returns (okCount, errCount). */
  def run(base: SparkSession, seed: Long, n: Int, outDir: String,
      depth: Int = 3): (Int, Int) = {
    val session = OdfSessions.newRequestSession(base)
    new File(outDir).mkdirs()
    writeAndRegisterFixture(session, outDir)
    // explicit UTF-8: FileWriter's platform default mangles the unicode
    // fixture strings on an ASCII-locale JVM
    val w = new BufferedWriter(new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(s"$outDir/cases.jsonl"),
      java.nio.charset.StandardCharsets.UTF_8))
    var ok = 0; var err = 0
    try {
      for (i <- 0 until n) {
        val expr = ExprGen.caseExpr(seed, i, depth)
        val (rec, isOk) = scalarRecord(session, i, expr)
        if (isOk) ok += 1 else err += 1
        w.write(rec); w.newLine()
      }
    } finally w.close()
    (ok, err)
  }

  // --- divergence minimizer -------------------------------------------------

  /** Evaluate one scalar-case expression over the fixture view `t` on
    * `session`: Right(canon per row, id order) or Left(first error line).
    * The building block for [[shrink]] predicates — a divergence is two
    * evaluators disagreeing on the same expression. */
  def evalExpr(session: SparkSession, expr: String): Either[String, Seq[String]] =
    try {
      val df = session.sql(s"SELECT id, ($expr) AS r FROM t ORDER BY id")
      Right(df.collect().map(r => canon(r.get(1))).toSeq)
    } catch {
      case e: Throwable =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName)
          .linesIterator.take(1).mkString.take(200))
    }

  /** Paths (child-index vectors) of every operator node, paired with the
    * node — the shrink candidates. */
  private def positions(
      n: ExprGen.Node, path: Vector[Int] = Vector.empty
  ): Seq[(Vector[Int], ExprGen.OpNode)] = n match {
    case op: ExprGen.OpNode =>
      (path, op) +: op.children.zipWithIndex.flatMap {
        case (c, i) => positions(c, path :+ i)
      }
    case _ => Nil
  }

  private def replaceAt(
      n: ExprGen.Node, path: Vector[Int], sub: ExprGen.Node): ExprGen.Node =
    if (path.isEmpty) sub
    else n match {
      case op: ExprGen.OpNode =>
        op.copy(children = op.children.updated(
          path.head, replaceAt(op.children(path.head), path.tail, sub)))
      case leaf => leaf
    }

  /** Greedy delta-debugging shrink (round-10 verdict item #5): repeatedly
    * try to replace each operator subtree — biggest first — with a typed
    * leaf from [[ExprGen.shrinkLeaves]] (shared-dialect spellings, so the
    * shrunk SQL replays in DuckDB verbatim); keep any replacement under
    * which `diverges` still holds; restart until a full pass accepts
    * nothing. The result is a local minimum: every remaining operator node
    * is load-bearing for the divergence. `maxChecks` bounds predicate
    * invocations (each may cost a cross-engine evaluation). */
  def shrink(
      root: ExprGen.Node,
      diverges: ExprGen.Node => Boolean,
      maxChecks: Int = 500): ExprGen.Node = {
    var cur = root
    var checks = 0
    var improved = true
    while (improved && checks < maxChecks) {
      improved = false
      val it = positions(cur).sortBy { case (_, op) => -op.internalNodes }.iterator
      while (!improved && it.hasNext) {
        val (path, op) = it.next()
        val cands = ExprGen.shrinkLeaves.getOrElse(op.ty, Seq.empty).iterator
        while (!improved && cands.hasNext && checks < maxChecks) {
          val candidate = replaceAt(cur, path, ExprGen.LeafNode(op.ty, cands.next()))
          checks += 1
          if (diverges(candidate)) { cur = candidate; improved = true }
        }
      }
    }
    cur
  }

  /** Evaluate a full SQL case (its own ORDER BY) on `session`: canon per
    * cell, or Left(first error line). */
  def evalSql(session: SparkSession, sql: String): Either[String, Seq[Seq[String]]] =
    try {
      val df = session.sql(sql)
      Right(df.collect().map(r => (0 until r.length).map(j => canon(r.get(j))).toSeq).toSeq)
    } catch {
      case e: Throwable =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName)
          .linesIterator.take(1).mkString.take(200))
    }

  /** [[shrink]] for multi-step CTE cases (the transform-model shape):
    * structural reductions first — drop a whole step, drop a column
    * rebinding, neutralize a predicate to TRUE — then the scalar shrink
    * inside each surviving expression tree. Restarts after every accepted
    * reduction; the result's remaining steps/rebindings/nodes are all
    * load-bearing for the divergence. */
  def shrinkCte(
      root: ExprGen.CteCase,
      diverges: ExprGen.CteCase => Boolean,
      maxChecks: Int = 800): ExprGen.CteCase = {
    var checks = 0
    def check(c: ExprGen.CteCase): Boolean = {
      checks += 1
      checks <= maxChecks && diverges(c)
    }
    var cur = root
    var improved = true
    while (improved && checks < maxChecks) {
      improved = false
      for (k <- cur.steps.indices if !improved) {
        val cand = cur.copy(steps = cur.steps.patch(k, Nil, 1))
        if (check(cand)) { cur = cand; improved = true }
      }
      for (k <- cur.steps.indices if !improved;
           j <- cur.steps(k).muts.indices if !improved) {
        val st = cur.steps(k)
        val cand = cur.copy(steps =
          cur.steps.updated(k, st.copy(muts = st.muts.patch(j, Nil, 1))))
        if (check(cand)) { cur = cand; improved = true }
      }
      for (k <- cur.steps.indices if !improved) {
        val st = cur.steps(k)
        if (st.pred.sql != "TRUE") {
          val cand = cur.copy(steps =
            cur.steps.updated(k, st.copy(pred = ExprGen.LeafNode(ExprGen.B, "TRUE"))))
          if (check(cand)) { cur = cand; improved = true }
        }
      }
      if (!improved) {
        for (k <- cur.steps.indices if !improved;
             j <- cur.steps(k).muts.indices if !improved) {
          val st = cur.steps(k)
          val (c0, n0) = st.muts(j)
          val shrunk = shrink(n0, n => check(cur.copy(steps =
            cur.steps.updated(k, st.copy(muts = st.muts.updated(j, (c0, n)))))),
            math.max(0, maxChecks - checks))
          if (shrunk.internalNodes < n0.internalNodes) {
            cur = cur.copy(steps =
              cur.steps.updated(k, st.copy(muts = st.muts.updated(j, (c0, shrunk)))))
            improved = true
          }
        }
      }
      // a divergence can live INSIDE a predicate (it changes which rows
      // survive) — when TRUE-neutralization was rejected, shrink the
      // predicate tree itself
      if (!improved) {
        for (k <- cur.steps.indices if !improved) {
          val st = cur.steps(k)
          if (st.pred.internalNodes > 0) {
            val shrunk = shrink(st.pred, n => check(cur.copy(steps =
              cur.steps.updated(k, st.copy(pred = n)))),
              math.max(0, maxChecks - checks))
            if (shrunk.internalNodes < st.pred.internalNodes) {
              cur = cur.copy(steps = cur.steps.updated(k, st.copy(pred = shrunk)))
              improved = true
            }
          }
        }
      }
    }
    cur
  }

  /** One scalar-case JSON record in the `cases.jsonl` shape (shared by
    * [[run]] and the shrink replay tool). */
  private[fuzz] def scalarRecord(session: SparkSession, i: Int, expr: String): (String, Boolean) =
    try {
      val df = session.sql(s"SELECT id, ($expr) AS r FROM t ORDER BY id")
      val ty = df.schema.fields(1).dataType.sql
      val rows = df.collect().map(r => "\"" + jsonEscape(canon(r.get(1))) + "\"")
      (s"""{"i":$i,"expr":"${jsonEscape(expr)}","ok":true,"ty":"${jsonEscape(ty)}","rows":[${rows.mkString(",")}]}""",
        true)
    } catch {
      case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator
          .take(1).mkString.take(200)
        (s"""{"i":$i,"expr":"${jsonEscape(expr)}","ok":false,"err":"${jsonEscape(msg)}"}""",
          false)
    }

  /** Aggregate-case twin of [[run]]: evaluates [[ExprGen.aggCaseSql]]
    * GROUP BY queries and dumps full-SQL records (`"sql"` field + one
    * `"tys"` entry and canon cell per output column) that
    * tools/fuzz_check.py replays verbatim — grouped rows are made
    * comparable row-by-row by the ORDER BY the generator embeds. */
  def runAgg(base: SparkSession, seed: Long, n: Int, outDir: String): (Int, Int) =
    runFullSql(base, seed, n, outDir, (s, i) => { val q = ExprGen.aggCaseSql(s, i); (q, q) })

  /** Window-function twin: [[ExprGen.windowCaseSql]] cases (ranking /
    * offset / framed-aggregate windows over deterministic ORDER BY
    * specs), same record shape as [[runAgg]]. */
  def runWin(base: SparkSession, seed: Long, n: Int, outDir: String): (Int, Int) =
    runFullSql(base, seed, n, outDir, (s, i) => { val q = ExprGen.windowCaseSql(s, i); (q, q) })

  /** Relational-shape twin: [[ExprGen.relCaseSql]] joins / set ops /
    * sort-limit / distinct — shared SQL text, same record shape. */
  def runRel(base: SparkSession, seed: Long, n: Int, outDir: String): (Int, Int) =
    runFullSql(base, seed, n, outDir, (s, i) => { val q = ExprGen.relCaseSql(s, i); (q, q) })

  /** Multi-step CTE twin: [[ExprGen.cteCaseSql]] chained views — the
    * reference's transform model shape, shared SQL text. */
  def runCte(base: SparkSession, seed: Long, n: Int, outDir: String): (Int, Int) =
    runFullSql(base, seed, n, outDir, (s, i) => { val q = ExprGen.cteCaseSql(s, i); (q, q) })

  /** Decimal/interval twin: [[ExprGen.decCaseSql]] DECIMAL(p,s) arithmetic
    * and INTERVAL timestamp shifts — shared SQL text. */
  def runDec(base: SparkSession, seed: Long, n: Int, outDir: String): (Int, Int) =
    runFullSql(base, seed, n, outDir, (s, i) => { val q = ExprGen.decCaseSql(s, i); (q, q) })

  /** Subquery twin: [[ExprGen.subqCaseSql]] [NOT] IN / correlated /
    * scalar-aggregate / derived-table shapes — shared SQL text; the
    * three-valued-logic corner the relational mode's EXISTS cases miss. */
  def runSubq(base: SparkSession, seed: Long, n: Int, outDir: String): (Int, Int) =
    runFullSql(base, seed, n, outDir, (s, i) => { val q = ExprGen.subqCaseSql(s, i); (q, q) })

  /** JSON twin: [[ExprGen.jsonCaseSql]] PAIRED cases — DuckDB's JSON
    * function surface differs, so each record carries its own mapped
    * `duck_sql` replay text. */
  def runJson(base: SparkSession, seed: Long, n: Int, outDir: String): (Int, Int) =
    runFullSql(base, seed, n, outDir, ExprGen.jsonCaseSql)

  /** Higher-order-function twin: [[ExprGen.hofCaseSql]] PAIRED cases —
    * Spark lambda HOFs vs their DuckDB list-function mirrors, the
    * equivalence layer the inventory's oracle translations rely on. */
  def runHof(base: SparkSession, seed: Long, n: Int, outDir: String): (Int, Int) =
    runFullSql(base, seed, n, outDir, ExprGen.hofCaseSql)

  private def runFullSql(
      base: SparkSession, seed: Long, n: Int, outDir: String,
      caseSql: (Long, Int) => (String, String)): (Int, Int) = {
    val session = OdfSessions.newRequestSession(base)
    new File(outDir).mkdirs()
    writeAndRegisterFixture(session, outDir)
    val w = new BufferedWriter(new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(s"$outDir/cases.jsonl"),
      java.nio.charset.StandardCharsets.UTF_8))
    var ok = 0; var err = 0
    try {
      for (i <- 0 until n) {
        val (sql, duckSql) = caseSql(seed, i)
        val duckField =
          if (duckSql == sql) "" else s""","duck_sql":"${jsonEscape(duckSql)}""""
        val rec =
          try {
            val df = session.sql(sql)
            val tys = df.schema.fields
              .map(f => "\"" + jsonEscape(f.dataType.sql) + "\"").mkString(",")
            val rows = df.collect().map(r =>
              (0 until r.length)
                .map(j => "\"" + jsonEscape(canon(r.get(j))) + "\"")
                .mkString("[", ",", "]"))
            ok += 1
            s"""{"i":$i,"sql":"${jsonEscape(sql)}"$duckField,"ok":true,"tys":[$tys],"rows":[${rows.mkString(",")}]}"""
          } catch {
            case e: Throwable =>
              err += 1
              val msg = Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator
                .take(1).mkString.take(200)
              s"""{"i":$i,"sql":"${jsonEscape(sql)}"$duckField,"ok":false,"err":"${jsonEscape(msg)}"}"""
          }
        w.write(rec); w.newLine()
      }
    } finally w.close()
    (ok, err)
  }
}

/** Manual divergence-shrink entry point:
  * `runMain graft.fuzz.FuzzShrink <outDir> <seed> <i> [depth]`
  *
  * Reconstructs scalar case `i` of `seed` as a tree and delta-debugs it
  * against DuckDB: the divergence predicate writes a one-case
  * `cases.jsonl` (under `<outDir>/shrink-work/`, so a sweep's dump in
  * `outDir` is never clobbered) and invokes tools/fuzz_check.py, so the
  * shrink uses the EXACT comparator that flagged the case — tolerances,
  * canon forms and both-error agreement included. A comparator run that
  * produced no summary line (missing duckdb module, wrong cwd, crash)
  * ABORTS the shrink instead of counting as a divergence — otherwise
  * every candidate would "diverge" and the tool would fabricate a bogus
  * single-leaf minimum. Prints the minimal SQL. Use when a sweep reports
  * a diverging case index; each step costs one python/DuckDB round trip. */
object FuzzShrink {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val seed = args(1).toLong
    val caseI = args(2).toInt
    val depth = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = OdfSessions.configureBase(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-fuzz-shrink").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val session = OdfSessions.newRequestSession(spark)
    val workDir = s"$outDir/shrink-work"
    new File(workDir).mkdirs()
    FuzzHarness.writeAndRegisterFixture(session, workDir)

    def divergesInDuck(n: ExprGen.Node): Boolean = {
      val w = new BufferedWriter(new java.io.OutputStreamWriter(
        new java.io.FileOutputStream(s"$workDir/cases.jsonl"),
        java.nio.charset.StandardCharsets.UTF_8))
      try { w.write(FuzzHarness.scalarRecord(session, 0, n.sql)._1); w.newLine() }
      finally w.close()
      val out = new StringBuilder
      val rc = scala.sys.process.Process(
        Seq("python3", "tools/fuzz_check.py", workDir, "--max-print", "0"),
        new File("."))
        .!(scala.sys.process.ProcessLogger(
          l => out.append(l).append('\n'), l => out.append(l).append('\n')))
      if (!out.toString.contains("[fuzz-check]"))
        sys.error(s"comparator did not run (rc=$rc) — fix the environment " +
          s"(python3+duckdb on PATH, run from the repo root):\n$out")
      rc != 0
    }

    val tree = ExprGen.caseTree(seed, caseI, depth)
    println(s"[shrink] case $caseI of seed $seed (${tree.internalNodes} op nodes):\n  ${tree.sql}")
    if (!divergesInDuck(tree)) println("[shrink] case does not diverge — nothing to do")
    else {
      val minimal = FuzzHarness.shrink(tree, divergesInDuck)
      println(s"[shrink] minimal (${minimal.internalNodes} op nodes):\n  ${minimal.sql}")
    }
    spark.stop()
  }
}

/** Manual sweep entry point:
  * `runMain graft.fuzz.FuzzDump <outDir> [seed] [n] [scalar|agg|win|json|rel|cte|dec|hof|subq] [depth]`
  * (depth applies to scalar mode; 3 default, 4-5 for stress sweeps). */
object FuzzDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/fuzz")
    val seed = args.lift(1).map(_.toLong).getOrElse(20260813L)
    val n = args.lift(2).map(_.toInt).getOrElse(2000)
    val mode = args.lift(3).getOrElse("scalar")
    val depth = args.lift(4).map(_.toInt).getOrElse(3)
    val spark = OdfSessions.configureBase(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-fuzz").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val (ok, err) = mode match {
      case "agg" => FuzzHarness.runAgg(spark, seed, n, outDir)
      case "win" => FuzzHarness.runWin(spark, seed, n, outDir)
      case "json" => FuzzHarness.runJson(spark, seed, n, outDir)
      case "rel" => FuzzHarness.runRel(spark, seed, n, outDir)
      case "cte" => FuzzHarness.runCte(spark, seed, n, outDir)
      case "dec" => FuzzHarness.runDec(spark, seed, n, outDir)
      case "hof" => FuzzHarness.runHof(spark, seed, n, outDir)
      case "subq" => FuzzHarness.runSubq(spark, seed, n, outDir)
      case _ => FuzzHarness.run(spark, seed, n, outDir, depth)
    }
    println(f"[fuzz] $n $mode cases (seed $seed): $ok evaluated, $err engine errors, " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s -> $outDir/cases.jsonl")
    spark.stop()
  }
}
