package graft.odf

import scala.annotation.tailrec

/** DataFusion-dialect `->` / `->>` JSON operator support.
  *
  * The reference registers `datafusion-functions-json`
  * (/root/reference/src/engine.rs:51, Cargo.toml:28), which besides the
  * `json_*` scalar names also installs the PostgreSQL-style JSON access
  * operators: `expr -> key` (≡ `json_get(expr, key)`) and `expr ->> key`
  * (≡ `json_as_text(expr, key)`). Spark's parser has no pluggable binary
  * operators, so a transform written as `data->>'foo'` would die in
  * `spark.sql` with a parse error. Rather than fork the parser, we rewrite
  * the SQL *text* before parsing — the rewritten call sites resolve to the
  * codegen'd builders in [[graft.functions.JsonFunctions]], so the plan is
  * identical to one written with the function names directly.
  *
  * The rewrite is token-level and literal-safe: a lexer that understands
  * single-quoted strings (with `''` escapes), double-quoted and backtick
  * identifiers, `--` line comments and bracketed comments guarantees a `->`
  * inside any of those is never touched. Operand extents follow PostgreSQL
  * precedence for these operators (they bind tighter than any other binary
  * operator):
  *   - left operand: a primary — identifier / literal / closing-paren group —
  *     extended left through qualified-name dots and a preceding function
  *     name, e.g. `t.data`, `json_get(x, 'a')`, `(…)`.
  *   - right operand: a primary — literal / identifier / parenthesized
  *     expression / function call.
  * Chains (`a -> 'b' ->> 'c'`) resolve by iterating left-to-right: after one
  * rewrite the next operator's left neighbor is the new `)`, which groups
  * correctly.
  */
object JsonOperatorRewrite {

  /** A lexical token: its [start, end) extent in the source text and whether
    * it can serve as an operand primary (identifier/literal/quoted). */
  private final case class Tok(start: Int, end: Int, kind: Char)
  // kinds: 'i' identifier/quoted-ident, 's' string literal, 'n' number,
  //        '(' , ')', '[' , ']', '.', 'a' arrow ->, 'A' arrow ->>,
  //        'o' other operator/punct, 'c' comment/whitespace (skipped)

  private def lex(sql: String): Vector[Tok] = {
    val toks = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val close = sql.indexOf("*/", i + 2)
        i = if (close < 0) n else close + 2
      } else if (c == '\'') {
        val start = i; i += 1
        var done = false
        while (!done && i < n) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') i += 2 // '' escape
            else { i += 1; done = true }
          } else i += 1
        }
        toks += Tok(start, i, 's')
      } else if (c == '"' || c == '`') {
        val start = i; i += 1
        while (i < n && sql.charAt(i) != c) i += 1
        i = math.min(i + 1, n)
        toks += Tok(start, i, 'i')
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '>') {
        if (i + 2 < n && sql.charAt(i + 2) == '>') { toks += Tok(i, i + 3, 'A'); i += 3 }
        else { toks += Tok(i, i + 2, 'a'); i += 2 }
      } else if (c.isDigit) {
        val start = i
        while (i < n && (sql.charAt(i).isDigit || sql.charAt(i) == '.')) i += 1
        toks += Tok(start, i, 'n')
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
        toks += Tok(start, i, 'i')
      } else if (c == '(' || c == ')' || c == '[' || c == ']' || c == '.') {
        toks += Tok(i, i + 1, c); i += 1
      } else {
        toks += Tok(i, i + 1, 'o'); i += 1
      }
    }
    toks.result()
  }

  /** Index of the first token of the left operand ending at token `at-1`. */
  private def leftOperandStart(toks: Vector[Tok], at: Int): Option[Int] = {
    var i = at - 1
    if (i < 0) return None
    toks(i).kind match {
      case ')' | ']' =>
        val close = toks(i).kind
        val open = if (close == ')') '(' else '['
        var depth = 1
        i -= 1
        while (i >= 0 && depth > 0) {
          if (toks(i).kind == close) depth += 1
          else if (toks(i).kind == open) depth -= 1
          if (depth > 0) i -= 1
        }
        if (i < 0) None
        else {
          // function call / array index: include the name before '('/'['
          var s = i
          if (s - 1 >= 0 && toks(s - 1).kind == 'i') s -= 1
          Some(extendQualified(toks, s))
        }
      case 'i' | 's' | 'n' => Some(extendQualified(toks, i))
      case _ => None
    }
  }

  /** Extend a primary leftwards through `a.b.c` qualified chains. */
  @tailrec
  private def extendQualified(toks: Vector[Tok], s: Int): Int =
    if (s - 2 >= 0 && toks(s - 1).kind == '.' && toks(s - 2).kind == 'i')
      extendQualified(toks, s - 2)
    else s

  /** Index one past the last token of the right operand starting at `at+1`. */
  private def rightOperandEnd(toks: Vector[Tok], at: Int): Option[Int] = {
    var i = at + 1
    if (i >= toks.length) return None
    // unary minus on a numeric literal
    if (toks(i).kind == 'o' && i + 1 < toks.length && toks(i + 1).kind == 'n') i += 1
    toks(i).kind match {
      case 's' | 'n' => Some(i + 1)
      case 'i' =>
        if (i + 1 < toks.length && toks(i + 1).kind == '(') Some(closeGroup(toks, i + 1))
        else Some(i + 1)
      case '(' => Some(closeGroup(toks, i))
      case _ => None
    }
  }

  /** Given the index of a '(' token, return one past its matching ')'. */
  private def closeGroup(toks: Vector[Tok], open: Int): Int = {
    var depth = 0
    var i = open
    while (i < toks.length) {
      if (toks(i).kind == '(') depth += 1
      else if (toks(i).kind == ')') { depth -= 1; if (depth == 0) return i + 1 }
      i += 1
    }
    toks.length
  }

  /** Rewrite every `->` / `->>` into its function-call form. Unrewritable
    * occurrences (no valid operand on either side) are left as-is and will
    * surface as a parse error with the user's original text — same failure
    * the reference's parser would produce for a malformed operator. */
  def rewrite(sql: String): String = {
    var cur = sql
    var guard = 0
    var changed = true
    while (changed && guard < 10000) {
      changed = false
      guard += 1
      val toks = lex(cur)
      val at = toks.indexWhere(t => t.kind == 'a' || t.kind == 'A')
      if (at >= 0) {
        val fn = if (toks(at).kind == 'A') "json_as_text" else "json_get"
        (leftOperandStart(toks, at), rightOperandEnd(toks, at)) match {
          case (Some(ls), Some(re)) =>
            val lhs = cur.substring(toks(ls).start, toks(at - 1).end)
            val rhs = cur.substring(toks(at + 1).start, toks(re - 1).end)
            cur = cur.substring(0, toks(ls).start) +
              s"$fn($lhs, $rhs)" +
              cur.substring(toks(re - 1).end)
            changed = true
          case _ => // leave malformed occurrence; stop to avoid respinning on it
        }
      }
    }
    cur
  }

  /** Fast path: only lex/rewrite when the operator can possibly occur. */
  def apply(sql: String): String =
    if (sql.contains("->")) rewrite(sql) else sql
}
