package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Name-compatibility layer for the JSON scalar functions the reference
  * engine registers into its SQL dialect (/root/reference/src/engine.rs:51,
  * Cargo.toml:28 — `datafusion-functions-json`): `json_get_str`,
  * `json_get_int`, `json_get_float`, `json_get_bool`, `json_get_json`,
  * `json_as_text`, `json_contains`, `json_length`.
  *
  * Built as expression builders over Spark's native, codegen'd
  * [[GetJsonObject]] (+ `Cast`), not UDFs — the whole call stays inside
  * whole-stage codegen (SURVEY.md §4.3).
  *
  * Semantics matched to the reference's exercised behavior:
  * `json_get_int('{"foo": 123}', 'foo') → 123L`
  * (/root/reference/tests/tests/test_transform.rs:724-756). Paths support
  * multiple keys — string keys become `.key` segments, integer keys become
  * `[idx]` array segments, and non-literal key expressions are composed with
  * `concat` so dynamic paths still work.
  *
  * The typed getters cast with TRY semantics: Spark 4 runs ANSI-on by
  * default, where a plain Cast of a non-numeric JSON value would throw
  * mid-query; the reference's `datafusion-functions-json` returns NULL on a
  * type mismatch, so these must too. `json_contains` tests KEY EXISTENCE
  * (object-key membership / array-index bounds on the parent), not value
  * non-nullness — a key holding JSON `null` still exists.
  */
object JsonFunctions {

  private[graft] val JsonNullUtf8: org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString("null")

  /** Maps GetJsonObject's 4-char rendering of a JSON `null` to SQL NULL,
    * evaluating the child exactly once. The earlier `NullIf(e, 'null')` form
    * is RuntimeReplaceable-expanded by Catalyst to `If(EqualTo(e, 'null'),
    * NULL, e)`, duplicating the GetJsonObject subtree — every extraction
    * parsed the document twice when subexpression elimination didn't fuse
    * them (measured +32% on q_json_funcs at sf0.1). */
  private[graft] case class JsonNullToSqlNull(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = child.dataType
    override def nullable: Boolean = true
    override protected def nullSafeEval(v: Any): Any =
      if (JsonNullUtf8.equals(v)) null else v
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val lit = ctx.addReferenceObj("jsonNullLit", JsonNullUtf8)
        s"""
           |if ($lit.equals($c)) { ${ev.isNull} = true; } else { ${ev.value} = $c; }
           |""".stripMargin
      })
    override protected def withNewChildInternal(c: Expression): JsonNullToSqlNull =
      copy(child = c)
  }

  private def jsonPath(keys: Seq[Expression]): Expression = {
    val segments = keys.map { k =>
      k.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          Concat(Seq(Literal("["), Cast(k, StringType), Literal("]")))
        case _ =>
          Concat(Seq(Literal("."), Cast(k, StringType)))
      }
    }
    Concat(Literal("$") +: segments)
  }

  /** Path extraction with DataFusion's JSON-null semantics: a path landing
    * on a JSON `null` yields SQL NULL (datafusion-functions-json's getters
    * return None for the null variant; DuckDB agrees), but Spark's
    * GetJsonObject renders a null ARRAY ELEMENT as the 4-char string
    * 'null' — found by the JSON differential fuzzer. [[JsonNullToSqlNull]]
    * folds it with a single child evaluation.
    * Known corner (pinned): a JSON STRING value "null" is
    * indistinguishable from a JSON null in GetJsonObject's output, so it
    * also maps to SQL NULL here — DataFusion would return the text. */
  private def get(args: Seq[Expression]): Expression =
    JsonNullToSqlNull(GetJsonObject(args.head, jsonPath(args.tail)))

  /** Key existence on the parent container: object-key membership for string
    * keys, index-in-bounds for integer keys. `get_json_object` cannot be used
    * here — it returns NULL both for a missing key and for a key holding JSON
    * null, and the reference distinguishes the two. */
  private def contains(args: Seq[Expression]): Expression = {
    val parent = GetJsonObject(args.head, jsonPath(args.tail.dropRight(1)))
    val last = args.last
    val exists = last.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val idx = Cast(last, LongType)
        And(
          GreaterThanOrEqual(idx, Literal(0L)),
          LessThan(idx, Cast(LengthOfJsonArray(parent), LongType)))
      case _ =>
        ArrayContains(JsonObjectKeys(parent), Cast(last, StringType))
    }
    Coalesce(Seq(exists, Literal(false)))
  }

  private[graft] def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "json_get" -> (args => get(args)),
    "json_get_str" -> (args => get(args)),
    "json_as_text" -> (args => get(args)),
    "json_get_json" -> (args => get(args)),
    "json_get_int" -> (args => Cast(get(args), LongType, None, EvalMode.TRY)),
    "json_get_float" -> (args => Cast(get(args), DoubleType, None, EvalMode.TRY)),
    "json_get_bool" -> (args => Cast(get(args), BooleanType, None, EvalMode.TRY)),
    "json_contains" -> (args => contains(args)),
    "json_length" -> { args =>
      val g = get(args)
      Coalesce(Seq(
        Cast(LengthOfJsonArray(g), LongType),
        Cast(Size(JsonObjectKeys(g)), LongType),
      ))
    },
  )

  /** Register all functions into the session's (temp) function registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
