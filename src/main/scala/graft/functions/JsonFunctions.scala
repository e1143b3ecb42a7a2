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
    * 'null' — found by the JSON differential fuzzer. The NullIf folds it.
    * Known corner (pinned): a JSON STRING value "null" is
    * indistinguishable from a JSON null in GetJsonObject's output, so it
    * also maps to SQL NULL here — DataFusion would return the text. */
  private def get(args: Seq[Expression]): Expression =
    new NullIf(GetJsonObject(args.head, jsonPath(args.tail)), Literal("null"))

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
