package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Scalar-function surface: string, regex, crypto/hash, encoding, date/time,
  * math, JSON, and the batch shape of tumbling-window time bucketing
  * (SURVEY.md §2.B rows "String functions" … "JSON functions").
  *
  * Everything here is a builtin `org.apache.spark.sql.functions` call —
  * whole-stage-codegen'd, no UDFs. The JSON query goes through the
  * engine's DataFusion-name-compatible registered functions
  * (graft.functions.JsonFunctions) to exercise that layer end-to-end.
  */
object Functions {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_string_funcs",
      (s, dir) => {
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("up"),
            lower(col("p_type")).as("lo"),
            length(col("p_name")).as("len"),
            substring(col("p_name"), 1, 5).as("sub5"),
            concat(col("p_brand"), lit(":"), col("p_type")).as("cat"),
            lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
            reverse(col("p_name")).as("rev"),
            translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
            trim(lit("  x  ")).as("trimmed"),
            element_at(split(col("p_name"), " "), 1).as("first_word"),
            regexp_replace(col("p_name"), " ", "_").as("snake"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
             |  upper(p_name) AS up, lower(p_type) AS lo, CAST(length(p_name) AS INT) AS len,
             |  substring(p_name, 1, 5) AS sub5,
             |  p_brand || ':' || p_type AS cat,
             |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
             |  reverse(p_name) AS rev,
             |  translate(p_name, 'aeiou', 'AEIOU') AS tr,
             |  trim('  x  ') AS trimmed,
             |  string_split(p_name, ' ')[1] AS first_word,
             |  replace(p_name, ' ', '_') AS snake
             |FROM part ORDER BY p_partkey""".stripMargin),
    ),

    QueryDef(
      "q_regex_funcs",
      (s, dir) => {
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
            regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
            col("p_name").rlike("^(red|blue)").as("is_colored"),
            regexp_replace(col("p_name"), "[aeiou]", "*").as("starred"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
             |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
             |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
             |  regexp_matches(p_name, '^(red|blue)') AS is_colored,
             |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred
             |FROM part ORDER BY p_partkey""".stripMargin),
    ),

    QueryDef(
      "q_hash_funcs",
      (s, dir) => {
        t(s, dir, "customer")
          .filter(col("c_custkey") < 300)
          .select(
            col("c_custkey"),
            md5(col("c_name").cast("binary")).as("name_md5"),
            sha2(col("c_name").cast("binary"), 256).as("name_sha256"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, md5(c_name) AS name_md5, sha256(c_name) AS name_sha256
             |FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""".stripMargin),
    ),

    QueryDef(
      "q_encoding_funcs",
      (s, dir) => {
        t(s, dir, "customer")
          .filter(col("c_custkey") < 300)
          .select(
            col("c_custkey"),
            base64(col("c_name").cast("binary")).as("b64"),
            lower(hex(col("c_name").cast("binary"))).as("hx"),
            // decode(unbase64(...)) round-trip proves the inverse pair
            decode(unbase64(base64(col("c_name").cast("binary"))), "UTF-8").as("roundtrip"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
             |  to_base64(c_name::BLOB) AS b64,
             |  lower(hex(c_name)) AS hx,
             |  c_name AS roundtrip
             |FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""".stripMargin),
    ),

    QueryDef(
      "q_datetime_funcs",
      (s, dir) => {
        t(s, dir, "orders")
          .filter(col("o_custkey") < 300)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dom"),
            (dayofweek(col("o_orderdate")) - 1).as("dow"),
            quarter(col("o_orderdate")).as("qtr"),
            date_trunc("month", col("o_orderdate")).cast("date").cast("string").as("month_start"),
            date_add(col("o_orderdate").cast("date"), 30).cast("string").as("plus30"),
            datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
            last_day(col("o_orderdate").cast("date")).cast("string").as("month_end"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
             |  CAST(dayofmonth(o_orderdate) AS INT) AS dom,
             |  CAST(dayofweek(o_orderdate) AS INT) AS dow,
             |  CAST(quarter(o_orderdate) AS INT) AS qtr,
             |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
             |  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS plus30,
             |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
             |  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
             |FROM orders WHERE o_custkey < 300 ORDER BY o_orderkey""".stripMargin),
    ),

    QueryDef(
      "q_math_funcs",
      (s, dir) => {
        t(s, dir, "orders")
          .filter(col("o_custkey") < 300)
          .select(
            col("o_orderkey"),
            abs(col("o_totalprice") * -1).as("abs_price"),
            ceil(col("o_totalprice")).as("ceil_price"),
            floor(col("o_totalprice")).as("floor_price"),
            round(col("o_totalprice"), 1).as("round_price"),
            sqrt(col("o_totalprice")).as("sqrt_price"),
            (col("o_orderkey") % 7).as("mod7"),
            signum(col("o_totalprice") - 250000).cast("int").as("sign_vs_avg"),
            round(log(col("o_totalprice")), 4).as("ln_price"),
            round(log10(col("o_totalprice")), 4).as("log10_price"),
            round(exp(col("o_totalprice") / 100000.0), 4).as("exp_scaled"),
            round(pow(col("o_totalprice"), 2), 2).as("price_sq"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |  abs(o_totalprice * -1) AS abs_price,
             |  CAST(ceil(o_totalprice) AS BIGINT) AS ceil_price,
             |  CAST(floor(o_totalprice) AS BIGINT) AS floor_price,
             |  round(o_totalprice, 1) AS round_price,
             |  sqrt(o_totalprice) AS sqrt_price,
             |  o_orderkey % 7 AS mod7,
             |  CAST(sign(o_totalprice - 250000) AS INT) AS sign_vs_avg,
             |  round(ln(o_totalprice), 4) AS ln_price,
             |  round(log10(o_totalprice), 4) AS log10_price,
             |  round(exp(o_totalprice / 100000.0), 4) AS exp_scaled,
             |  round(power(o_totalprice, 2), 2) AS price_sq
             |FROM orders WHERE o_custkey < 300 ORDER BY o_orderkey""".stripMargin),
    ),

    QueryDef(
      "q_json_funcs",
      // Goes through the engine's DataFusion-name JSON layer (json_get_int →
      // GetJsonObject+Cast expression builders, codegen preserved).
      (s, dir) => {
        graft.functions.JsonFunctions.register(s)
        t(s, dir, "events")
          .select(
            col("event_id"),
            expr("json_get_int(props, 'k')").as("k"),
            get_json_object(col("props"), "$.k").as("k_str"))
          .filter(col("k") > 90)
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             |  json_extract_string(props, '$.k') AS k_str
             |FROM events
             |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
             |ORDER BY event_id""".stripMargin),
    ),

    QueryDef(
      "q_sessionize_batch",
      // Gap-based sessionization in batch SQL: a session starts when the
      // user's gap since the previous event exceeds 30 min; session id =
      // running count of session starts. The batch twin of the streaming
      // flatMapGroupsWithState sessionizer (graft.streaming).
      // KEY-CARDINALITY CONTRACT: the per-user window sorts one user's
      // history on one task — fine for real user_ids (bounded per-key
      // history), NOT for a key with a degenerate hot value (bot/sentinel
      // ids). For those, pre-split the hot key on a coarse time segment
      // and stitch sessions across boundaries (asofBackward's carry shape).
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        t(s, dir, "events")
          .filter(col("user_id") < 50)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"))
          .withColumn("new_s",
            when(col("ts_us") - lag(col("ts_us"), 1).over(
              Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))) > 1800000000L, 1)
              .otherwise(0))
          .withColumn("sid", sum(col("new_s")).over(
            Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sid").cast("int").as("sid"))
          .agg(
            count(lit(1)).as("n_events"),
            min(col("ts_us")).as("start_us"),
            max(col("ts_us")).as("end_us"),
            ((max(col("ts_us")) - min(col("ts_us"))) / 1000000L).cast("long").as("duration_sec"))
          .orderBy(col("user_id"), col("sid"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS ts_us
             |  FROM events WHERE user_id < 50),
             |flags AS (
             |  SELECT user_id, event_id, ts_us,
             |    CASE WHEN ts_us - LAG(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
             |              > 1800000000 THEN 1 ELSE 0 END AS new_s
             |  FROM e),
             |sess AS (
             |  SELECT user_id, ts_us,
             |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM flags)
             |SELECT user_id, CAST(sid AS INT) AS sid, COUNT(*) AS n_events,
             |  MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
             |  CAST((MAX(ts_us) - MIN(ts_us)) // 1000000 AS BIGINT) AS duration_sec
             |FROM sess GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin),
    ),

    QueryDef(
      "q_approx_percentile",
      // Sketch-based percentile (the 100 TB path — bounded memory, one
      // pass). Sketch values differ across engines, so the query emits the
      // exact interpolated median plus an in-query boolean asserting the
      // sketch landed within 5% of it — hash-checkable against DuckDB while
      // still executing the sketch aggregate. NOTE: accuracy 1000 bounds
      // RANK error (≤0.1%), not value-space error; 0.1% of rank maps to
      // ≤5% of value only for distributions without extreme local density
      // gaps. The oracle's hardcoded TRUE is data-dependent, verified on
      // the driver's sf0.001–0.1 corpora (deterministic sketch, fixed data).
      (s, dir) => {
        // Sort-based exact median (r20, guide §4/§5): the exact side moved
        // off the `percentile()` value-map aggregate onto
        // Percentiles.exactPercentile (bit-identical interpolation); the
        // sketch aggregate is unchanged and still executes — the boolean
        // still derives from its output. The r19 rebalance went with the
        // value map it was spreading (driver measured it flat, 0.96).
        val base = t(s, dir, "lineitem")
        val sketch = base
          .groupBy(col("l_returnflag"))
          .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"))
        val exact = graft.operators.Percentiles.exactPercentile(
          base, col("l_returnflag"), col("l_extendedprice"), 0.5, "l_returnflag", "__em")
        sketch.join(exact, "l_returnflag")
          .select(
            col("l_returnflag"),
            round(col("__em"), 4).as("exact_median"),
            (abs(col("am") - round(col("__em"), 4)) <=
              round(col("__em"), 4) * 0.05).as("approx_within_5pct"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS exact_median,
             |  TRUE AS approx_within_5pct
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    ),

    QueryDef(
      "q_time_bucket",
      // Tumbling-window aggregation in batch shape: hourly buckets over the
      // event stream — count, distinct users, exact value sum.
      (s, dir) => {
        t(s, dir, "events")
          .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("bucket_epoch"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            dsum(col("value")).as("total_value"))
          .orderBy(col("bucket_epoch"), col("event_type"))
      },
      Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_epoch, event_type,
             |  COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
             |  CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY bucket_epoch, event_type""".stripMargin),
    ),

    QueryDef(
      "q_date_bin",
      // DataFusion-dialect date_bin through the compat layer (the name a
      // kamu transform would use), 6-hour strides — value-checked against
      // the identical epoch-microsecond floor arithmetic in DuckDB. Epoch
      // seconds on the wire, like q_time_bucket (timezone-proof).
      // Cloned session, like q_df_dialect: DataFusionCompat OVERRIDES
      // builtins (array_remove → remove-FIRST, log → log10, trunc, ...),
      // and the clone keeps those out of the shared Verify/Bench registry —
      // registering into `s` here once flipped q_bm25_topk's tf counts for
      // every query that ran after it (QueryPlansSpec "registry pure" pins this).
      (s, dir) => {
        val s2 = s.newSession()
        graft.functions.DataFusionCompat.register(s2)
        t(s2, dir, "events")
          .selectExpr("date_bin(INTERVAL '6' HOUR, ts) AS b", "value")
          .groupBy(unix_timestamp(col("b")).as("bucket_epoch"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
          .orderBy(col("bucket_epoch"))
      },
      Some("""SELECT CAST((epoch_us(CAST(ts AS TIMESTAMP))
             |        - epoch_us(CAST(ts AS TIMESTAMP)) % 21600000000) // 1000000 AS BIGINT) AS bucket_epoch,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1 ORDER BY bucket_epoch""".stripMargin),
    ),

    QueryDef(
      "q_df_dialect",
      // The wider DataFusion-dialect surface (crypto digests, Postgres-
      // lineage log10, numeric trunc, name aliases, arrow_cast) as SQL text
      // a kamu transform would submit verbatim. Runs in a cloned session so
      // the dialect OVERRIDES (log/trunc/encode/decode) never leak into the
      // shared Verify/Bench session. Oracle: DuckDB shares the Postgres
      // lineage for these (log=log10, strpos, starts_with, trunc).
      (s, dir) => {
        val s2 = s.newSession()
        graft.functions.DataFusionCompat.register(s2)
        Tables.table(s2, dir, "nation").createOrReplaceTempView("nation")
        s2.sql(
          """SELECT n_name,
            |  lower(hex(sha256(n_name))) AS sha_hex,
            |  encode(n_name, 'hex') AS name_hex,
            |  CAST(strpos(n_name, 'A') AS BIGINT) AS pos_a,
            |  starts_with(n_name, 'A') AS starts_a,
            |  substr_index(n_name, 'A', 1) AS before_a,
            |  round(log(CAST(n_nationkey + 10 AS DOUBLE)), 6) AS log10_key,
            |  trunc(CAST(n_nationkey AS DOUBLE) / 7, 2) AS trunc_div,
            |  to_unixtime(TIMESTAMP '2024-01-15 06:00:00') AS epoch_s,
            |  CAST(datepart('month', DATE '2024-03-05') AS BIGINT) AS mth,
            |  arrow_cast(n_regionkey, 'Int64') AS rk64,
            |  array_to_string(make_array(n_name, 'x'), '|') AS joined
            |FROM nation ORDER BY n_name""".stripMargin)
      },
      Some("""SELECT n_name,
             |  sha256(n_name) AS sha_hex,
             |  lower(hex(n_name)) AS name_hex,
             |  CAST(strpos(n_name, 'A') AS BIGINT) AS pos_a,
             |  starts_with(n_name, 'A') AS starts_a,
             |  split_part(n_name, 'A', 1) AS before_a,
             |  round(log(CAST(n_nationkey + 10 AS DOUBLE)), 6) AS log10_key,
             |  trunc(CAST(n_nationkey AS DOUBLE) / 7 * 100) / 100 AS trunc_div,
             |  CAST(epoch(TIMESTAMP '2024-01-15 06:00:00') AS BIGINT) AS epoch_s,
             |  CAST(datepart('month', DATE '2024-03-05') AS BIGINT) AS mth,
             |  CAST(n_regionkey AS BIGINT) AS rk64,
             |  array_to_string([n_name, 'x'], '|') AS joined
             |FROM nation ORDER BY n_name""".stripMargin),
    ),

    QueryDef(
      "q_df_dialect2",
      // The DataFusion 51 scalar LONG TAIL (VERDICT r6 task #5): chrono
      // to_char, extended date_part units, the array_*/list_* family
      // (position/remove/replace/slice/pop/resize, end-exclusive range),
      // string_to_array, gcd/lcm/iszero, get_field — as SQL text a kamu
      // transform would submit verbatim, value-checked against DuckDB
      // (which shares the Postgres lineage for all of them). Cloned
      // session, like q_df_dialect, so overrides never leak.
      (s, dir) => {
        val s2 = s.newSession()
        graft.functions.DataFusionCompat.register(s2)
        Tables.table(s2, dir, "nation").createOrReplaceTempView("nation")
        s2.sql(
          """SELECT n_nationkey AS k,
            |  to_char(CAST(date_add(DATE '2024-03-01', n_nationkey * 3) AS TIMESTAMP),
            |          '%Y-%m-%d (%a)') AS tc,
            |  CAST(date_part('dow', date_add(DATE '2024-03-01', n_nationkey * 3)) AS BIGINT) AS dow,
            |  CAST(date_part('doy', date_add(DATE '2024-03-01', n_nationkey * 3)) AS BIGINT) AS doy,
            |  CAST(date_part('epoch', CAST(date_add(DATE '2024-03-01', n_nationkey * 3) AS TIMESTAMP)) AS DOUBLE) AS ep,
            |  CAST(date_part('millisecond', TIMESTAMP '2024-01-01 00:01:30.25') AS DOUBLE) AS ms,
            |  array_position(make_array(n_nationkey, n_nationkey + 1, n_nationkey + 2, n_nationkey + 1),
            |                 n_nationkey + 1) AS ap_hit,
            |  array_position(make_array(n_nationkey, n_nationkey + 1), -1) AS ap_miss,
            |  array_to_string(array_remove(
            |    make_array(n_nationkey, n_nationkey + 1, n_nationkey + 2, n_nationkey + 1),
            |    n_nationkey + 1), ',') AS rm_first,
            |  array_to_string(array_replace_all(
            |    make_array(n_nationkey, n_nationkey + 1, n_nationkey + 2, n_nationkey + 1),
            |    n_nationkey + 1, 0), ',') AS rp_all,
            |  array_to_string(array_slice(
            |    make_array(n_nationkey, n_nationkey + 1, n_nationkey + 2, n_nationkey + 1), 2, 3), ',') AS sl,
            |  array_to_string(array_pop_back(
            |    make_array(n_nationkey, n_nationkey + 1, n_nationkey + 2)), ',') AS pb,
            |  array_to_string(array_pop_front(
            |    make_array(n_nationkey, n_nationkey + 1, n_nationkey + 2)), ',') AS pf,
            |  array_to_string(array_resize(
            |    make_array(n_nationkey, n_nationkey + 1), 4, 0), ',') AS rz,
            |  array_to_string(list_append(make_array(n_nationkey, n_nationkey + 1), 9), ',') AS apnd,
            |  array_to_string(array_prepend(-1, make_array(n_nationkey, n_nationkey + 1)), ',') AS prep,
            |  array_to_string(range(0, pmod(n_nationkey, 4) + 2), ',') AS rng,
            |  array_to_string(generate_series(1, 3), ',') AS gs,
            |  array_to_string(string_to_array(n_name, 'A'), '|') AS sta,
            |  array_ndims(make_array(n_nationkey)) AS nd,
            |  array_to_string(array_dims(make_array(n_nationkey, n_nationkey + 1)), ',') AS dims,
            |  array_empty(array_slice(make_array(n_nationkey), 3, 2)) AS emp,
            |  gcd(n_nationkey, 12) AS g,
            |  lcm(n_nationkey, 4) AS l,
            |  iszero(CAST(pmod(n_nationkey, 5) AS DOUBLE)) AS iz,
            |  get_field(named_struct('a', n_regionkey), 'a') AS gf
            |FROM nation ORDER BY k""".stripMargin)
      },
      Some("""WITH n AS (
             |  SELECT n_nationkey, n_name, n_regionkey,
             |    DATE '2024-03-01' + CAST(n_nationkey * 3 AS INT) AS d,
             |    [n_nationkey, n_nationkey + 1, n_nationkey + 2, n_nationkey + 1] AS a
             |  FROM nation)
             |SELECT n_nationkey AS k,
             |  strftime(CAST(d AS TIMESTAMP), '%Y-%m-%d (%a)') AS tc,
             |  CAST(date_part('dow', d) AS BIGINT) AS dow,
             |  CAST(date_part('doy', d) AS BIGINT) AS doy,
             |  CAST(date_part('epoch', CAST(d AS TIMESTAMP)) AS DOUBLE) AS ep,
             |  CAST(date_part('millisecond', TIMESTAMP '2024-01-01 00:01:30.25') AS DOUBLE) AS ms,
             |  CAST(list_position(a, n_nationkey + 1) AS BIGINT) AS ap_hit,
             |  CAST(NULLIF(list_position([n_nationkey, n_nationkey + 1], -1), 0) AS BIGINT) AS ap_miss,
             |  array_to_string(list_concat(a[1:1], a[3:]), ',') AS rm_first,
             |  array_to_string(list_transform(a, x -> CASE WHEN x = n_nationkey + 1 THEN 0 ELSE x END), ',') AS rp_all,
             |  array_to_string(a[2:3], ',') AS sl,
             |  array_to_string([n_nationkey, n_nationkey + 1], ',') AS pb,
             |  array_to_string([n_nationkey + 1, n_nationkey + 2], ',') AS pf,
             |  array_to_string([n_nationkey, n_nationkey + 1, 0, 0], ',') AS rz,
             |  array_to_string([n_nationkey, n_nationkey + 1, 9], ',') AS apnd,
             |  array_to_string([-1, n_nationkey, n_nationkey + 1], ',') AS prep,
             |  array_to_string(range(0, (n_nationkey % 4) + 2), ',') AS rng,
             |  array_to_string(generate_series(1, 3), ',') AS gs,
             |  array_to_string(string_split(n_name, 'A'), '|') AS sta,
             |  CAST(1 AS BIGINT) AS nd,
             |  '2' AS dims,
             |  TRUE AS emp,
             |  CAST(gcd(n_nationkey, 12) AS BIGINT) AS g,
             |  CAST(lcm(n_nationkey, 4) AS BIGINT) AS l,
             |  (n_nationkey % 5 = 0) AS iz,
             |  n_regionkey AS gf
             |FROM n ORDER BY k""".stripMargin),
    ),
  )
}
