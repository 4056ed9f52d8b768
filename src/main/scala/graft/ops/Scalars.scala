package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Fns => F, QueryModule, Tables => T}

/** Scalar function catalog (q50-q56): string, date, math, conditional, null,
  * array and map/json functions.
  *
  * The reference keeps every scalar semantic implicit in its SQL strings and
  * TEXT-typed data: dates stay `yyyyMMdd` strings
  * (/root/reference/dags/patient_claims_plus_postgres.py:80-81,100-101), the
  * sex-code decode is a multi-branch CASE with a NULL->ELSE path (:182-186),
  * and absent CSV fields become NULL (:51). q51/q53/q54 replay exactly those
  * semantics on the fixture tables; the rest cover the surface any user of
  * the engine needs on this data.
  *
  * Scale notes: every query is a stateless per-row projection over one
  * parquet scan — no shuffle except the final presentation sort, column
  * pruning reaches the reader, and all functions are codegen'd built-ins
  * (no UDFs in this module). Determinism: no DecimalType outputs (Fns.od),
  * no double `round` (engines disagree on half-up vs binary rounding —
  * integer-cents arithmetic instead), `ln`/`power` outputs reduced to
  * floor-micro BIGINTs.
  */
object Scalars extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_str_funcs" -> ((s, d) =>
      T.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("name_up"),
        substring(col("p_name"), 1, 8).as("name_8"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand_trim"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_partkey").cast(StringType), 10, "0").as("key_pad"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        length(col("p_name")).cast(LongType).as("name_len"))
        .orderBy(col("p_partkey"))),

    "q51_date_funcs" -> ((s, d) =>
      // The CMS convention: dates held as yyyyMMdd TEXT (reference :80-81),
      // parsed on demand. Round-trip through the string form, then the
      // derived-date surface (datediff = length-of-stay analog).
      T.orders(s, d)
        .withColumn("ymd", F.ymd(col("o_orderdate")))
        .withColumn("parsed", to_date(col("ymd"), "yyyyMMdd"))
        .select(
          col("o_orderkey"), col("ymd"),
          F.d(col("parsed")).as("parsed_date"),
          datediff(col("parsed"), lit("1995-01-01").cast(DateType))
            .cast(LongType).as("days_since"),
          year(col("parsed")).cast(LongType).as("yr"),
          month(col("parsed")).cast(LongType).as("mo"),
          dayofmonth(col("parsed")).cast(LongType).as("dom"),
          F.d(date_add(col("parsed"), 30)).as("plus30"),
          F.d(trunc(col("parsed"), "month")).as("month_start"))
        .orderBy(col("o_orderkey"))),

    "q52_math_funcs" -> ((s, d) => {
      // All arithmetic is engine-exact: abs/floor/ceil are IEEE-exact,
      // sqrt is correctly rounded in both engines, x*x is one IEEE multiply,
      // %/rounding run on integer cents. round() on doubles is deliberately
      // absent (Spark rounds the shortest decimal repr half-up, DuckDB
      // rounds the binary value — they disagree on e.g. 2.675).
      val cents = F.cents(col("c_acctbal"))
      T.customer(s, d).select(
        col("c_custkey"),
        abs(cents).as("abs_cents"),
        floor(col("c_acctbal")).cast(LongType).as("bal_floor"),
        ceil(col("c_acctbal")).cast(LongType).as("bal_ceil"),
        F.od(sqrt(abs(col("c_acctbal")))).as("sqrt_abs"),
        F.od(col("c_acctbal") * col("c_acctbal")).as("bal_sq"),
        (cents % 97).as("mod97"),
        // round-half-up to whole currency units, in exact integer space
        expr("CAST((abs(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) + 50) DIV 100 AS BIGINT)")
          .as("abs_round_units"),
        // integer log2 via binary-string length: pure integer/string ops,
        // identical in both engines by construction — unlike ln(), where
        // Java Math.log vs libm may differ by 1 ulp and flip a floor()
        // boundary (neither is guaranteed correctly rounded)
        (length(bin(abs(cents) + 1)) - 1).cast(LongType).as("ilog2"),
        pow(cents % 10, 3).cast(LongType).as("digit_cubed"))
        .orderBy(col("c_custkey"))
    }),

    "q53_case_decode" -> ((s, d) =>
      // Standalone multi-branch decode incl. the NULL->ELSE path — the
      // reference's sex-code decode (:182-186) shape, where a join-miss NULL
      // falls through every WHEN to the ELSE.
      T.customer(s, d)
        .withColumn("seg_n", nullif(col("c_mktsegment"), lit("MACHINERY")))
        .select(
          col("c_custkey"), col("seg_n"),
          when(col("seg_n") === "BUILDING", "B")
            .when(col("seg_n") === "AUTOMOBILE", "A")
            .when(col("seg_n") === "HOUSEHOLD", "H")
            .otherwise("Unknown").as("seg_decoded"),
          when(col("c_nationkey") % 3 === 0, "zero")
            .when(col("c_nationkey") % 3 === 1, "one")
            .otherwise("two").as("nk_mod3"))
        .orderBy(col("c_custkey"))),

    "q54_null_funcs" -> ((s, d) => {
      // coalesce/nullif/nvl2-style defaulting — the reference's absent-field
      // -> '' -> NULL chain (:51, :55-56) as reusable scalar semantics.
      val cents = F.cents(col("c_acctbal"))
      T.customer(s, d)
        .withColumn("seg_n", nullif(col("c_mktsegment"), lit("BUILDING")))
        .select(
          col("c_custkey"), col("seg_n"),
          coalesce(col("seg_n"), lit("(none)")).as("seg_or_default"),
          when(col("seg_n").isNotNull, "has").otherwise("miss").as("nvl2_style"),
          nullif(cents, lit(0L)).as("cents_nz"),
          coalesce(nullif(cents, lit(0L)), lit(-1L)).as("cents_or_neg1"))
        .orderBy(col("c_custkey"))
    }),

    "q55_array_funcs" -> ((s, d) =>
      // Multimodal: the embedding ArrayType(FloatType) column through the
      // array-function surface. Element float->double widenings are exact,
      // so values are bit-identical across engines.
      T.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).cast(LongType).as("dim"),
        F.od(element_at(col("embedding"), 1)).as("e1"),
        F.od(element_at(col("embedding"), 2)).as("e2"),
        F.od(element_at(col("embedding"), 64)).as("e_last"),
        F.od(array_max(col("embedding"))).as("vmax"),
        F.od(array_min(col("embedding"))).as("vmin"),
        expr("CAST(size(filter(embedding, x -> x > 0)) AS BIGINT)").as("n_pos"),
        F.od(expr("sort_array(embedding)[1]")).as("second_smallest"),
        expr("CAST(array_position(embedding, array_max(embedding)) AS BIGINT)")
          .as("argmax"))
        .orderBy(col("vec_id"))),

    "q56_json_map" -> ((s, d) =>
      // Multimodal: events.props JSON parsing (string path + typed
      // from_json struct path) and a MapType build/lookup.
      T.events(s, d)
        .withColumn("k_str", get_json_object(col("props"), "$.k"))
        .withColumn("k_int", col("k_str").cast(LongType))
        .select(
          col("event_id"), col("k_str"), col("k_int"),
          col("k_str").isNotNull.as("has_k"),
          from_json(col("props"), StructType(Seq(StructField("k", LongType))))
            .getField("k").as("k_struct"),
          element_at(map(lit("k"), col("k_int")), "k").as("k_map"))
        .orderBy(col("event_id"))),

    "q107_json_variant" -> ((s, d) =>
      // The VARIANT path (Spark 4's open semi-structured type, the
      // engine-native alternative to q56's per-path string extraction):
      // parse each props JSON ONCE into a variant, then typed
      // variant_get extractions, schema_of_variant introspection, and an
      // is_variant_null/try_variant_get miss probe. At 100 TB this is the
      // shredding-friendly layout — one parse per row reused by every
      // extraction (q56's get_json_object re-parses per path), and the
      // binary variant encoding columnar-compresses. All stateless
      // projection, no shuffle; outputs are plain BIGINT/STRING so the
      // DuckDB oracle mirrors with its JSON extraction.
      T.events(s, d)
        .withColumn("v", parse_json(col("props")))
        .select(
          col("event_id"),
          expr("variant_get(v, '$.k', 'bigint')").as("k_long"),
          expr("variant_get(v, '$.k', 'string')").as("k_str"),
          expr("schema_of_variant(v)").as("v_schema"),
          expr("try_variant_get(v, '$.missing', 'bigint')").as("miss"),
          expr("variant_get(v, '$.k', 'bigint')").isNotNull.as("has_k"))
        .orderBy(col("event_id"))),

    "q108_xml_roundtrip" -> ((s, d) =>
      // from_xml (Spark 4's native XML parser, the third semi-structured
      // format next to q56's JSON and q107's VARIANT): each order renders
      // to a deterministic XML doc and parses back through a declared
      // schema; the oracle derives the same fields directly, so the hash
      // match proves the render→parse round-trip lossless. Stateless
      // per-row projection, no shuffle; the declared schema keeps it one
      // pass (no inference pre-scan), same discipline as q09's CSV read.
      T.orders(s, d)
        .withColumn("xml", concat(
          lit("<o><k>"), col("o_orderkey").cast(StringType),
          lit("</k><s>"), col("o_orderstatus"),
          lit("</s><p>"), col("o_orderpriority"), lit("</p></o>")))
        .withColumn("parsed", from_xml(col("xml"), StructType(Seq(
          StructField("k", LongType), StructField("s", StringType),
          StructField("p", StringType)))))
        .select(col("o_orderkey"),
          col("parsed").getField("k").as("k"),
          col("parsed").getField("s").as("st"),
          col("parsed").getField("p").as("pr"),
          length(col("xml")).cast(LongType).as("xml_len"))
        .orderBy(col("o_orderkey")))
  )

  def oracleSql: Map[String, String] = Map(
    "q50_str_funcs" ->
      """SELECT p_partkey, upper(p_name) AS name_up, substring(p_name, 1, 8) AS name_8,
        |  trim('  ' || p_brand || '  ') AS brand_trim,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_pad,
        |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |  CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q51_date_funcs" ->
      """WITH o AS (SELECT o_orderkey, strftime(o_orderdate, '%Y%m%d') AS ymd,
        |             CAST(strptime(strftime(o_orderdate, '%Y%m%d'), '%Y%m%d') AS DATE) AS parsed
        |           FROM orders)
        |SELECT o_orderkey, ymd,
        |  strftime(parsed, '%Y-%m-%d') AS parsed_date,
        |  date_diff('day', DATE '1995-01-01', parsed) AS days_since,
        |  CAST(year(parsed) AS BIGINT) AS yr,
        |  CAST(month(parsed) AS BIGINT) AS mo,
        |  CAST(day(parsed) AS BIGINT) AS dom,
        |  strftime(parsed + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        |  strftime(date_trunc('month', parsed), '%Y-%m-%d') AS month_start
        |FROM o ORDER BY o_orderkey""".stripMargin,

    "q52_math_funcs" ->
      """WITH c AS (SELECT c_custkey, c_acctbal,
        |             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |           FROM customer)
        |SELECT c_custkey,
        |  abs(cents) AS abs_cents,
        |  CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
        |  CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
        |  CAST(sqrt(abs(c_acctbal)) AS DOUBLE) AS sqrt_abs,
        |  CAST(c_acctbal * c_acctbal AS DOUBLE) AS bal_sq,
        |  cents % 97 AS mod97,
        |  (abs(cents) + 50) // 100 AS abs_round_units,
        |  CAST(length(bin(abs(cents) + 1)) - 1 AS BIGINT) AS ilog2,
        |  CAST(power(cents % 10, 3) AS BIGINT) AS digit_cubed
        |FROM c ORDER BY c_custkey""".stripMargin,

    "q53_case_decode" ->
      """SELECT c_custkey, nullif(c_mktsegment, 'MACHINERY') AS seg_n,
        |  CASE nullif(c_mktsegment, 'MACHINERY')
        |    WHEN 'BUILDING' THEN 'B' WHEN 'AUTOMOBILE' THEN 'A'
        |    WHEN 'HOUSEHOLD' THEN 'H' ELSE 'Unknown' END AS seg_decoded,
        |  CASE c_nationkey % 3 WHEN 0 THEN 'zero' WHEN 1 THEN 'one'
        |    ELSE 'two' END AS nk_mod3
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q54_null_funcs" ->
      """WITH c AS (SELECT c_custkey,
        |             nullif(c_mktsegment, 'BUILDING') AS seg_n,
        |             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |           FROM customer)
        |SELECT c_custkey, seg_n,
        |  coalesce(seg_n, '(none)') AS seg_or_default,
        |  CASE WHEN seg_n IS NOT NULL THEN 'has' ELSE 'miss' END AS nvl2_style,
        |  nullif(cents, 0) AS cents_nz,
        |  coalesce(nullif(cents, 0), -1) AS cents_or_neg1
        |FROM c ORDER BY c_custkey""".stripMargin,

    "q55_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS e1,
        |  CAST(embedding[2] AS DOUBLE) AS e2,
        |  CAST(embedding[64] AS DOUBLE) AS e_last,
        |  CAST(list_max(embedding) AS DOUBLE) AS vmax,
        |  CAST(list_min(embedding) AS DOUBLE) AS vmin,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |  CAST(list_sort(embedding)[2] AS DOUBLE) AS second_smallest,
        |  CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS argmax
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q108_xml_roundtrip" ->
      """SELECT o_orderkey, o_orderkey AS k, o_orderstatus AS st,
        |  o_orderpriority AS pr,
        |  CAST(length('<o><k>' || CAST(o_orderkey AS VARCHAR) || '</k><s>' ||
        |    o_orderstatus || '</s><p>' || o_orderpriority || '</p></o>')
        |    AS BIGINT) AS xml_len
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q107_json_variant" ->
      // DuckDB mirror of the typed variant extractions; v_schema is the
      // literal shape every props row has ({"k": <int>}), which Spark's
      // schema_of_variant reports as OBJECT<k: BIGINT>
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_long,
        |  json_extract_string(props, '$.k') AS k_str,
        |  'OBJECT<k: BIGINT>' AS v_schema,
        |  CAST(NULL AS BIGINT) AS miss,
        |  json_extract(props, '$.k') IS NOT NULL AS has_k
        |FROM events ORDER BY event_id""".stripMargin,

    "q56_json_map" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
        |  json_extract_string(props, '$.k') IS NOT NULL AS has_k,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_map
        |FROM events ORDER BY event_id""".stripMargin
  )
}
