package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture loaders + shared helpers.
  *
  * The engine reads the driver-generated parquet star schema
  * (see /root/repo/TESTDATA.md). All loaders are plain parquet scans so
  * Catalyst column pruning / predicate pushdown reach the file source.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** events.parquet's `ts` column has shipped in TWO physical encodings
    * across fixture generations, and the engine reads both:
    *
    *  - INT64 TIMESTAMP(NANOS): Spark's parquet reader rejects it
    *    ([PARQUET_TYPE_ILLEGAL]) unless the session sets
    *    `spark.sql.legacy.parquet.nanosAsLong=true` — every graft session
    *    builder does (Bench/Verify/Pipeline/Smoke/Plans/LayoutDemo/
    *    SparkSpec), so `ts` arrives as a BIGINT of epoch nanoseconds.
    *    (Set in the builder, not here: mutating session conf inside a
    *    query closure is hidden global state.)
    *  - µs TIMESTAMP / TIMESTAMP_NTZ (the standard parquet encoding and
    *    what the current fixtures carry): normalized below to the same
    *    epoch-nanos BIGINT with exact integer arithmetic.
    *
    * Everything downstream (`tsUs`, `tsSec`, window/session/streaming
    * shapes) consumes ONE canonical type — BIGINT epoch-nanos — so a
    * fixture regeneration cannot change query semantics. The DuckDB
    * oracles are already encoding-agnostic (`epoch_us(ts)` works on both).
    */
  def events(s: SparkSession, d: String): DataFrame =
    normEventTs(t(s, d, "events"))

  /** Normalize a frame's `ts` column to BIGINT epoch-nanos regardless of
    * physical encoding. TIMESTAMP_NTZ (naive wall-clock, what parquet
    * µs-without-UTC-flag reads as) is interpreted as UTC — exact because
    * every graft session pins `spark.sql.session.timeZone=UTC`, making the
    * NTZ→TIMESTAMP cast the identity on the underlying micros. Works on
    * batch AND streaming frames (stateless projection). */
  def normEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType            => df
    case TimestampType       =>
      df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    case _: TimestampNTZType =>
      df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    case other =>
      throw new IllegalArgumentException(
        s"events.ts: expected BIGINT epoch-nanos or TIMESTAMP[_NTZ], got $other")
  }

  /** events.ts (epoch ns, BIGINT) -> TimestampType at µs precision.
    * Exact decimal division, NOT double: epoch-ns values (~1.7e18) exceed
    * double's 2^53 integer range, so a double path can be off by ±1 µs
    * after truncation. DuckDB mirror: CAST(ts AS TIMESTAMP) (ns -> µs
    * truncation). */
  def tsUs(c: Column): Column =
    timestamp_micros(c.cast(DecimalType(38, 0)).divide(lit(1000)).cast(LongType))

  /** events.ts (epoch ns, BIGINT) -> epoch seconds (floor), BIGINT. */
  def tsSec(c: Column): Column = floor(c.divide(lit(1000000000L))).cast(LongType)
}

/** Cross-engine-deterministic output helpers (SURVEY.md §7.5).
  *
  * Every oracled query's output goes through these so that the Spark result
  * and the DuckDB oracle hash identically:
  *  - money/quantity doubles are 2-dp-clean in the fixtures -> exact
  *    DECIMAL casts;
  *  - timestamps are rendered as fixed-width strings or epoch-second
  *    BIGINTs (never raw TimestampType in an oracled output);
  *  - derived integers are always BIGINT (DuckDB int functions return
  *    BIGINT, Spark's often return INT);
  *  - computed ratios/doubles are reduced to BIGINT micro-units via exact
  *    integer arithmetic (never `round(double)`, whose half-up tie behavior
  *    differs between engines).
  */
object Fns {
  /** 2-dp decimal cast for money columns (fixture doubles are 2-dp-clean). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Oracle-safe output cast: DECIMAL -> DOUBLE at the FINAL projection only.
    * The driver's hash gate reads the Spark dump Decimal-preserving but the
    * DuckDB oracle float64-coerced, so any DecimalType output whose value has
    * a trailing zero ('73.00' vs '73.0') hash-mismatches despite equal
    * values (root-caused round 3; predicted all 33 round-2 verdicts).
    * Decimal->double is a single correctly-rounded IEEE conversion in both
    * engines, so values stay bit-identical. Keep decimal math INTERNAL for
    * exact, order-independent aggregation; emit doubles. DuckDB mirror:
    * CAST(... AS DOUBLE). */
  def od(c: Column): Column = c.cast(DoubleType)

  /** Whitespace token count WITHOUT the array: value-identical to
    * `size(split(c, " "))` for any string (segments = separators + 1, and
    * split("", " ") is [""] = 1), but pure length arithmetic — no
    * per-row substring-array allocation. At 100 TB the split form's
    * garbage pressure is real; use this wherever only the COUNT is needed
    * (when the tokens themselves flow on — explode, grams — split is the
    * right call). Oracles keep `len(string_split(...))`: same value. */
  def nTokens(c: Column): Column =
    (length(c) - length(translate(c, " ", "")) + 1).cast(LongType)

  /** Exact integer cents of a 2-dp-clean double (money/quantity). */
  def cents(c: Column): Column = dec2(c).multiply(lit(100)).cast(LongType)

  /** BIGINT cast — DuckDB scalar int functions return BIGINT, Spark INT. */
  def bi(c: Column): Column = c.cast(LongType)

  /** Date-only render of a timestamp column. DuckDB mirror: strftime(c,'%Y-%m-%d'). */
  def d(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Full µs-precision render. DuckDB mirror: strftime(c,'%Y-%m-%d %H:%M:%S.%f'). */
  def ts6(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** yyyyMMdd render (the CMS date-as-TEXT convention kept by the reference,
    * /root/reference/dags/patient_claims_plus_postgres.py:80-81).
    * DuckDB mirror: strftime(c,'%Y%m%d'). */
  def ymd(c: Column): Column = date_format(c, "yyyyMMdd")

  /** sum of a 2-dp money column: exact decimal accumulation (engine-order-
    * independent), DOUBLE on output (see od). DuckDB mirror:
    * CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE). */
  def sum2(c: Column): Column = od(sum(dec2(c)))

  /** Average in exact integer micro-units: (sum_cents * 10000) div n, by
    * column NAME (Spark SQL `div` = integer division on BIGINTs; DuckDB
    * mirror `//`). Floor division of non-negative BIGINTs — no float or
    * decimal division anywhere, so the value is exact in both engines. */
  def avgMicro(sumCentsCol: String, nCol: String): Column =
    expr(s"CAST(($sumCentsCol * 10000L) DIV $nCol AS BIGINT)")
}

/** One block of the engine's query surface: the declared queries (the t2
  * correctness contract, SURVEY.md §2-C) plus the DuckDB oracle SQL for the
  * oracle-able subset. */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
