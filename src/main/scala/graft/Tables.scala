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
  def events(s: SparkSession, d: String): DataFrame   = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

/** Cross-engine-deterministic output helpers (SURVEY.md §7.5).
  *
  * Every oracled query's output goes through these so that the Spark result
  * and the DuckDB oracle hash identically:
  *  - money/quantity doubles are 2-dp-clean in the fixtures -> exact
  *    DECIMAL casts;
  *  - timestamps are µs precision -> fixed-width formatted strings;
  *  - derived integers are always BIGINT (DuckDB int functions return
  *    BIGINT, Spark's often return INT).
  */
object Fns {
  /** 2-dp decimal cast for money columns (fixture doubles are 2-dp-clean). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Date-only render of a timestamp column. DuckDB mirror: strftime(c,'%Y-%m-%d'). */
  def d(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Full µs-precision render. DuckDB mirror: strftime(c,'%Y-%m-%d %H:%M:%S.%f'). */
  def ts6(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** yyyyMMdd render (the CMS date-as-TEXT convention kept by the reference,
    * /root/reference/dags/patient_claims_plus_postgres.py:80-81).
    * DuckDB mirror: strftime(c,'%Y%m%d'). */
  def ymd(c: Column): Column = date_format(c, "yyyyMMdd")

  /** Arbitrary-double -> stable decimal: round to scale then cast. Safe as
    * long as both engines agree to better than 0.5 * 10^-s. */
  def rdec(c: Column, s: Int): Column = round(c, s).cast(DecimalType(28, s))
}

/** One block of the engine's query surface: the declared queries (the t2
  * correctness contract, SURVEY.md §2-C) plus the DuckDB oracle SQL for the
  * oracle-able subset. */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
