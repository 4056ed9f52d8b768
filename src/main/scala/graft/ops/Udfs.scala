package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Fns => F, QueryModule, Tables => T}

/** UDF/UDAF surface (q80): one Scala UDF and one typed Aggregator.
  *
  * The UDF is an ICD-code-style normalizer (trim, uppercase, strip dots) —
  * the cleanup any consumer of the reference's ICD9 TEXT columns
  * (/root/reference/dags/patient_claims_plus_postgres.py:85-93) performs.
  * The Aggregator is an exact integer sum-of-squares over quantity cents.
  *
  * Scale notes: a Scala UDF is a codegen black box (no pushdown through it,
  * per-row serialization) — acceptable here because the module exists to
  * prove the extension surface; everywhere else the engine uses built-in
  * expressions (see Scalars). The typed Aggregator gets full partial+final
  * aggregation (reduce/merge), so it shuffles one Long per group, exactly
  * like a built-in sum.
  */
object Udfs extends QueryModule {

  /** ICD-style normalizer: ' 250.83 ' -> '25083'. */
  private[ops] val normalizeCode: String => String =
    s => if (s == null) null else s.trim.toUpperCase.replace(".", "")

  /** Exact sum of squares of a Long column (partial+final mergeable). */
  private[ops] class SumOfSquares extends Aggregator[Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: Long): Long = b + a * a
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Built once: `udf()`/`udaf()` wrap no session state (they just carry
    * the function + encoders into the plan), and `functions.udaf` pays a
    * reflection-heavy encoder derivation that was ~40% of q80's per-call
    * latency when constructed inside the query builder. */
  private lazy val norm = udf(normalizeCode)
  private lazy val sumsq = functions.udaf(new SumOfSquares)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_udf_surface" -> ((s, d) => {
      T.lineitem(s, d)
        .select(
          norm(concat(lit(" "), col("l_returnflag"), lit("."), col("l_linestatus"), lit(" ")))
            .as("code_norm"),
          F.cents(col("l_quantity")).as("qty_c"))
        .groupBy(col("code_norm"))
        .agg(sumsq(col("qty_c")).as("sumsq_qty_c"), count(lit(1)).as("n"))
        .orderBy(col("code_norm"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q80_udf_surface" ->
      """WITH l AS (SELECT
        |  replace(upper(trim(' ' || l_returnflag || '.' || l_linestatus || ' ')), '.', '') AS code_norm,
        |  CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_c
        |FROM lineitem)
        |SELECT code_norm, CAST(sum(qty_c * qty_c) AS BIGINT) AS sumsq_qty_c, count(*) AS n
        |FROM l GROUP BY code_norm ORDER BY code_norm""".stripMargin
  )
}
