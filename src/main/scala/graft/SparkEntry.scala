package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the t2 correctness contract (SURVEY.md §2-C): one entry per
  * operator, each paired (where SQL-expressible and cross-engine
  * deterministic) with DuckDB oracle SQL in `oracleSql`.
  */
object SparkEntry {
  /** The registered query surface, one QueryModule per SURVEY §2-C block. */
  private def modules: Seq[QueryModule] = Seq(
    ops.Relational,
    ops.Scalars,
    ops.TextOps,
    ops.Dedup,
    ops.Similarity,
    ops.StreamOps,
    ops.Udfs,
    ops.Multimodal,
    ops.Corpus,
    ops.Warehouse
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Replays the reference's patient_claims_plus CTAS + DQ chain
    * (/root/reference/dags/patient_claims_plus_postgres.py:161-199), with
    * the DQ gate actually asserting (the reference's never could — SURVEY
    * A20). */
  def entry(spark: SparkSession): DataFrame =
    ops.Ingest.dqGateNonEmpty(
      queries("q10_join_left_flagship")(spark, "/root/testdata/sf0.001"),
      "patient_claims_plus_smoke")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
