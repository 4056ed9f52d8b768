package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Ingest

/** End-to-end replay of the reference pipeline as one runnable Spark job —
  * the executable proof that a user of
  * HashikaVenkat/airflow-cms-inpatient-etl can run their whole flow on this
  * engine. Stages mirror the two DAGs:
  *
  *  1. stage   — raw data lands as header CSVs with dates as yyyyMMdd TEXT
  *               (the CMS convention the reference preserves,
  *               /root/reference/dags/patient_claims_plus_postgres.py:80-81);
  *               plays download_unzip's extract+stage (A1-A5).
  *  2. load    — contract-checked, FAILFAST, schema'd CSV reads with
  *               empty->NULL semantics (A6-A9, A13), DQ-gated (A20, but
  *               actually asserting).
  *  3. derive  — fact ⟕ dim left join, 20-col aliased projection, CASE
  *               decode with the NULL->'Unknown' path (A16-A19), exactly
  *               the patient_claims_plus CTAS (:161-189). The join is
  *               REQUIRED Exchange-free off bucketed staging — the engine
  *               applies the reference's own A20 lesson (checks that can't
  *               fail aren't checks) to its own plan claims.
  *  4. publish — overwrite-mode parquet materialization (A10/A19) + final
  *               DQ gate (:194-199).
  *
  * Each stage is idempotent (overwrite staging), so reruns are safe — the
  * reference's own recovery model. `run` drives all four stages on any
  * session (PipelineSpec replays it under `sbt test`); `main` wraps it in
  * its own session. Usage: runMain graft.Pipeline [sfDir].
  */
object Pipeline {

  /** Runs the full replay; returns (published rows, true join-miss rows,
    * work dir). Restores the session's broadcast threshold on exit.
    *
    * `jdbcUrl`: the reference's publish step is a DATABASE load (Postgres
    * COPY, patient_claims_plus_postgres.py:55-56, 187-189) — pass a JDBC
    * URL and the publish stage also lands the derived table there through
    * [[Ingest.writeJdbc]] (one connection per partition, the distributed
    * COPY). Parquet publication always happens; the DB landing is the
    * reference-faithful extra hop (PipelineSpec replays it against
    * embedded Derby). */
  def run(spark: SparkSession, sf: String,
          jdbcUrl: Option[String] = None,
          jdbcOptions: Map[String, String] = Map.empty): (Long, Long, String) = {
    val work = Files.createTempDirectory("graft_pipeline").toString

    // -- 1. stage: land the raw tables as header CSVs, dates as yyyyMMdd --
    Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_returnflag"),
      date_format(col("l_shipdate"), "yyyyMMdd").as("l_shipdate_ymd"))
      .write.option("header", "true").mode("overwrite").csv(s"$work/claims_csv")
    Tables.orders(spark, sf).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"),
      date_format(col("o_orderdate"), "yyyyMMdd").as("o_orderdate_ymd"))
      .write.option("header", "true").mode("overwrite").csv(s"$work/dim_csv")
    // the dim side arrives as a ZIP archive, like the reference's download
    // (cms_inpatient_download_unzip.py:22-24) — pack the staged CSVs into
    // one and load through the distributed zip source (A1-A5 chain)
    val zipDir = Files.createDirectories(java.nio.file.Paths.get(s"$work/dim_zips"))
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(zipDir.resolve("dim.zip")))
    java.nio.file.Files.list(java.nio.file.Paths.get(s"$work/dim_csv")).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.endsWith(".csv"))
      .foreach { p =>
        zos.putNextEntry(new java.util.zip.ZipEntry(p.getFileName.toString))
        zos.write(java.nio.file.Files.readAllBytes(p))
        zos.closeEntry()
      }
    zos.close()

    // -- 2. load: contract-checked typed CSV scans (raw tables) --
    val claimsSchema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_shipdate_ymd", StringType)))
    val dimSchema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate_ymd", StringType)))
    val claims = Ingest.dqGateNonEmpty(
      Ingest.projectKeep(
        Ingest.requireColumns(
          Ingest.readCsv(spark, s"$work/claims_csv", claimsSchema),
          Seq("l_orderkey", "l_linenumber", "l_shipdate_ymd")),
        claimsSchema.fieldNames.toSeq),
      "raw_claims")
    Ingest.assertNonEmptyPath(spark, s"$work/dim_zips/dim.zip")
    val dim = Ingest.dqGateNonEmpty(
      Ingest.readZippedCsv(spark, s"$work/dim_zips", dimSchema)
        .filter(col("o_totalprice") > 150000.0),
      "raw_dim")

    // -- 3. derive: the patient_claims_plus analog, from BUCKETED staging
    //       (A5/A10 as layout decisions): both sides land pre-hashed+sorted
    //       on the join key, so the fact-dim join MUST run with NO Exchange
    //       on either side even in the sort-merge path a 100 TB fact table
    //       forces (broadcast disabled to prove exactly that path) --
    ops.Layout.stageBucketed(claims, "pipeline_claims_b", "l_orderkey", 8)
    ops.Layout.stageBucketed(dim, "pipeline_dim_b", "o_orderkey", 8)
    // Conf isolation (the round-7 advice, applied here too): the
    // no-broadcast proof plans in a CHILD session — newSession() shares
    // the catalog (the bucketed staging tables resolve) but owns its
    // SQLConf, so a concurrently-planned query in the caller's session
    // can never see broadcast disabled, and there is nothing to restore.
    val noBcast = spark.newSession()
    noBcast.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    locally {
      val claimsB = noBcast.table("pipeline_claims_b")
      val dimB = noBcast.table("pipeline_dim_b")
      val derived = claimsB
        .join(dimB, claimsB("l_orderkey") === dimB("o_orderkey"), "left")
        .select(
          col("l_orderkey").as("claim_key"),
          col("l_linenumber").as("claim_line"),
          col("l_quantity").as("qty"),
          col("l_extendedprice").as("ext_price"),
          col("l_returnflag").as("ret_flag"),
          col("l_shipdate_ymd").as("ship_ymd"),
          to_date(col("l_shipdate_ymd"), "yyyyMMdd").as("ship_date"),
          col("o_custkey").as("cust_key"),
          col("o_orderdate_ymd").as("order_ymd"),
          when(col("o_orderstatus") === "O", "Open")
            .when(col("o_orderstatus") === "F", "Finished")
            .otherwise("Unknown").as("order_status_decoded"))

      // the bucketing claim, enforced like a DQ gate: a plan that shuffles
      // the derive join is a pipeline bug, not a log line
      val derivePlan = derived.queryExecution.executedPlan.toString
      require(!derivePlan.contains("Exchange"),
        s"derive join must be Exchange-free off bucketed staging; plan:\n$derivePlan")

      // -- 4. publish + final DQ gate, SINGLE-PASS: row-count and
      //       not-null(claim_key) metrics ride the publish write itself
      //       (Observation accumulators), so the gate costs no second scan
      //       and is stronger than the reference's post-hoc row count
      //       (A20 — which also could never fail) --
      Ingest.observedDqGate(derived, "patient_claims_plus", Seq("claim_key")) {
        d => Ingest.stageOverwrite(d, s"$work/patient_claims_plus")
      }
      val out = spark.read.parquet(s"$work/patient_claims_plus")
      // the reference's actual sink: overwrite-load the published table
      // into a relational DB (its drop-and-reload, :182-186)
      jdbcUrl.foreach(url =>
        Ingest.writeJdbc(out, url, "patient_claims_plus", options = jdbcOptions))
      // true join misses: the dim side is all-NULL on a left-join miss, and
      // o_custkey is never NULL in a real dim row — unlike the 'Unknown'
      // decode, which also fires for joined orders with an unmapped status
      val misses = out.filter(col("cust_key").isNull).count()
      (out.count(), misses, work)
    }
  }

  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_pipeline_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (rows, misses, work) = run(spark, sf)
    println(s"PIPELINE_ROWS=$rows NULL_EXTENDED=$misses WORK_DIR=$work")
    spark.stop()
  }
}
