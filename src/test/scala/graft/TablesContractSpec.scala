package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Pins the load-time fixture-schema contract ([[Tables.contracts]] /
  * [[Tables.conform]]) against regeneration drift — the general form of
  * the round-10 events.ts incident, where a silently re-encoded column
  * cost a full round. Three behaviors under test:
  *
  *  1. the shipped fixtures already satisfy the contract (conform is the
  *     identity — zero plan change on the green path);
  *  2. recognized-LOSSLESS physical drifts (timestamp re-encodings,
  *     integer/float widenings) normalize back to the canonical schema
  *     with identical values;
  *  3. anything else fails AT LOAD with an error naming the table, the
  *     column, and both types — never a silently different answer.
  */
class TablesContractSpec extends SparkSpec {

  /** Re-write one fixture table into a temp dir with `f` applied, so the
    * standard loaders can be pointed at a deliberately drifted copy. */
  private def reencode(table: String)(f: DataFrame => DataFrame): String = {
    val d = Files.createTempDirectory(s"graft_drift_$table").toString
    f(spark.read.parquet(s"$sf/$table.parquet"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/$table.parquet")
    d
  }

  test("shipped fixtures satisfy the contract exactly (conform = identity)") {
    Tables.contracts.foreach { case (table, cols) =>
      val arrived = Tables.t(spark, sf, table).schema
        .fields.map(f => f.name -> f.dataType).toMap
      cols.foreach { case (n, want) =>
        assert(arrived.get(n).contains(want),
          s"$table.$n: contract ${want.simpleString}, fixture ${arrived.get(n)}")
      }
    }
  }

  test("orders.o_orderdate: LTZ and epoch-nanos-BIGINT arrivals normalize to identical NTZ") {
    val ref = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey")).collect().toSeq
    assert(ref.nonEmpty)
    // LTZ: cast NTZ->LTZ (identity micros under pinned UTC), write as
    // INT64-µs isAdjustedToUTC=true.
    val ltzDir = {
      val key = "spark.sql.parquet.outputTimestampType"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "TIMESTAMP_MICROS")
      try reencode("orders")(df =>
        df.withColumn("o_orderdate", col("o_orderdate").cast(TimestampType)))
      finally spark.conf.set(key, prev)
    }
    // BIGINT epoch-nanos: what a TIMESTAMP(NANOS) column arrives as under
    // the session's nanosAsLong flag.
    val nsDir = reencode("orders")(df => df.withColumn("o_orderdate",
      unix_micros(col("o_orderdate").cast(TimestampType)) * lit(1000L)))
    for ((tag, d) <- Seq("ltz" -> ltzDir, "ns-bigint" -> nsDir)) {
      val got = Tables.orders(spark, d)
      assert(got.schema("o_orderdate").dataType == TimestampNTZType,
        s"$tag: ${got.schema("o_orderdate").dataType}")
      val rows = got.select(col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey")).collect().toSeq
      assert(rows == ref, s"encoding $tag diverges from shipped NTZ")
    }
  }

  test("integer-width drift widens back losslessly (customer keys as INT)") {
    val ref = Tables.customer(spark, sf)
      .orderBy(col("c_custkey")).collect().toSeq
    val d = reencode("customer")(df =>
      df.withColumn("c_custkey", col("c_custkey").cast(IntegerType)))
    val got = Tables.customer(spark, d)
    assert(got.schema("c_custkey").dataType == LongType)
    assert(got.orderBy(col("c_custkey")).collect().toSeq == ref)
  }

  test("float arrival for a double column widens to the canonical type") {
    val d = reencode("supplier")(df =>
      df.withColumn("s_acctbal", col("s_acctbal").cast(FloatType)))
    val got = Tables.supplier(spark, d)
    assert(got.schema("s_acctbal").dataType == DoubleType)
    assert(got.count() == Tables.supplier(spark, sf).count())
  }

  test("array containsNull=false arrival relaxes losslessly (no cast, no failure)") {
    // embeddings regenerated with required elements (pyarrow writes
    // required list elements; Spark's own file writer force-nullifies,
    // so this arrival comes from outside Spark): every value is a valid
    // instance of the nullable contract type, and the load must accept
    // it as-is — an identity projection, never a hard error
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("label", IntegerType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, Seq(0.5f, 1.0f), 3), Row(2L, Seq(0.25f, -1.0f), 7)),
      schema)
    val got = Tables.conform(df, "embeddings")
    assert(got.schema("embedding").dataType.asInstanceOf[ArrayType]
      .elementType == FloatType)
    assert(got.orderBy(col("vec_id")).collect().toSeq ==
      df.orderBy(col("vec_id")).collect().toSeq)
    // element retype under the same containsNull flip still fails hard
    val bad = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, Seq(0.5d), 3)),
      StructType(schema.fields.updated(1,
        StructField("embedding", ArrayType(DoubleType, containsNull = false)))))
    val e = intercept[IllegalArgumentException](Tables.conform(bad, "embeddings"))
    assert(e.getMessage.contains("embeddings.embedding"), e.getMessage)
  }

  test("unrecognized retype fails at load naming table, column, and types") {
    val d = reencode("nation")(df =>
      df.withColumn("n_nationkey", col("n_nationkey").cast(StringType)))
    val e = intercept[IllegalArgumentException](Tables.nation(spark, d))
    assert(e.getMessage.contains("nation.n_nationkey"), e.getMessage)
    assert(e.getMessage.contains("int") && e.getMessage.contains("string"),
      e.getMessage)
  }

  test("narrowing drift (BIGINT where contract says INT) fails, not truncates") {
    val d = reencode("nation")(df =>
      df.withColumn("n_nationkey", col("n_nationkey").cast(LongType)))
    val e = intercept[IllegalArgumentException](Tables.nation(spark, d))
    assert(e.getMessage.contains("nation.n_nationkey"), e.getMessage)
  }

  test("missing required column fails at load naming it") {
    val d = reencode("region")(_.drop("r_name"))
    val e = intercept[IllegalArgumentException](Tables.region(spark, d))
    assert(e.getMessage.contains("region") && e.getMessage.contains("r_name"),
      e.getMessage)
  }

  test("additive drift (extra column) passes through untouched") {
    val d = reencode("region")(_.withColumn("r_comment", lit("x")))
    val got = Tables.region(spark, d)
    assert(got.columns.toSeq == Seq("r_regionkey", "r_name", "r_comment"))
    assert(got.count() == Tables.region(spark, sf).count())
  }

  test("a drifted-encoding events table is query-identical through a real query (q18)") {
    // End-to-end: the resample/gapfill family consumes ts via the contract;
    // a re-encoded events dir must produce byte-identical query output.
    val qn = SparkEntry.queries("q18_resample_gapfill")
    val ref = qn(spark, sf).collect().toSeq
    val d = reencode("events")(df => df.withColumn("ts",
      timestamp_micros(expr("unix_micros(cast(ts as timestamp)) "))))
    val rows = qn(spark, d).collect().toSeq
    assert(rows == ref)
  }
}
