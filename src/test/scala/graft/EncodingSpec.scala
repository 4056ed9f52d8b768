package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Pins the engine's event-time contract against fixture regeneration:
  * `events.ts` has shipped both as INT64 TIMESTAMP(NANOS) (read as BIGINT
  * epoch-nanos under `nanosAsLong`) and as µs TIMESTAMP / TIMESTAMP_NTZ.
  * A round-10 fixture regeneration flipped the encoding and broke 12
  * queries at ANALYSIS time; this spec re-encodes one fixture table FOUR
  * ways (BIGINT-nanos, INT64-µs LTZ, µs NTZ, legacy INT96) and asserts
  * the batch loader (`Tables.events`), the streaming source
  * (`streamTable` via q73's drain), and a windowed query (q70) are
  * encoding-invariant — so the next regeneration cannot silently break
  * the time family again. */
class EncodingSpec extends SparkSpec {

  /** The same events content written under each physical ts encoding.
    * Values are truncated to µs first so all three carry identical
    * instants (the TIMESTAMP encodings cannot represent sub-µs).
    * All ns→µs divisions use SQL `div` (exact BIGINT integer division):
    * epoch-nanos (~1.7e18) exceed double's 2^53 integer range, so the
    * `/`-then-cast spelling silently lands ±1 µs off on some rows — the
    * exact trap Tables.tsUs documents.
    * The ltz dir is written under outputTimestampType=TIMESTAMP_MICROS so
    * it physically pins the INT64-µs isAdjustedToUTC=true encoding (the
    * standard parquet TIMESTAMP); Spark's default would write INT96,
    * leaving the µs-LTZ arrival shape uncovered. */
  private lazy val dirs: Map[String, String] = {
    val evUs = Tables.events(spark, sf)
      .withColumn("ts", expr("ts div 1000") * lit(1000L))
    def mk(tag: String, outType: String = "TIMESTAMP_MICROS")
          (f: DataFrame => DataFrame): (String, String) = {
      val d = Files.createTempDirectory(s"graft_enc_$tag").toString
      val key  = "spark.sql.parquet.outputTimestampType"
      val prev = spark.conf.get(key)
      spark.conf.set(key, outType)
      try f(evUs).coalesce(2).write.mode("overwrite").parquet(s"$d/events.parquet")
      finally spark.conf.set(key, prev)
      tag -> d
    }
    val toLtz = (df: DataFrame) =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    Map(
      mk("long")(identity), // BIGINT epoch-nanos (the nanosAsLong arrival type)
      mk("ltz")(toLtz),
      mk("ntz")(df => df.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))),
      // legacy Hive/Impala physical shape — also arrives as TimestampType
      mk("int96", outType = "INT96")(toLtz)
    )
  }

  test("ltz dir physically carries INT64 TIMESTAMP(MICROS,adjustedToUTC=true)") {
    // Guards the coverage claim itself: under Spark's default INT96 output
    // the "ltz" dir would silently test a third arrival shape instead of
    // the standard µs-TIMESTAMP encoding current fixtures carry.
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val dir = new Path(dirs("ltz") + "/events.parquet")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(dir).map(_.getPath)
      .find(_.getName.startsWith("part-")).get
    val rdr = ParquetFileReader.open(
      HadoopInputFile.fromPath(part, spark.sparkContext.hadoopConfiguration))
    val tsField =
      try rdr.getFooter.getFileMetaData.getSchema.getType(Seq("ts"): _*).asPrimitiveType
      finally rdr.close()
    assert(tsField.getPrimitiveTypeName == PrimitiveTypeName.INT64,
      s"ts physical type: ${tsField.getPrimitiveTypeName} (INT96 = default leak)")
    tsField.getLogicalTypeAnnotation match {
      case t: TimestampLogicalTypeAnnotation =>
        assert(t.isAdjustedToUTC, "ltz must be isAdjustedToUTC=true")
        assert(t.getUnit.toString == "MICROS", s"unit ${t.getUnit}")
      case other => fail(s"ts logical type: $other")
    }
  }

  test("Tables.events normalizes all four ts encodings to identical BIGINT nanos") {
    val collected = dirs.map { case (tag, d) =>
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType == LongType, s"encoding $tag")
      tag -> ev.select(col("event_id"), col("ts"))
        .orderBy(col("event_id")).collect().toSeq
    }
    val ref = collected("long")
    assert(ref.nonEmpty)
    collected.foreach { case (tag, rows) =>
      assert(rows == ref, s"encoding $tag diverges from BIGINT-nanos")
    }
  }

  test("q70 tumbling window is ts-encoding-invariant") {
    val q = SparkEntry.queries("q70_stream_tumbling")
    val res = dirs.map { case (tag, d) => tag -> q(spark, d).collect().toSeq }
    assert(res("long").nonEmpty)
    res.foreach { case (tag, rows) =>
      assert(rows == res("long"), s"q70 on encoding $tag diverges")
    }
  }

  test("q73 streaming drain (streamTable path) is ts-encoding-invariant") {
    val q = SparkEntry.queries("q73_stream_watermark")
    val res = dirs.map { case (tag, d) => tag -> q(spark, d).collect().toSeq }
    assert(res("long").nonEmpty)
    res.foreach { case (tag, rows) =>
      assert(rows == res("long"), s"q73 on encoding $tag diverges")
    }
  }
}
