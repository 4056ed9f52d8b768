package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Pins the engine's event-time contract against fixture regeneration:
  * `events.ts` has shipped both as INT64 TIMESTAMP(NANOS) (read as BIGINT
  * epoch-nanos under `nanosAsLong`) and as µs TIMESTAMP / TIMESTAMP_NTZ.
  * A round-10 fixture regeneration flipped the encoding and broke 12
  * queries at ANALYSIS time; this spec re-encodes one fixture table all
  * three ways and asserts the batch loader (`Tables.events`), the
  * streaming source (`streamTable` via q73's drain), and a windowed query
  * (q70) are encoding-invariant — so the next regeneration cannot
  * silently break the time family again. */
class EncodingSpec extends SparkSpec {

  /** The same events content written under each physical ts encoding.
    * Values are truncated to µs first so all three carry identical
    * instants (the TIMESTAMP encodings cannot represent sub-µs). */
  private lazy val dirs: Map[String, String] = {
    val evUs = Tables.events(spark, sf)
      .withColumn("ts", (col("ts") / lit(1000L)).cast(LongType) * lit(1000L))
    def mk(tag: String)(f: DataFrame => DataFrame): (String, String) = {
      val d = Files.createTempDirectory(s"graft_enc_$tag").toString
      f(evUs).coalesce(2).write.mode("overwrite").parquet(s"$d/events.parquet")
      tag -> d
    }
    Map(
      mk("long")(identity), // BIGINT epoch-nanos (the nanosAsLong arrival type)
      mk("ltz")(df => df.withColumn("ts",
        timestamp_micros((col("ts") / lit(1000L)).cast(LongType)))),
      mk("ntz")(df => df.withColumn("ts",
        timestamp_micros((col("ts") / lit(1000L)).cast(LongType))
          .cast(TimestampNTZType)))
    )
  }

  test("Tables.events normalizes all three ts encodings to identical BIGINT nanos") {
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
