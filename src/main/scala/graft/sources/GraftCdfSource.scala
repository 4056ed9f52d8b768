package graft.sources

import java.util.Locale

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.Snapshot

/** The change feed as a REGISTERED Structured Streaming source:
  *
  *   spark.readStream.format("graft-cdf")
  *     .option("keyCol", "order_key")
  *     .option("startingVersion", 1)   // feed commits AFTER this one
  *     .load(dir)
  *
  * — the front-door spelling of what q133's foreachBatch subscription
  * does by hand, on the STABLE streaming-source SPI (`Source` +
  * `StreamSourceProvider`, the contract Delta's own streaming source
  * rides). The offset IS the snapshot version: `getOffset` reads the
  * table's current committed version (one driver-side directory
  * listing — no data touched), and each micro-batch serves the
  * per-commit [[Snapshot.changeFeed]] diffs in `(start, end]`, each
  * step stamped with its `_commit_version` (Delta CDF's contract, so a
  * consumer can order and attribute changes). Restart recovery is free:
  * the checkpointed offset is just the last fed version, and manifests
  * are immutable — re-serving any `(v1, v2]` yields byte-identical
  * batches, which is what makes the source REPLAYABLE and the pipeline
  * exactly-once end to end.
  *
  * Maintenance commits (OPTIMIZE / z-order / constraint / schema —
  * [[Snapshot.isMaintenanceNote]]) advance the offset WITHOUT planning
  * a diff: dataChange=false discipline, so at 100 TB a subscription
  * ticks over a compaction by manifest arithmetic alone instead of
  * diffing a rewritten table against itself.
  *
  * Options (case-insensitive): `keyCol` (required — the key the diff
  * classifies U/D/I on), `startingVersion` (default: the current
  * version when the stream starts, i.e. only NEW commits feed; 0 is not
  * meaningful — the feed needs a base state to diff against, so the
  * earliest usable value is the first committed version),
  * `startingTimestamp` (the same base resolved through the monotone
  * commit clock — everything committed after that instant feeds),
  * `maxVersionsPerTrigger` (bound each micro-batch's commit span — the
  * admission-control knob that turns a long catch-up into bounded
  * batches instead of one table-scale diff).
  */
final class GraftCdfSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  private def opt(parameters: Map[String, String],
                  key: String): Option[String] =
    parameters.collectFirst {
      case (k, v) if k.toLowerCase(Locale.ROOT) == key.toLowerCase(Locale.ROOT) => v
    }

  private def resolve(spark: SparkSession,
                      parameters: Map[String, String]): (String, String) = {
    val dir = opt(parameters, "path").getOrElse(
      throw new IllegalArgumentException(
        "graft-cdf source needs a table directory: .load(dir)"))
    val keyCol = opt(parameters, "keyCol").getOrElse(
      throw new IllegalArgumentException(
        "graft-cdf source needs option keyCol (the CDC key column)"))
    (dir, keyCol)
  }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    val (dir, keyCol) = resolve(sqlContext.sparkSession, parameters)
    (shortName(),
      GraftCdfSource.feedSchema(sqlContext.sparkSession, dir, keyCol))
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val (dir, keyCol) = resolve(spark, parameters)
    require(!(opt(parameters, "startingVersion").isDefined &&
      opt(parameters, "startingTimestamp").isDefined),
      "startingVersion and startingTimestamp are mutually exclusive")
    val startV = opt(parameters, "startingVersion").map(_.trim.toInt)
      .orElse(opt(parameters, "startingTimestamp").map(ts =>
        // feed everything committed AFTER the instant: the base is the
        // newest version at/before it, same clock as timestampAsOf
        Snapshot.versionAtTimestamp(spark, dir,
          GraftSourceProvider.epochMs(ts))))
      .getOrElse(Snapshot.currentVersion(spark, dir))
    val maxV = opt(parameters, "maxVersionsPerTrigger").map(_.trim.toInt)
    maxV.foreach(v => require(v >= 1,
      s"maxVersionsPerTrigger must be >= 1, got $v"))
    new GraftCdfSource(spark, dir, keyCol, startV, maxV)
  }
}

object GraftCdfSource {
  /** The feed's fixed schema, declared at stream start from the
    * CURRENT version's read schema (declared evolution included):
    * key first, `change_type`, the payload columns in table order,
    * `_commit_version` last — [[Snapshot.changeFeed]]'s column order
    * with the attribution stamp appended. */
  private[sources] def feedSchema(spark: SparkSession, dir: String,
                                  keyCol: String): StructType = {
    val s = Snapshot.read(spark, dir).schema
    require(s.fieldNames.contains(keyCol),
      s"keyCol $keyCol missing from snapshot schema under $dir")
    StructType(
      s.fields.filter(_.name == keyCol) ++
        Seq(StructField("change_type", StringType)) ++
        s.fields.filterNot(_.name == keyCol) ++
        Seq(StructField("_commit_version", LongType, nullable = false)))
  }
}

/** One live subscription. All state is the offset pair the engine
  * checkpoints; the source itself holds nothing but its declared
  * schema — restartable by construction. [[SupportsTriggerAvailableNow]]
  * (Delta's own combination with the v1 `Source` trait) latches the
  * table's version when an AvailableNow drain starts, so the drain has
  * a definite end even while an upstream writer keeps committing. */
final class GraftCdfSource(spark: SparkSession, dir: String,
                           keyCol: String, startVersion: Int,
                           maxVersionsPerTrigger: Option[Int] = None)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  override val schema: StructType =
    GraftCdfSource.feedSchema(spark, dir, keyCol)

  /** Version offsets serialize as bare digits — `json` is the whole
    * durable format, so parsing `json()` handles both live offsets and
    * the engine's checkpoint-recovered `SerializedOffset` uniformly. */
  private case class VersionOffset(v: Long) extends Offset {
    override def json: String = v.toString
  }

  private def versionOf(
      o: org.apache.spark.sql.connector.read.streaming.Offset): Int =
    o.json().trim.toLong.toInt

  override def getOffset: Option[Offset] = {
    val cur = Snapshot.currentVersion(spark, dir)
    if (cur <= startVersion) None else Some(VersionOffset(cur.toLong))
  }

  // -------- AvailableNow admission control (the engine prefers these
  // over getOffset when present; ReadLimit stays allAvailable — commits
  // are the natural batch quantum already)
  @volatile private var availableNowCap: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(Snapshot.currentVersion(spark, dir))

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val avail = availableNowCap.getOrElse(Snapshot.currentVersion(spark, dir))
    val base = Option(start).map(o => versionOf(o)).getOrElse(startVersion)
    // maxVersionsPerTrigger bounds each batch's COMMIT span (Delta's
    // maxFilesPerTrigger discipline at this source's natural quantum):
    // a catch-up over a long history drains as bounded batches instead
    // of one table-scale diff — under AvailableNow the engine keeps
    // triggering until the latched cap is reached, so the drain still
    // completes, just in steps.
    val cap = maxVersionsPerTrigger
      .map(mv => math.min(avail.toLong, base.toLong + mv).toInt)
      .getOrElse(avail)
    if (cap <= base) null else VersionOffset(cap.toLong)
  }

  /** Observability hook (StreamingQueryProgress's `latestOffset`): the
    * table's current version regardless of admission-control caps. */
  override def reportLatestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset =
    VersionOffset(Snapshot.currentVersion(spark, dir).toLong)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val v1 = start.map(versionOf).getOrElse(startVersion)
    val v2 = versionOf(end)
    val steps = ((v1 + 1) to v2).filterNot(v =>
      Snapshot.isMaintenanceNote(Snapshot.manifest(spark, dir, v).note))
    val batches = steps.map { v =>
      conform(Snapshot.changeFeed(spark, dir, v - 1, v, keyCol)
        .withColumn("_commit_version", lit(v.toLong)))
    }
    // the engine asserts isStreaming=true on a v1 source's batch — the
    // shim mints the streaming-flagged frame over the diff's own rows
    org.apache.spark.sql.graftshim.StreamingFrame.wrap(
      batches.reduceOption(_ unionAll _).getOrElse(
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)))
  }

  /** Pin each step's diff to the schema DECLARED at stream start. A
    * feed is a fixed-schema contract: a mid-stream schema evolution
    * surfaces as an extra payload column here, and the only sound
    * answer is to stop and let the consumer restart with the evolved
    * schema (Delta's discipline) — silently dropping the column would
    * lose data, null-filling it would fabricate some. */
  private def conform(df: DataFrame): DataFrame = {
    val declared = schema.fieldNames.toSet
    val extra = df.columns.filterNot(declared.contains)
    if (extra.nonEmpty) throw new IllegalStateException(
      s"snapshot schema evolved mid-stream (new columns: ${extra.mkString(",")});" +
        " restart the graft-cdf stream to adopt the evolved schema")
    df.select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  override def stop(): Unit = ()
}

/** The change feed as a BATCH read — Delta's `readChangeFeed` option
  * on the ordinary read front door:
  *
  *   spark.read.format("graft")
  *     .option("readChangeFeed", "true")
  *     .option("startingVersion", 2)   // INCLUSIVE — v2's changes feed
  *     .option("endingVersion", 3)     // default: current version
  *     .load(dir)
  *
  * — the batch half of the CDF surface ([[GraftCdfSource]] is the
  * streaming half; [[Snapshot.changeFeed]] the verb). The USER bounds
  * are Delta's: `startingVersion` inclusive and required (the provider
  * translates to this relation's internal exclusive `(v1, v2]` span).
  * Serves the per-commit diffs in `(v1, v2]`, each row
  * stamped `_commit_version`, maintenance commits skipped by manifest
  * arithmetic (dataChange=false — an OPTIMIZE inside the span costs
  * nothing and feeds nothing). Manifests are immutable, so the same
  * span always re-serves byte-identical rows; cost ∝ the span's
  * touched files, never the table. `keyCol` defaults to the table's
  * clustering column (logical name). */
final class GraftChangesRelation(override val sqlContext: SQLContext,
                                 dir: String, keyCol: String,
                                 v1: Int, v2: Int)
    extends org.apache.spark.sql.sources.BaseRelation
    with org.apache.spark.sql.sources.TableScan {

  require(v1 >= 0 && v2 >= v1,
    s"readChangeFeed needs 0 <= startingVersion <= endingVersion, " +
      s"got ($v1, $v2] under $dir")

  override val schema: StructType =
    GraftCdfSource.feedSchema(sqlContext.sparkSession, dir, keyCol)

  override def toString: String =
    s"GraftChangesRelation($dir, ($v1, $v2])"

  private def feed: DataFrame = {
    val spark = sqlContext.sparkSession
    val steps = ((v1 + 1) to v2).filterNot(v =>
      Snapshot.isMaintenanceNote(Snapshot.manifest(spark, dir, v).note))
    val declared = schema.fieldNames.toSet
    val parts = steps.map { v =>
      // v1 has no predecessor to diff against: its change feed IS the
      // initial load, every row an insert (startingVersion = 0 means
      // "from the table's beginning" — Delta's contract)
      val changes =
        if (v == 1) Snapshot.read(spark, dir, 1)
          .withColumn("change_type", lit("I"))
        else Snapshot.changeFeed(spark, dir, v - 1, v, keyCol)
      val df = changes.withColumn("_commit_version", lit(v.toLong))
      val extra = df.columns.filterNot(declared.contains)
      // the feed is a fixed-schema contract pinned at the CURRENT
      // version: a mid-span evolution only ever means columns the
      // head declares are missing from EARLY steps — null-fill those
      // (the column did not exist; NULL is its honest value), never
      // drop data
      require(extra.isEmpty,
        s"change-feed step v$v carries undeclared columns " +
          s"${extra.mkString(",")} under $dir")
      val missing = schema.fields.filterNot(f =>
        df.columns.contains(f.name))
      missing.foldLeft(df)((acc, f) =>
        acc.withColumn(f.name, lit(null).cast(f.dataType)))
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    }
    parts.reduceOption(_ unionAll _).getOrElse(
      sqlContext.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
  }

  override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
    feed.rdd
}
