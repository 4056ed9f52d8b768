package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.SparkSession

/** The one `private[sql]` doorway a v1 streaming [[org.apache.spark.sql
  * .execution.streaming.Source]] needs: `MicroBatchExecution` asserts
  * that `getBatch`'s DataFrame carries `isStreaming=true`, and the only
  * sanctioned way to mint one is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming =
  * true)` — so this shim lives inside the `org.apache.spark.sql`
  * package, exactly the pattern Delta's own `DeltaSource` uses for the
  * same call. Nothing else reaches through: one method, one purpose.
  *
  * The wrap pins the batch's PHYSICAL rows (`queryExecution.toRdd`
  * plans the diff; the RDD re-executes it per action) under a
  * streaming-flagged leaf, which is semantically right for a change
  * feed: the manifests a batch reads are immutable, so every
  * re-execution yields byte-identical rows. */
object StreamingFrame {
  def wrap(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse doorway, for a v1 streaming
    * [[org.apache.spark.sql.execution.streaming.Sink]]: `addBatch` hands
    * the sink a STREAMING-flagged DataFrame that batch writers refuse
    * (`AnalysisException: write to non-streaming dataset`), and the
    * sanctioned re-mint is the same `internalCreateDataFrame` with
    * `isStreaming = false` over the batch's physical rows — the pattern
    * Delta's `DeltaSink` uses for the same call. The micro-batch's rows
    * come from a source `getBatch`, which is replayable by the streaming
    * contract, so re-executing the pinned RDD per downstream action
    * yields identical rows. */
  def unwrap(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
