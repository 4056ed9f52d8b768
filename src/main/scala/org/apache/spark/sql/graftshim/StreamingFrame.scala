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
}
