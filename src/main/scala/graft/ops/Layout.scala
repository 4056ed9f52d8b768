package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Physical-layout operators for the two shuffle problems that dominate at
  * 100 TB: repeated joins on the same key (solved by bucketing) and skewed
  * join keys (solved by salting; AQE's skew-join handles the in-flight
  * case, salting handles the planned case).
  *
  * The reference stages everything as flat files and lets Postgres re-hash
  * per query (/root/reference/dags/patient_claims_plus_postgres.py:55-56,
  * 187-189); on Spark the staging step is where layout is decided, so these
  * belong to the ingest surface (SURVEY §2-A A5/A10).
  */
object Layout {

  /** Stage a table bucketed+sorted on its join key. Two tables staged with
    * the same bucket count join with NO Exchange on either side (verified
    * in LayoutSpec against the executed plan) — at scale this converts
    * every subsequent join/aggregation on `key` from a full shuffle into a
    * per-bucket local merge. */
  def stageBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Deterministic salted equi-join for skewed keys. The left (large,
    * skewed) side gets a salt derived from a row-level column — never
    * rand(), so replays and retries stay deterministic — and the right
    * side is replicated `salt` ways, splitting each hot key's rows across
    * `salt` reducers. Result set is identical to `left.join(right, key)`
    * (pinned in LayoutSpec). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 leftSaltSource: String, salt: Int): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(leftSaltSource)), lit(salt)).cast(IntegerType))
    val r = right
      .withColumn("__salt", explode(expr(s"sequence(0, ${salt - 1})")))
      .withColumn("__salt", col("__salt").cast(IntegerType))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
