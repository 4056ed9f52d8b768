package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the q106 prefix filter's candidate pruning vs the naive
  * shingle self-join at a fixture SF (SCALE.md evidence). */
object PfxProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sh = ops.Dedup.shingles(spark, d).persist()
    val naivePairs = sh.select(col("doc_id").as("i"), col("sh"))
      .join(sh.select(col("doc_id").as("j"), col("sh")), Seq("sh"))
      .filter(col("i") < col("j")).select("i", "j").distinct().count()
    val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df").asc, col("sh").asc)
    val prefix = sh.join(df, Seq("sh"))
      .withColumn("pos", row_number().over(w))
      .join(sz, Seq("doc_id"))
      .filter(col("pos") <= col("nsh") - ceil(col("nsh") * 0.5).cast("long") + 1)
      .select(col("doc_id"), col("sh"))
    val prefixPairs = prefix.select(col("doc_id").as("i"), col("sh"))
      .join(prefix.select(col("doc_id").as("j"), col("sh")), Seq("sh"))
      .filter(col("i") < col("j")).select("i", "j").distinct().count()
    val shRows = sh.count(); val pfxRows = prefix.count()
    println(s"[pfx] $d shingleRows=$shRows prefixRows=$pfxRows " +
      s"naiveCandidates=$naivePairs prefixCandidates=$prefixPairs")
    spark.stop()
  }
}
