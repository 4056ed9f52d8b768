package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes the deletion-vector READ tax on a ×10 orders scan:
  * plain aggregate vs +metadata columns vs +broadcast anti-join vs
  * +long-only-key join — the measurement that showed the anti-join's
  * per-row probe (not metadata materialization) was the cost and
  * motivated the native [[graft.expressions.DvMembership]] probe
  * (SCALE.md's DvProbe section records the before/after). */
object DvTax {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_dvtax").toString
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice").cast("double").as("price"))
    (0 until 10).map(i => orders.withColumn("k", col("k") + lit(i * 100000000L)))
      .reduce(_ unionAll _).repartition(16).write.parquet(s"$wh/t")
    val del = (1 to 151).map(i => (s"part-$i.parquet", i.toLong)).toDF("_dv_f", "_dv_i")
    def time(tag: String)(body: => Unit): Unit = {
      (1 to 4).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.drop(1).min match { case t => println(f"$tag%-28s ${t}%.3f s") }
    }
    val plain = spark.read.parquet(s"$wh/t")
    time("plain agg") { plain.agg(sum("price")).head() }
    val withMeta = plain
      .withColumn("_dv_f", col("_metadata.file_name"))
      .withColumn("_dv_i", col("_metadata.row_index"))
    time("meta cols only") { withMeta.drop("_dv_f", "_dv_i").agg(sum("price")).head() }
    time("meta + project") { withMeta.agg(sum("price")).head() }
    time("meta + anti-join") {
      withMeta.join(broadcast(del), Seq("_dv_f", "_dv_i"), "left_anti")
        .drop("_dv_f", "_dv_i").agg(sum("price")).head()
    }
    time("anti-join long-key only") {
      withMeta.drop("_dv_f")
        .join(broadcast(del.select("_dv_i").distinct()), Seq("_dv_i"), "left_anti")
        .drop("_dv_i").agg(sum("price")).head()
    }
    spark.stop()
  }
}
