package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Snapshot

/** Measures the q157 claim — column mapping's read overhead is a
  * projection that whole-stage codegen collapses to zero — on a ×N
  * orders snapshot: the SAME aggregate over the same files, once on an
  * unmapped table and once after RENAME + DROP (logical names in the
  * query, physical names in the files).
  *
  * Usage: SPARK_GRAFT_CPUS=16 runMain graft.MapProbe [xN] [sfDir]
  */
object MapProbe {
  def main(args: Array[String]): Unit = {
    val xN = if (args.nonEmpty) args(0).toInt else 10
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_mapprobe").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = spark.conf.get("spark.sql.warehouse.dir")

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("order_key"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").cast("double").as("price"),
        col("o_orderpriority").as("prio"))
    val base = (0 until xN).map(i => orders
        .withColumn("order_key", col("order_key") + lit(i.toLong * 100000000L)))
      .reduce(_ unionAll _)

    val plain = s"$wh/map_plain"
    val mapped = s"$wh/map_mapped"
    Snapshot.commit(base, plain, 0, "order_key", nFiles = 16)
    Snapshot.commit(base, mapped, 0, "order_key", nFiles = 16)
    Snapshot.renameColumn(spark, mapped, "price", "amount")
    Snapshot.renameColumn(spark, mapped, "order_key", "id")
    Snapshot.dropColumn(spark, mapped, "prio")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def aggPlain(): Unit = { Snapshot.read(spark, plain)
      .groupBy("status").agg(sum("price"), max("order_key")).collect(); () }
    def aggMapped(): Unit = { Snapshot.read(spark, mapped)
      .groupBy("status").agg(sum("amount"), max("id")).collect(); () }
    aggPlain(); aggMapped() // warm
    val tp = (1 to 5).map(_ => time(aggPlain())).min
    val tm = (1 to 5).map(_ => time(aggMapped())).min
    // pruned read through the RENAMED clustering column
    val pr = (1 to 5).map(_ => time {
      Snapshot.readPruned(spark, mapped, 100L, 5000L).agg(count(lit(1)))
        .collect(); () }).min
    println(f"x$xN%d: ${base.count()}%d rows, 16 files")
    println(f"agg plain   ${tp}%.3f s")
    println(f"agg mapped  ${tm}%.3f s (overhead ${(tm / tp - 1) * 100}%.0f%%)")
    println(f"pruned read on renamed key ${pr}%.3f s")
    spark.stop()
  }
}
