package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Snapshot

/** Measures the q155/q156 claim — a SCATTERED delete under deletion
  * vectors costs a position scan plus one manifest publish, while the
  * COW rewrite re-pays every touched file — on a table ×N the sf0.1
  * orders load. The probe predicate (`order_key % 9973 = 0`) touches a
  * handful of rows in EVERY file, the worst case for COW (the whole
  * table rewrites) and the design case for MoR (positions ∝ matches).
  * Also measures the MoR read tax: the same full-table aggregate on
  * the DV'd version vs the COW'd version — the anti-join's price until
  * a rewrite materializes the masks.
  *
  * Usage: SPARK_GRAFT_CPUS=16 runMain graft.DvProbe [xN] [sfDir]
  */
object DvProbe {
  def main(args: Array[String]): Unit = {
    val xN = if (args.nonEmpty) args(0).toInt else 10
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_dvprobe_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = spark.conf.get("spark.sql.warehouse.dir")

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("order_key"),
        col("o_custkey").as("cust_key"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").cast("double").as("price"))
    val reps = (0 until xN).map(i => orders
      .withColumn("order_key", col("order_key") + lit(i.toLong * 100000000L)))
    val base = reps.reduce(_ unionAll _)

    def build(dir: String): Unit =
      Snapshot.commit(base, dir, 0, "order_key", nFiles = 16)
    def bytesOf(dir: String, v: Int): Long =
      Snapshot.manifest(spark, dir, v).files
        .map(f => Snapshot.entryLen(spark, dir, f.path)).sum
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val dirDv = s"$wh/dvprobe_mor"
    val dirCow = s"$wh/dvprobe_cow"
    build(dirDv); build(dirCow)
    val hi = 10000000000L
    val scattered = col("order_key") % 9973 === 0

    val (_, tDv) = time(Snapshot.deleteWhereDV(spark, dirDv, 0L, hi, scattered))
    val (_, tCow) = time(Snapshot.deleteWhere(spark, dirCow, 0L, hi, scattered,
      nFiles = 16))
    val mDv = Snapshot.manifest(spark, dirDv, 2)
    val nPos = mDv.dvs.values.map(_.length).sum
    val dvBytes = bytesOf(dirDv, 2) - bytesOf(dirDv, 1) // 0 by design
    val cowBytes = bytesOf(dirCow, 2)
    // read tax: identical aggregate over the masked vs rewritten state
    def agg(dir: String): Double = {
      val (_, t) = time(Snapshot.read(spark, dir)
        .agg(sum(col("price"))).head())
      t
    }
    agg(dirDv); agg(dirCow) // warm
    val rDv = (1 to 3).map(_ => agg(dirDv)).min
    val rCow = (1 to 3).map(_ => agg(dirCow)).min
    // materialization: one OPTIMIZE pays the masks off
    val (_, tOpt) = time(Snapshot.compactVersion(spark, dirDv, 128L << 20))
    val rAfter = (1 to 3).map(_ => agg(dirDv)).min

    val total = bytesOf(dirDv, 1)
    println(f"x$xN%d: ${base.count()}%d rows, 16 files, " +
      f"${total / 1e6}%.1f MB; scattered matches = $nPos%d rows " +
      f"(every file touched)")
    println(f"deleteWhereDV  ${tDv}%.2f s, wrote ${dvBytes}%d data bytes " +
      f"(${mDv.dvs.size}%d vectors, $nPos%d positions)")
    println(f"deleteWhere    ${tCow}%.2f s, rewrote ${cowBytes / 1e6}%.1f MB")
    println(f"write speedup ${tCow / tDv}%.1fx; bytes avoided " +
      f"${cowBytes / 1e6}%.1f MB")
    println(f"read  DV ${rDv}%.3f s vs COW ${rCow}%.3f s " +
      f"(tax ${(rDv / rCow - 1) * 100}%.0f%%); after OPTIMIZE " +
      f"(${tOpt}%.2f s): ${rAfter}%.3f s")
    spark.stop()
  }
}
