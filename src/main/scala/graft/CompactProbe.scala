package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Snapshot

/** Measures the q150 claim — INCREMENTAL OPTIMIZE costs ∝ the small
  * tail, full compaction costs ∝ the table — on a table ×N the sf0.1
  * orders load: one wide base commit (well-sized files) accretes a
  * micro-batch tail, then `compactSmall` (tail only) and
  * `compactVersion` (full rewrite) run on IDENTICAL copies of that
  * state and report wall seconds and bytes rewritten. The gap is the
  * steady-state maintenance bill at 100 TB: the full rewrite re-pays
  * the whole table to absorb a day of micro-batches, the bin-pack
  * re-pays only the day.
  *
  * Usage: SPARK_GRAFT_CPUS=16 runMain graft.CompactProbe [xN] [sfDir]
  */
object CompactProbe {
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
        java.nio.file.Files.createTempDirectory("graft_cprobe_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = spark.conf.get("spark.sql.warehouse.dir")

    // base = orders ×N with disjoint key bands per replica (the ×10
    // synthetic-scaling recipe); tail = 8 micro-batches of one key
    // slice each
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("order_key"),
        col("o_custkey").as("cust_key"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").cast("double").as("price"))
    val reps = (0 until xN).map(i => orders
      .withColumn("order_key", col("order_key") + lit(i.toLong * 100000000L)))
    val base = reps.reduce(_ unionAll _)

    def build(dir: String): Unit = {
      Snapshot.commit(base, dir, 0, "order_key", nFiles = 16)
      (0 until 8).foreach { i =>
        val b = orders.filter(col("order_key") % 400 === i).select(
          (col("order_key") + 9000000000L + i).as("order_key"),
          col("cust_key"), lit("S").as("status"), col("price"))
        val cur = Snapshot.currentVersion(spark, dir)
        val m = Snapshot.manifest(spark, dir, cur)
        Snapshot.commit(b, dir, cur, "order_key", m.files, nFiles = 1)
      }
    }
    def bytesOf(dir: String, v: Int): Long =
      Snapshot.manifest(spark, dir, v).files
        .map(f => Snapshot.entryLen(spark, dir, f.path)).sum
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val dirA = s"$wh/cprobe_small"
    val dirB = s"$wh/cprobe_full"
    build(dirA); build(dirB)
    val m9 = Snapshot.manifest(spark, dirA, 9)
    val basePaths = Snapshot.manifest(spark, dirA, 1).files.map(_.path).toSet
    val sizes = m9.files.map(f => f.path ->
      Snapshot.entryLen(spark, dirA, f.path)).toMap
    val minBase = m9.files.filter(f => basePaths(f.path))
      .map(f => sizes(f.path)).min
    val tailBytes = m9.files.filterNot(f => basePaths(f.path))
      .map(f => sizes(f.path)).sum
    val totalBytes = sizes.values.sum

    val (_, tSmall) = time(Snapshot.compactSmall(spark, dirA, minBase))
    val (_, tFull) = time(Snapshot.compactVersion(spark, dirB, 128L << 20))
    val nSmall = Snapshot.manifest(spark, dirA,
      Snapshot.currentVersion(spark, dirA)).files.size
    val nFull = Snapshot.manifest(spark, dirB,
      Snapshot.currentVersion(spark, dirB)).files.size
    println(f"x$xN%d base+tail: ${m9.files.size}%d files, " +
      f"total ${totalBytes / 1e6}%.1f MB, tail ${tailBytes / 1e6}%.3f MB")
    println(f"compactSmall  ${tSmall}%.2f s -> $nSmall%d files " +
      f"(rewrote ${tailBytes / 1e6}%.3f MB)")
    println(f"compactVersion ${tFull}%.2f s -> $nFull%d files " +
      f"(rewrote ${totalBytes / 1e6}%.1f MB)")
    println(f"speedup ${tFull / tSmall}%.1fx; bytes ratio " +
      f"${totalBytes.toDouble / math.max(1L, tailBytes)}%.0fx")
    spark.stop()
  }
}
