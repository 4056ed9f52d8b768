package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing probe for iteration: runs the named queries (by
  * exact id or prefix) N times each against one SF dir and prints per-run
  * wall seconds. Unlike [[Bench]] it times only what you name, so an
  * optimization loop on one query doesn't pay the full-surface sweep.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.QTime <sfDir> <runs> <prefix ...>
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 2
    val prefixes = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_qtime_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same untimed warmup as Bench so numbers are comparable
    SparkEntry.queries("q01_scan_project")(spark, sfDir).count()
    SparkEntry.queries("q21_agg_groupby")(spark, sfDir).count()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.isEmpty || prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          (dt, n)
        }
        val secs = times.map(_._1)
        println(f"$name%-28s rows=${times.head._2}%-8d " +
          secs.map(t => f"$t%.2f").mkString(" ") +
          f"  min=${secs.min}%.2f")
      }
    spark.stop()
  }
}
