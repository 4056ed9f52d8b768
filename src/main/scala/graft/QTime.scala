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
    // same untimed warmup as Bench so numbers are comparable; best-effort
    // because a synthetic probe corpus (ScaleProbe) carries only the
    // documents/embeddings/events/orders tables — a missing warmup table
    // must not block timing the queries that DO run there
    Seq("q01_scan_project", "q21_agg_groupby").foreach { w =>
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[qtime] warmup $w skipped: ${e.getMessage}") }
    }
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
