package graft

import org.apache.spark.sql.SparkSession

/** Round-21 optimization probes.
  *
  * `phase` mode decomposes a query's wall time into CONSTRUCTION (the
  * registered closure building the DataFrame — includes any staging /
  * memoized fixture work on first call), PLANNING (analysis + optimization
  * + physical planning via `queryExecution.executedPlan`), and EXECUTION
  * (`count()` on the already-planned frame) — the split the full bench
  * cannot see, separating fixed per-query overhead from real compute.
  *
  * `stream` mode raises the streaming engine's log level to INFO before
  * running the named streaming queries so each micro-batch's
  * `durationMs` breakdown (addBatch / getBatch / walCommit / stateStore
  * commit …) lands in the captured log — guide §1's "decide where the
  * time goes" applied to the drain lifecycles.
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 runMain graft.R21Probe phase <sfDir> <runs> <prefix...>
  *   SPARK_GRAFT_CPUS=32 runMain graft.R21Probe stream <sfDir> <runs> <prefix...>
  */
object R21Probe {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "phase"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val prefixes = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_r21_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (mode == "stream") {
      // per-batch durationMs lands in the "Streaming query made progress"
      // INFO line of the streaming package
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.streaming",
        org.apache.logging.log4j.Level.INFO)
      // per-job wall times ("Job N finished ... took X s") — the job-level
      // decomposition of a drain's addBatch
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.scheduler.DAGScheduler",
        org.apache.logging.log4j.Level.INFO)
    }
    Seq("q01_scan_project", "q21_agg_groupby").foreach { w =>
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[r21] warmup $w skipped: ${e.getMessage}") }
    }
    if (mode == "width") {
      // q73/q74 state-width sweep (the q95_drain_width discipline):
      // interleaved min-of-N per width, rows asserted width-invariant
      val widths = Seq(2, 4, 8)
      def sweep(tag: String, fn: Int => Long): Unit = {
        widths.foreach(w => fn(w)) // warm each width once (codegen, stage)
        val res = (1 to runs).flatMap(_ => widths.map { w =>
          val t0 = System.nanoTime()
          val n = fn(w)
          (w, (System.nanoTime() - t0) / 1e9, n)
        })
        require(res.map(_._3).distinct.size == 1,
          s"$tag output must be width-invariant: $res")
        widths.foreach { w =>
          val ts = res.collect { case (`w`, t, _) => t }
          println(f"$tag%-18s width=$w%-3d min=${ts.min}%.2f  " +
            ts.map(t => f"$t%.2f").mkString(" "))
        }
      }
      sweep("q73_watermark", w => ops.StreamOps.watermarkDrain(spark, sfDir, w).count())
      sweep("q74_dedup", w => ops.StreamOps.q74drain(spark, sfDir, w).count())
      // re-sweep q95 post-no-tail: the r20 width choice was measured WITH
      // the trailing no-data batch the round removed
      sweep("q95_ssjoin", w => ops.StreamOps.streamStreamJoinDrain(spark, sfDir, w).count())
      spark.stop(); return
    }
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.isEmpty || prefixes.exists(n.startsWith) }
    qs.foreach { case (name, fn) =>
      val rows = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        // exactly the frame Bench's count() executes, planned eagerly so
        // plan and execution separate cleanly
        val cdf = df.groupBy().count()
        val _ = cdf.queryExecution.executedPlan
        val t2 = System.nanoTime()
        val n = cdf.collect().head.getLong(0)
        val t3 = System.nanoTime()
        (n, (t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      val c = rows.map(_._2).min; val p = rows.map(_._3).min
      val e = rows.map(_._4).min
      println(f"${name}%-30s rows=${rows.head._1}%-8d construct=${c}%6.3f " +
        f"plan=${p}%6.3f exec=${e}%6.3f  total_min=${
          rows.map(r => r._2 + r._3 + r._4).min}%6.3f")
    }
    spark.stop()
  }
}
