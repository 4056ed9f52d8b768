package graft

import org.apache.spark.sql.SparkSession

/** Micro-benchmark for plan-shape decisions the engine makes on measured
  * numbers rather than intuition. Currently: the q66 SimHash signature
  * build — explode x60 narrow rows vs one 60-column wide aggregate (see
  * ops/Dedup.simhashSignatures). Median-of-3 per shape, same discipline as
  * Bench. Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.BenchShapes;
  * results recorded in SCALE.md.
  */
object BenchShapes {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_benchshapes_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT + parquet footers, untimed
    ops.Dedup.simhashSignatures(spark, sfDir, wide = false).count()
    def med3(thunk: => Long): (Double, Long) = {
      val runs = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        val n = thunk
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (runs.map(_._1).sorted.apply(1), runs.head._2)
    }
    val (tExplode, nE) =
      med3(ops.Dedup.simhashPairs(
        ops.Dedup.simhashSignatures(spark, sfDir, wide = false)).count())
    val (tWide, nW) =
      med3(ops.Dedup.simhashPairs(
        ops.Dedup.simhashSignatures(spark, sfDir, wide = true)).count())
    require(nE == nW, s"shapes must agree: explode=$nE wide=$nW")
    println(f"""{"shape_bench":"q66_simhash","sf":"$sfDir","pairs":$nE,"explode_sec":$tExplode%.3f,"wide_sec":$tWide%.3f}""")

    // span-dedup winner shapes (q99): md5(span)-partitioned window anchor
    // vs the salted aggregate path — on a skewed corpus (one boilerplate
    // span planted in 30% of documents, the shape the salt exists for)
    import org.apache.spark.sql.functions._
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val skewed = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) < 3,
          concat(lit(boiler + " "), col("text"))).otherwise(col("text"))
          .as("text"))
    val wSpan = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k"))
    val (tWin, nWin) = med3(ops.Dedup.spanVerdict(
      ops.Dedup.spanFrame(skewed).withColumn("kept",
        struct(col("doc_id"), col("span_idx")) ===
          min(struct(col("doc_id"), col("span_idx"))).over(wSpan))).count())
    val (tSalt, nSalt) = med3(ops.Dedup.spanDedupSalted(skewed, 8).count())
    require(nWin == nSalt, s"span shapes must agree: window=$nWin salted=$nSalt")
    println(f"""{"shape_bench":"q99_span_winner","sf":"$sfDir","docs":$nWin,"window_sec":$tWin%.3f,"salted_sec":$tSalt%.3f}""")

    // q95 drain width (the state-store-count knob): a stream-stream join
    // keeps 4 state stores per shuffle partition, each paying delta-file +
    // commit fixed cost per batch, so the drain's width should follow the
    // JOIN KEY cardinality (user_id: thousands), not the corpus scan
    // width. Sweep the widths; the registered q95 pins the winner.
    val widths = Seq(2, 4, 8, 16)
    val sweep = widths.map { w =>
      // warm once per width so first-use codegen/store init is untimed
      ops.StreamOps.streamStreamJoinDrain(spark, sfDir, w).count()
      val (t, n) = med3(ops.StreamOps.streamStreamJoinDrain(spark, sfDir, w).count())
      (w, t, n)
    }
    require(sweep.map(_._3).distinct.size == 1,
      s"q95 output must be width-invariant: $sweep")
    val body = sweep.map { case (w, t, _) => f""""w$w":$t%.3f""" }.mkString(",")
    println(s"""{"shape_bench":"q95_drain_width","sf":"$sfDir","rows":${sweep.head._3},$body}""")
    spark.stop()
  }
}
