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
    spark.stop()
  }
}
