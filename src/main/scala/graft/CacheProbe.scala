package graft

import org.apache.spark.sql.SparkSession

import graft.ops.Snapshot

/** Measures the manifest-cache claim: `history`/`versionAtTimestamp`
  * walk EVERY retained version, so on a streaming table with hundreds
  * of commits each call used to re-read + re-parse hundreds of
  * manifests. With the JVM-wide cache the walk pays one getFileStatus
  * per version and zero parses after the first call.
  *
  * Usage: runMain graft.CacheProbe [nCommits]
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 150
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_cacheprobe").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = spark.conf.get("spark.sql.warehouse.dir") + "/cp_table"

    // n single-row commits — the micro-batch accretion shape a
    // streaming sink leaves behind
    Snapshot.commit(Seq((1L, "v")).toDF("k", "v"), dir, 0, "k", nFiles = 1)
    (2 to n).foreach { i =>
      val m = Snapshot.manifest(spark, dir, i - 1)
      Snapshot.commit(Seq((i.toLong, "v")).toDF("k", "v"), dir, i - 1, "k",
        carried = m.files, nFiles = 1)
    }

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    Snapshot.clearManifestCache() // the build loop warmed it — drop that
    val p0 = Snapshot.manifestParses.get()
    val cold = time(Snapshot.history(spark, dir).count())
    val coldParses = Snapshot.manifestParses.get() - p0
    val warm = (1 to 5).map(_ =>
      time(Snapshot.history(spark, dir).count())).min
    val warmParses = Snapshot.manifestParses.get() - p0 - coldParses
    println(f"commits=$n history cold: ${cold}%.3f s ($coldParses parses)")
    println(f"commits=$n history warm: ${warm}%.3f s ($warmParses parses)")
    println(f"walk speedup ${cold / math.max(warm, 1e-9)}%.1fx")
    spark.stop()
  }
}
