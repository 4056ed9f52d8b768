package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Snapshot

/** Measures the round-15 schema-in-manifest claim: PLANNING a
  * manifest-resolved read used to open one parquet footer per file
  * (mergeSchema — the schema had to be inferred and unioned), which at
  * 100 TB / millions of files is a per-query planning tax ∝ file count.
  * With the schema stored in the manifest the scan plans with
  * `.schema(...)` and ZERO footer opens.
  *
  * Method: one table committed at N files; plan (analyze + count the
  * files via the executed scan's schema resolution, NO data job beyond
  * the aggregate) against (a) the stored-schema manifest and (b) the
  * SAME manifest with its `h` line stripped in place — byte-identical
  * files, legacy planning path. The delta is pure planning cost, and
  * the local-FS bytesRead counter separates footer I/O from listing.
  *
  * Usage: SPARK_GRAFT_CPUS=16 runMain graft.SchemaProbe [nFiles] [sfDir]
  */
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = if (args.nonEmpty) args(0).toInt else 400
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_schemaprobe").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = spark.conf.get("spark.sql.warehouse.dir")

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("order_key"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").cast("double").as("price"))
    val stored = s"$wh/sp_stored"
    val legacy = s"$wh/sp_legacy"
    Snapshot.commit(orders, stored, 0, "order_key", nFiles = nFiles)
    Snapshot.commit(orders, legacy, 0, "order_key", nFiles = nFiles)
    // strip the h line in place — the pre-round-15 manifest, same files
    val fs = new org.apache.hadoop.fs.Path(legacy)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mp = new org.apache.hadoop.fs.Path(s"$legacy/_manifests/v00001")
    val in = fs.open(mp)
    val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val os = fs.create(mp, true)
    try os.write(txt.linesIterator.filterNot(_.startsWith("h\t"))
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally os.close()

    def bytesRead(): Long =
      Option(org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics
        .get("file")).map(_.getLong("bytesRead").longValue()).getOrElse(0L)
    // planning only: building the DataFrame resolves the relation — the
    // mergeSchema path reads every footer HERE; .schema() reads none
    def plan(dir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val b0 = bytesRead()
      Snapshot.read(spark, dir).queryExecution.analyzed
      ((System.nanoTime() - t0) / 1e9, bytesRead() - b0)
    }
    // warm both paths once (FS client init, codegen of nothing)
    plan(stored); plan(legacy)
    val (ts, bs) = (1 to 5).map(_ => plan(stored)).minBy(_._1)
    val (tl, bl) = (1 to 5).map(_ => plan(legacy)).minBy(_._1)
    println(f"files=$nFiles stored-schema plan: ${ts}%.3f s, $bs bytes read")
    println(f"files=$nFiles legacy mergeSchema plan: ${tl}%.3f s, $bl bytes read")
    println(f"planning speedup ${tl / math.max(ts, 1e-9)}%.1fx, " +
      f"footer bytes avoided ${bl - bs}%d")
    spark.stop()
  }
}
