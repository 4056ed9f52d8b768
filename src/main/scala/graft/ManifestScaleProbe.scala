package graft

import org.apache.spark.sql.SparkSession

import graft.ops.Snapshot
import graft.ops.Snapshot.FileEntry

/** Measures the manifest's own scale envelope: a manifest lists every
  * file of its version, so PUBLISH serializes O(files) lines and a cold
  * read parses them back. At 100 TB with ~128 MB files that is ~800k
  * entries — this probe times publish + cold parse + a pruning pass at
  * 10k/100k/1M synthetic entries so the per-commit metadata cost is a
  * recorded number, not a guess. (The steady-state read path does NOT
  * pay the parse per query — the manifest cache serves warm hits — and
  * commits pay one flat sequential write, not one RPC per file.)
  *
  * Usage: runMain graft.ManifestScaleProbe
  */
object ManifestScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // sidecars = 0: bare file entries; sidecars = 6: a round-15
    // manifest shape — every write auto-stamps eligible columns, so a
    // real table carries ~one m/S line per (file, eligible column)
    for (n <- Seq(10000, 100000, 1000000); sidecars <- Seq(0, 6)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_msp_${n}_$sidecars").toString + "/t"
      val files = (0 until n).map(i =>
        FileEntry(f"data/c1_x/part-$i%07d.parquet",
          i.toLong * 1000, i.toLong * 1000 + 999))
      val colStats = (for {
        f <- files.iterator; j <- 0 until sidecars
      } yield (f.path, s"c$j") -> (f.min + j, f.max + j)).toMap
      // exercise the real publish path (serialize + tmp + atomic link)
      val (_, wt) = time(Snapshot.commitManifestForProbe(spark, dir,
        files, colStats))
      Snapshot.clearManifestCache()
      val (m, rt) = time(Snapshot.manifest(spark, dir, 1))
      // the planning arithmetic a pruned read runs over the entries
      val (hit, pt) = time(m.files.count(f =>
        f.min <= 5000000L && f.max >= 4000000L))
      val bytes = new java.io.File(s"$dir/_manifests/v00001").length()
      println(f"entries=$n%7d sidecars=$sidecars%d publish=${wt}%6.3f s" +
        f"  coldParse=${rt}%6.3f s  prune=${pt}%6.4f s ($hit hits)" +
        f"  manifestBytes=${bytes}%d")
    }
    spark.stop()
  }
}
