package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Iterative-path probe for [[graft.ops.Dedup.resolveComponents]]: the
  * fixture pair graphs (512 pairs at sf0.1, 187k at the ×10 ScaleProbe)
  * all fall under the 1M-pair union-find base case, so this main builds a
  * synthetic graph ABOVE the threshold and measures the pointer-jumping
  * loop at the width it would actually run — the loop's scale behavior is
  * measured, not assumed.
  *
  * Graph shape (deterministic, engine-side via `spark.range`): `pairs/100`
  * disjoint chains of length 100 — diameter 100 per component, the
  * adversarial shape for label propagation (star/clique graphs converge in
  * ~2 rounds; chains need the pointer jumping). Expected rounds ≈
  * log₂(100) + detection ≈ 8–9.
  *
  * Usage: SPARK_GRAFT_CPUS=16 runMain graft.CCProbe [nPairs] [uf|loop]
  * — the optional 2nd arg FORCES a resolution path (overriding the 1M
  * threshold) so the crossover itself can be measured, not assumed.
  * (GRAFT_CC_DEBUG=1 for per-round timings.) Results recorded in SCALE.md.
  */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val nPairs = args.headOption.map(_.toLong).getOrElse(4000000L)
    val forced: Option[String] = args.drop(1).headOption
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_ccprobe_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // node k links to k+1 unless it ends a 100-node chain segment; the
    // resulting components are {0..99}, {100..199}, ... with min = segment
    // start, giving a closed-form expected survivor sum to check against
    val chains = (nPairs + 98) / 99
    val actualPairs = chains * 99
    val edges = spark.range(chains * 100)
      .filter(col("id") % 100 =!= 99)
      .select(col("id").as("i"), (col("id") + 1).as("j"))
    val limit = forced match {
      case Some("uf")   => Long.MaxValue
      case Some("loop") => 0L
      case _            => graft.ops.Dedup.SmallGraphPairLimit
    }
    val t0 = System.nanoTime()
    val labels = graft.ops.Dedup.resolveComponents(edges.toDF(), limit)
    val agg = labels.agg(count(lit(1)).as("n"), sum(col("lbl")).as("s")).head
    val sec = (System.nanoTime() - t0) / 1e9
    val (nNodes, lblSum) = (agg.getLong(0), agg.getLong(1))
    // every node in chain [100c, 100c+99] resolves to 100c:
    // Σ_c 100·(100c) = 10000·C(C-1)/2
    val expectSum = 10000L * chains * (chains - 1) / 2
    val ok = nNodes == chains * 100 && lblSum == expectSum
    println(s"""{"cc_probe":{"pairs":$actualPairs,"nodes":$nNodes,""" +
      s""""path":"${if (actualPairs <= limit) "union-find" else "iterative"}",""" +
      s""""sec":${math.round(sec * 1000) / 1000.0},"labels_ok":$ok}}""")
    spark.stop()
  }
}
