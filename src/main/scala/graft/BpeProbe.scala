package graft

import org.apache.spark.sql.SparkSession

/** Tokenizer-scale probe for the two BPE apply paths (SCALE.md "BPE apply"
  * row): learn a `ranks`-deep merge table on the small fixture, then time
  * encoding the larger fixture corpus with
  *
  *  - the native [[graft.expressions.BpeEncode]] (q85's path — per-token
  *    cost independent of table size), and
  *  - the spliced replace() fold (q82's path — one replace per rank in
  *    the expression tree, O(ranks × len) per token),
  *
  * and assert both report the SAME total piece count (the fold == native
  * contract at probe scale, on a table two orders past the fixed 12
  * ranks). A real 50k-merge GPT table only widens the gap; the fold is
  * kept as the oracle-transparent reference, the native path is the one
  * a deployment applies.
  *
  * Usage: runMain graft.BpeProbe [trainDir] [applyDir] [ranks]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val trainDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val applyDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val ranks = if (args.length > 2) args(2).toInt else 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_bpe_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.TextOps
    def sec(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    val tTrain = System.nanoTime()
    val merges = TextOps.learnBpeMerges(
      Tables.documents(spark, trainDir).select("text"), ranks)
    val trainSec = sec(tTrain)

    val toks = Tables.documents(spark, applyDir)
      .selectExpr("explode(split(text, ' ')) AS t").cache()
    val nToks = toks.count()

    def timePieces(pieceExpr: String, runs: Int): (Double, Long) = {
      var total = 0L
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        total = toks.selectExpr(s"CAST(size($pieceExpr) AS BIGINT) AS n")
          .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
        sec(t0)
      }
      (times.sorted.apply(runs / 2), total)
    }
    val (nativeSec, nativePieces) =
      timePieces(TextOps.bpeNativePieces(merges), 3)
    val (foldSec, foldPieces) = timePieces(
      s"filter(split(${TextOps.bpeMergedExpr(merges)}, '~'), p -> p != '')", 3)
    require(nativePieces == foldPieces,
      s"fold/native disagree at $ranks ranks: $foldPieces vs $nativePieces")
    println(f"""{"probe":"bpe_apply","ranks":$ranks,"train_sec":$trainSec%.1f,""" +
      f""""tokens":$nToks,"pieces":$nativePieces,""" +
      f""""native_sec":$nativeSec%.2f,"fold_sec":$foldSec%.2f,""" +
      f""""speedup":${foldSec / nativeSec}%.1f}""")
    spark.stop()
  }
}
