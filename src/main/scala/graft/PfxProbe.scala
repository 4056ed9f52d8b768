package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the q106 prefix filter's candidate pruning vs the naive
  * shingle self-join (SCALE.md evidence), on two corpora:
  *  - the FIXTURE documents table — a worst case for prefix filtering
  *    (31-token vocabulary ⇒ every shingle is hot, no rare head to
  *    prune on);
  *  - a deterministic ZIPFIAN synthetic corpus — the shape real text
  *    has, where the df distribution's long rare tail is exactly what
  *    rare-first prefixes exploit. Tokens are drawn rank ∝ 1/r via the
  *    inverse-CDF trick rank = ⌊V^u⌋ (log-uniform ≡ Zipf s=1) with u a
  *    per-(doc, slot) xxhash64 — no RNG state, fully replayable.
  */
object PfxProbe {

  /** (naive candidate pairs, prefix-filtered candidate pairs, shingle
    * rows, prefix rows) for a (doc_id, sh) set table at tau. The prefix
    * construction is the q106 spelling. */
  private def candCounts(sh: DataFrame, tau: Double): (Long, Long, Long, Long) = {
    val naive = sh.select(col("doc_id").as("i"), col("sh"))
      .join(sh.select(col("doc_id").as("j"), col("sh")), Seq("sh"))
      .filter(col("i") < col("j")).select("i", "j").distinct().count()
    val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df").asc, col("sh").asc)
    val prefix = sh.join(df, Seq("sh"))
      .withColumn("pos", row_number().over(w))
      .join(sz, Seq("doc_id"))
      .filter(col("pos") <= col("nsh") - ceil(col("nsh") * tau).cast("long") + 1)
      .select(col("doc_id"), col("sh"))
    val pfx = prefix.select(col("doc_id").as("i"), col("sh"))
      .join(prefix.select(col("doc_id").as("j"), col("sh")), Seq("sh"))
      .filter(col("i") < col("j")).select("i", "j").distinct().count()
    (naive, pfx, sh.count(), prefix.count())
  }

  /** nDocs docs of docLen token draws (deduped to sets) over a V-token
    * Zipf(1) vocabulary, deterministic in (doc, slot). */
  private def zipfCorpus(spark: SparkSession, nDocs: Long, docLen: Int,
                         v: Long): DataFrame =
    spark.range(nDocs).select(col("id").as("doc_id"),
        explode(expr(s"sequence(0, ${docLen - 1})")).as("slot"))
      .select(col("doc_id"),
        concat(lit("t"), floor(pow(lit(v.toDouble),
          pmod(xxhash64(col("doc_id") * lit(1000003L) + col("slot")),
               lit(1000000L)).cast("double") / lit(1000000.0)))
          .cast("long")).as("sh"))
      .distinct()

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val taus = Seq(0.5, 0.7, 0.9)

    val sh = ops.Dedup.shingles(spark, d).persist()
    for (tau <- taus) {
      val (naive, pfx, shRows, pfxRows) = candCounts(sh, tau)
      println(s"[pfx] fixture $d tau=$tau shingleRows=$shRows " +
        s"prefixRows=$pfxRows naiveCandidates=$naive " +
        f"prefixCandidates=$pfx reduction=${naive.toDouble / pfx}%.1fx")
    }
    sh.unpersist()

    // Zipfian corpus: 20k docs x ~50 tokens over a 10k-token vocabulary
    val z = zipfCorpus(spark, 20000L, 50, 10000L).persist()
    for (tau <- taus) {
      val (znaive, zpfx, zshRows, zpfxRows) = candCounts(z, tau)
      println(s"[pfx] zipf V=10000 docs=20000 len=50 tau=$tau " +
        s"shingleRows=$zshRows prefixRows=$zpfxRows " +
        s"naiveCandidates=$znaive prefixCandidates=$zpfx " +
        f"reduction=${znaive.toDouble / zpfx}%.1fx")
    }
    spark.stop()
  }
}
