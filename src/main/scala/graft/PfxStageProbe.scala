package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Scratch probe: per-stage wall cost of the q106 prefix-filter pipeline
  * at one SF, to locate the dominant stage before optimizing. */
object PfxStageProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      // med-of-3 after one warm
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[pfxstage] $label%-28s med=${ts.map(_._1).sorted.apply(1)}%.2f rows=${ts.head._2}")
    }
    val tau = 0.5
    val sh = ops.Dedup.shingles(spark, d)
    t("shingles")(sh.count())
    val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    t("df_agg")(df.count())
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df").asc, col("sh").asc)
    val prefix = sh.join(df, Seq("sh"))
      .withColumn("pos", row_number().over(w))
      .join(sz, Seq("doc_id"))
      .filter(col("pos") <=
        col("nsh") - ceil(col("nsh") * lit(tau)).cast(LongType) + 1)
      .select(col("doc_id"), col("sh"), col("nsh"))
    t("prefix")(prefix.count())
    val cand = prefix.select(col("doc_id").as("i"), col("sh"),
                             col("nsh").as("ni"))
      .join(prefix.select(col("doc_id").as("j"), col("sh"),
                          col("nsh").as("nj")), Seq("sh"))
      .filter(col("i") < col("j") &&
        least(col("ni"), col("nj")).cast(DoubleType) /
          greatest(col("ni"), col("nj")).cast(DoubleType) >= lit(tau))
      .select(col("i"), col("j")).distinct()
    t("candidates+distinct")(cand.count())
    val sets = sh.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("sh"))).as("shs"))
    t("sets")(sets.count())
    val inter = cand
      .join(sets.select(col("doc_id").as("i"), col("shs").as("shi")), Seq("i"))
      .join(sets.select(col("doc_id").as("j"), col("shs").as("shj")), Seq("j"))
      .select(col("i"), col("j"),
        size(array_intersect(col("shi"), col("shj"))).cast(LongType).as("inter"),
        size(col("shi")).cast(LongType).as("ni"),
        size(col("shj")).cast(LongType).as("nj"))
    t("verify_full")(inter.filter(
      col("inter").cast(DoubleType) /
        (col("ni") + col("nj") - col("inter")).cast(DoubleType) >= tau).count())
    // variant A: broadcast the sets sides explicitly
    val interB = cand
      .join(broadcast(sets.select(col("doc_id").as("i"), col("shs").as("shi"))), Seq("i"))
      .join(broadcast(sets.select(col("doc_id").as("j"), col("shs").as("shj"))), Seq("j"))
      .select(col("i"), col("j"),
        size(array_intersect(col("shi"), col("shj"))).cast(LongType).as("inter"),
        size(col("shi")).cast(LongType).as("ni"),
        size(col("shj")).cast(LongType).as("nj"))
    t("verify_bcast")(interB.filter(
      col("inter").cast(DoubleType) /
        (col("ni") + col("nj") - col("inter")).cast(DoubleType) >= tau).count())
    // variant B: hash shingles to 64-bit longs up front; whole pipeline on longs
    val shH = sh.select(col("doc_id"), xxhash64(col("sh")).as("sh"))
    val dfH = shH.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val szH = shH.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val prefixH = shH.join(dfH, Seq("sh"))
      .withColumn("pos", row_number().over(w))
      .join(szH, Seq("doc_id"))
      .filter(col("pos") <=
        col("nsh") - ceil(col("nsh") * lit(tau)).cast(LongType) + 1)
      .select(col("doc_id"), col("sh"), col("nsh"))
    val candH = prefixH.select(col("doc_id").as("i"), col("sh"),
                               col("nsh").as("ni"))
      .join(prefixH.select(col("doc_id").as("j"), col("sh"),
                           col("nsh").as("nj")), Seq("sh"))
      .filter(col("i") < col("j") &&
        least(col("ni"), col("nj")).cast(DoubleType) /
          greatest(col("ni"), col("nj")).cast(DoubleType) >= lit(tau))
      .select(col("i"), col("j")).distinct()
    val setsH = shH.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("sh"))).as("shs"))
    val interH = candH
      .join(setsH.select(col("doc_id").as("i"), col("shs").as("shi")), Seq("i"))
      .join(setsH.select(col("doc_id").as("j"), col("shs").as("shj")), Seq("j"))
      .select(col("i"), col("j"),
        size(array_intersect(col("shi"), col("shj"))).cast(LongType).as("inter"),
        size(col("shi")).cast(LongType).as("ni"),
        size(col("shj")).cast(LongType).as("nj"))
    t("verify_hashed_e2e")(interH.filter(
      col("inter").cast(DoubleType) /
        (col("ni") + col("nj") - col("inter")).cast(DoubleType) >= tau).count())
    // variant C: 128-bit md5 as binary(16) identity (q81's collision class)
    val shM = sh.select(col("doc_id"), unhex(md5(col("sh"))).as("sh"))
    val dfM = shM.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val szM = shM.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val prefixM = shM.join(dfM, Seq("sh"))
      .withColumn("pos", row_number().over(w))
      .join(szM, Seq("doc_id"))
      .filter(col("pos") <=
        col("nsh") - ceil(col("nsh") * lit(tau)).cast(LongType) + 1)
      .select(col("doc_id"), col("sh"), col("nsh"))
    val candM = prefixM.select(col("doc_id").as("i"), col("sh"),
                               col("nsh").as("ni"))
      .join(prefixM.select(col("doc_id").as("j"), col("sh"),
                           col("nsh").as("nj")), Seq("sh"))
      .filter(col("i") < col("j") &&
        least(col("ni"), col("nj")).cast(DoubleType) /
          greatest(col("ni"), col("nj")).cast(DoubleType) >= lit(tau))
      .select(col("i"), col("j")).distinct()
    val setsM = shM.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("sh"))).as("shs"))
    val interM = candM
      .join(setsM.select(col("doc_id").as("i"), col("shs").as("shi")), Seq("i"))
      .join(setsM.select(col("doc_id").as("j"), col("shs").as("shj")), Seq("j"))
      .select(col("i"), col("j"),
        size(array_intersect(col("shi"), col("shj"))).cast(LongType).as("inter"),
        size(col("shi")).cast(LongType).as("ni"),
        size(col("shj")).cast(LongType).as("nj"))
    t("verify_md5_e2e")(interM.filter(
      col("inter").cast(DoubleType) /
        (col("ni") + col("nj") - col("inter")).cast(DoubleType) >= tau).count())
    // variant D: string identity, native merge-walk count (exact, no hash)
    val interD = cand
      .join(sets.select(col("doc_id").as("i"), col("shs").as("shi")), Seq("i"))
      .join(sets.select(col("doc_id").as("j"), col("shs").as("shj")), Seq("j"))
      .select(col("i"), col("j"),
        expr("graft_sorted_inter_count(shi, shj)").as("inter"),
        size(col("shi")).cast(LongType).as("ni"),
        size(col("shj")).cast(LongType).as("nj"))
    t("verify_mergewalk_e2e")(interD.filter(
      col("inter").cast(DoubleType) /
        (col("ni") + col("nj") - col("inter")).cast(DoubleType) >= tau).count())
    spark.stop()
  }
}
