package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** ADC recall-curve probe for q121's IVF-PQ serving plan: mean recall@10
  * over a query SET as a function of nprobe (1/2/4/8 of the 16 trained
  * cells), against the exact full-scan top-10 — the eval a production ANN
  * deployment runs before picking its operating point. Composes the
  * BATCH shapes the engine already serves with: q116's per-query probe
  * ranking (probe lists are data, not driver literals), the codes-only
  * candidate scan joined ON cid (a task scans only the cells its queries
  * probe), per-query LUTs as a broadcast 64-entry map (the batch form of
  * q121's folded array literals), top-64 ADC candidates per query
  * (WindowGroupLimit — no task holds more than 64 rows per query), and
  * the exact-cosine rerank touching full embeddings for the bounded
  * candidate set only. Cost per nprobe point: probed-cell code bytes +
  * 64 embedding lookups per query — never |queries| × corpus except in
  * the ground-truth pass itself.
  *
  * Usage: SPARK_GRAFT_CPUS=16 runMain graft.AdcRecall [sfDir]
  * Prints one JSON line; numbers recorded in SCALE.md (q121 row).
  */
object AdcRecall {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_adcrecall_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, d)
    // query set: a deterministic 1-in-97 sample, capped at 50
    val queries = e.filter(pmod(col("vec_id"), lit(97L)) === 0).limit(50)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    queries.cache()
    val nq = queries.count()

    // ground truth: exact top-10 per query over the full corpus (the one
    // deliberately |queries| x corpus pass — it IS the definition)
    val wk = Window.partitionBy(col("qid"))
      .orderBy(col("cos_micro").desc, col("vec_id").asc)
    val exact = e.crossJoin(broadcast(queries))
      .select(col("qid"), col("vec_id"),
        floor(expr("graft_cosine(embedding, qv)") * 1000000)
          .cast("long").as("cos_micro"))
      .withColumn("rk", row_number().over(wk)).filter(col("rk") <= 10)
      .select(col("qid"), col("vec_id"))
    exact.cache(); exact.count()

    val (_, centroids) = Similarity.ivfTrainedServing(spark, d, 1)
    val cent = centroids.select(col("cid"), col("qv").as("cv"))
    val serving = Similarity.ivfPqServing(spark, d) // (vec_id, codes, cid)

    // per-query ADC LUT rows -> one broadcastable 64-entry map per query,
    // keyed m*16+codebook-cid (the batch form of q121's driver-side fold)
    val qd = queries.select(col("qid").as("vec_id"),
      expr("transform(qv, x -> CAST(x AS DOUBLE))").as("emb"))
    val lutMap = Similarity.pqSubvectorsOf(qd)
      .join(broadcast(Similarity.pqCodebooksCached(spark, d, 2)), Seq("m"))
      .select(col("vec_id").as("qid"),
        (col("m") * 16 + col("cid")).cast("long").as("slot"),
        expr(Similarity.L2).as("qdist"))
      .groupBy(col("qid"))
      .agg(map_from_entries(collect_list(struct(col("slot"), col("qdist"))))
        .as("lutm"))
    lutMap.cache(); lutMap.count()

    def recallAt(np: Int, rerank: Int = 64): Double = {
      val wp = Window.partitionBy(col("qid"))
        .orderBy(col("ccos").desc, col("cid").asc)
      val probes = queries.crossJoin(broadcast(cent))
        .select(col("qid"), col("cid"),
          expr("graft_cosine(cv, qv)").as("ccos"))
        .withColumn("rn", row_number().over(wp)).filter(col("rn") <= np)
        .select(col("qid"), col("cid"))
      val adc = (0 to 3).map(m => element_at(col("lutm"),
          (lit(m * 16) + col("codes").getItem(m).cast("int")).cast("long")))
        .reduce(_ + _)
      val wadc = Window.partitionBy(col("qid"))
        .orderBy(col("adc").asc, col("vec_id").asc)
      val cand = serving.join(probes, Seq("cid"))
        .join(broadcast(lutMap), Seq("qid"))
        .select(col("qid"), col("vec_id"), adc.as("adc"))
        .withColumn("rn", row_number().over(wadc)).filter(col("rn") <= rerank)
        .select(col("qid"), col("vec_id"))
      val reranked = cand.join(e, Seq("vec_id"))
        .join(broadcast(queries), Seq("qid"))
        .select(col("qid"), col("vec_id"),
          floor(expr("graft_cosine(embedding, qv)") * 1000000)
            .cast("long").as("cos_micro"))
        .withColumn("rk", row_number().over(wk)).filter(col("rk") <= 10)
        .select(col("qid"), col("vec_id"))
      if (sys.env.contains("GRAFT_ADC_PERQ")) {
        val perQ = reranked.join(exact, Seq("qid", "vec_id"))
          .groupBy("qid").count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        System.err.println(s"[adc np=$np k'=$rerank] " +
          perQ.toSeq.sortBy(_._1).map { case (q, h) => s"q$q:$h/10" }
            .mkString(" "))
      }
      reranked.join(exact, Seq("qid", "vec_id")).count().toDouble / (nq * 10.0)
    }

    val curve = Seq(1, 2, 4, 8).map(np => np -> recallAt(np))
    val body = curve.map { case (np, r) => f""""nprobe$np":$r%.4f""" }
      .mkString(",")
    // second axis: rerank budget at fixed nprobe=4 — separates coarse-
    // probe loss (curve above) from ADC-candidate-cut loss (this one);
    // at a growing corpus the fixture's K'=64 is the knob that must
    // scale with cell size
    val rr = Seq(64, 256, 1024).map(k => k -> recallAt(4, k))
    val rbody = rr.map { case (k, r) => f""""rerank$k":$r%.4f""" }.mkString(",")
    println(s"""{"adc_recall_curve":{$body},"rerank_curve_np4":{$rbody},"queries":$nq,"k":10,"cells":16,"sf":"$d"}""")
    spark.stop()
  }
}
