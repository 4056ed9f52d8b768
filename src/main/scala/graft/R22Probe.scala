package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-22 optimization duels for the exact-pair dedup family
  * (q61/q106/q111): variant plan shapes measured against the shipped
  * implementations, outputs asserted row-identical before any timing is
  * trusted. Usage:
  *   SPARK_GRAFT_CPUS=32 runMain graft.R22Probe <sfDir> <runs> [family...]
  */
object R22Probe {
  // ---- q61 variants -------------------------------------------------
  /** V1: carry nsh through the self-join instead of re-joining sz twice —
    * removes two post-agg broadcast subtrees (each a full explode+agg). */
  private def jaccardV1(sh: DataFrame, tau: Double,
                        hint: String): DataFrame = {
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val side = sh.join(broadcast(sz), Seq("doc_id"))
    val left = side.select(col("doc_id").as("i"), col("sh"),
                           col("nsh").as("ni"))
    val right0 = side.select(col("doc_id").as("j"), col("sh"),
                             col("nsh").as("nj"))
    val right = if (hint.isEmpty) right0 else right0.hint(hint)
    left.join(right, Seq("sh"))
      .filter(col("i") < col("j"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("inter"),
           min(col("ni")).as("ni"), min(col("nj")).as("nj"))
      .withColumn("uni", col("ni") + col("nj") - col("inter"))
      .withColumn("jac",
        col("inter").cast(DoubleType) / col("uni").cast(DoubleType))
      .filter(col("jac") >= tau)
      .select(col("i"), col("j"), col("inter"), col("uni"), col("jac"))
  }

  // ---- q106 variants ------------------------------------------------
  /** Current shipped shape, with knobs: candidate-join hint (empty =
    * planner's BHJ; "shuffle_hash"/"merge" force a shuffle join whose
    * exchange the other side reuses) and optional localCheckpoint of the
    * prefix/sets diamonds. */
  private def prefixV(sh: DataFrame, tau: Double, hint: String,
                      ckptPrefix: Boolean, ckptSets: Boolean,
                      setsHint: String = ""): DataFrame = {
    val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("sh").asc)
    val prefix0 = sh.join(df, Seq("sh"))
      .withColumn("pos", row_number().over(w))
      .join(sz, Seq("doc_id"))
      .filter(col("pos") <=
        col("nsh") - ceil(col("nsh") * lit(tau)).cast(LongType) + 1)
      .select(col("doc_id"), col("sh"), col("nsh"))
    val prefix = if (ckptPrefix) prefix0.localCheckpoint(true) else prefix0
    val right0 = prefix.select(col("doc_id").as("j"), col("sh"),
                               col("nsh").as("nj"))
    val right = if (hint.isEmpty) right0 else right0.hint(hint)
    val cand = prefix.select(col("doc_id").as("i"), col("sh"),
                             col("nsh").as("ni"))
      .join(right, Seq("sh"))
      .filter(col("i") < col("j") &&
        least(col("ni"), col("nj")).cast(DoubleType) /
          greatest(col("ni"), col("nj")).cast(DoubleType) >= lit(tau))
      .select(col("i"), col("j")).distinct()
    val sets0 = sh.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("sh"))).as("shs"))
    val sets = if (ckptSets) sets0.localCheckpoint(true) else sets0
    def sh2(df: DataFrame) = if (setsHint.isEmpty) df else df.hint(setsHint)
    val inter = cand
      .join(sh2(sets.select(col("doc_id").as("i"), col("shs").as("shi"))), Seq("i"))
      .join(sh2(sets.select(col("doc_id").as("j"), col("shs").as("shj"))), Seq("j"))
      .select(col("i"), col("j"),
        expr("graft_sorted_inter_count(shi, shj)").as("inter"),
        size(col("shi")).cast(LongType).as("ni"),
        size(col("shj")).cast(LongType).as("nj"))
    inter
      .withColumn("uni", col("ni") + col("nj") - col("inter"))
      .withColumn("jac",
        col("inter").cast(DoubleType) / col("uni").cast(DoubleType))
      .filter(col("jac") >= tau)
      .select(col("i"), col("j"), col("inter"), col("uni"), col("jac"))
  }

  // ---- q111 variants ------------------------------------------------
  private def containV(sh: DataFrame, tau: Double,
                       ckptSets: Boolean,
                       setsHint: String = ""): DataFrame = {
    val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("sh").asc)
    val prefix = sh.join(df, Seq("sh"))
      .withColumn("pos", row_number().over(w))
      .join(sz, Seq("doc_id"))
      .filter(col("pos") <=
        col("nsh") - floor(col("nsh") * lit(tau)).cast(LongType) + 1)
      .select(col("doc_id"), col("sh"), col("nsh"))
    val cand = prefix.select(col("doc_id").as("i"), col("sh"),
                             col("nsh").as("ni"))
      .join(sh.join(sz, Seq("doc_id"))
              .select(col("doc_id").as("j"), col("sh"),
                      col("nsh").as("nj")), Seq("sh"))
      .filter(col("i") =!= col("j") &&
        col("nj").cast(DoubleType) / col("ni").cast(DoubleType) >= lit(tau))
      .select(col("i"), col("j")).distinct()
    val sets0 = sh.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("sh"))).as("shs"))
    val sets = if (ckptSets) sets0.localCheckpoint(true) else sets0
    def sh2(df: DataFrame) = if (setsHint.isEmpty) df else df.hint(setsHint)
    cand
      .join(sh2(sets.select(col("doc_id").as("i"), col("shs").as("shi"))), Seq("i"))
      .join(sh2(sets.select(col("doc_id").as("j"), col("shs").as("shj"))), Seq("j"))
      .select(col("i"), col("j"),
        expr("graft_sorted_inter_count(shi, shj)").as("inter"),
        size(col("shi")).cast(LongType).as("ni"))
      .withColumn("cont",
        col("inter").cast(DoubleType) / col("ni").cast(DoubleType))
      .filter(col("cont") >= tau)
      .select(col("i"), col("j"), col("inter"), col("ni"), col("cont"))
  }

  // ---- q101 variants ------------------------------------------------
  /** BM25 with the qterms arm served by a CHEAP token-count pass instead
    * of a second execution of the doc×term tf aggregate: top-nTerms by
    * total occurrences needs only groupBy(tok) over the raw explode
    * (vocabulary-bounded, map-side combined), and df is then computed for
    * the nTerms winners alone via a broadcast semi-filter + distinct.
    * `ckptDt` instead pins the doc×term table with localCheckpoint. */
  private def bm25V(docs: DataFrame, variant: String,
                    nTerms: Int = 5, k: Int = 20): DataFrame = {
    val dt0 = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("dl", size(col("toks")).cast(LongType))
      .select(col("doc_id"), col("lang"), col("dl"),
              explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("lang"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dt = if (variant == "ckpt-dt") dt0.localCheckpoint(true) else dt0
    val qterms =
      if (variant == "cheap-qterms") {
        val exploded = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("tok"))
        val top = exploded.groupBy(col("tok"))
          .agg(count(lit(1)).as("total"))
          .orderBy(col("total").desc, col("tok").asc).limit(nTerms)
        exploded.join(broadcast(top.select(col("tok"))), Seq("tok"))
          .select(col("tok"), col("doc_id")).distinct()
          .groupBy(col("tok")).agg(count(lit(1)).as("df"))
          .join(broadcast(top), Seq("tok"))
          .orderBy(col("total").desc, col("tok").asc)
          .select(col("tok"), col("df"))
      } else dt.groupBy(col("tok"))
        .agg(sum(col("tf")).as("total"), count(lit(1)).as("df"))
        .orderBy(col("total").desc, col("tok").asc).limit(nTerms)
        .select(col("tok"), col("df"))
    val g = docs
      .select(size(split(col("text"), " ")).cast(LongType).as("dl"))
      .agg(count(lit(1)).as("n"),
           (sum(col("dl")).cast(DoubleType) / count(lit(1))).as("avgdl"))
    val qidf = ops.Corpus.lnDet(ops.Corpus.lnDet(qterms.crossJoin(g),
        "2 * n + 2", "__ln_n"), "2 * df + 1", "__ln_df")
      .withColumn("idf", col("__ln_n") - col("__ln_df"))
      .select(col("tok"), col("df"), col("n"), col("avgdl"), col("idf"))
    val c = dt.join(broadcast(qidf), Seq("tok"))
      .select(col("doc_id"), col("lang"), col("tok"),
        (col("idf") *
         ((col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl"))))))
          .as("contrib"))
    val sc = c.groupBy(col("doc_id"), col("lang"))
      .agg(sort_array(collect_list(struct(col("tok"), col("contrib"))))
        .as("cs"))
      .select(col("doc_id"), col("lang"),
        expr("aggregate(cs, CAST(0.0 AS DOUBLE), (a, x) -> a + x.contrib)")
          .as("score"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc, col("doc_id").asc)
    sc.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk"), col("doc_id"), col("score"))
  }

  /** q126's drain with per-section driver timing: replays the registered
    * foreachBatch body against a fresh table dir, printing where each
    * micro-batch's addBatch goes (history read / touched selection /
    * merge+write / publish). Pure measurement — no registered code path
    * changes. */
  private def snapSinkTimed(s: SparkSession, d: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val c = s.newSession()
    c.conf.set("spark.sql.shuffle.partitions", "8")
    val stage = c.conf.get("spark.sql.warehouse.dir") + "/graft_r22_snap_stage"
    if (!new java.io.File(stage).exists())
      Tables.events(c, d).repartitionByRange(4, col("event_id"))
        .write.mode("overwrite").parquet(stage)
    val sch = c.read.parquet(stage).schema
    val dir = c.conf.get("spark.sql.warehouse.dir") + "/graft_r22_snap_" +
      java.util.UUID.randomUUID().toString.take(8)
    val src = c.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .select(col("event_id"), col("user_id"), col("event_type"),
              Fns.od(Fns.dec2(col("value"))).as("value"))
    val Snap = ops.Snapshot
    def ms(t: Long) = f"${(System.nanoTime() - t) / 1e6}%.0f"
    val q = src.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // snapshotSinkBatch's body, section-timed (same calls, same order)
        val batch = b.toDF()
        val s0 = System.nanoTime()
        val notes = Snap.versions(c, dir).map(v => Snap.manifest(c, dir, v).note)
        val stamped = notes.filter(_.startsWith("batch:")).map(_.drop(6).toLong)
        val nextExpected =
          if (stamped.nonEmpty) stamped.max + 1
          else notes.count(n => !Snap.isMaintenanceNote(n)).toLong
        val tHist = ms(s0)
        if (nextExpected > id) ()
        else if (Snap.currentVersion(c, dir) == 0) {
          val s1 = System.nanoTime()
          Snap.commit(ops.StreamOps.latestDelta(batch), dir, 0, "user_id",
            nFiles = 1, note = s"batch:$id")
          println(s"[q126] batch $id hist=${tHist} v1commit=${ms(s1)}")
        } else {
          // mergeCow's body, section-timed
          val s1 = System.nanoTime()
          val cur = Snap.currentVersion(c, dir)
          val m = Snap.manifest(c, dir, cur)
          val tMan = ms(s1)
          import c.implicits._
          val s2 = System.nanoTime()
          val ranges = m.files.map(f => (f.path, f.min, f.max))
            .toDF("path", "mn", "mx")
          val touched = batch.select(col("user_id").cast("long").as("k")).distinct()
            .join(broadcast(ranges), col("k").between(col("mn"), col("mx")))
            .select(col("path")).distinct().collect().map(_.getString(0)).toSet
          val tSel = ms(s2)
          val (rewrite, carry) = m.files.partition(f => touched.contains(f.path))
          val s3 = System.nanoTime()
          val base =
            if (rewrite.isEmpty) Snap.read(c, dir, cur).limit(0)
            else Snap.readEntries(c, dir, m, rewrite)
          val merged = ops.StreamOps.mergeLatest(base, batch)
          val tPlanMerge = ms(s3)
          val s4 = System.nanoTime()
          Snap.commit(merged, dir, cur, m.statsCol, carry, 1,
            s"batch:$id", cuts = Snap.quantileCuts(rewrite, 1))
          println(s"[q126] batch $id hist=$tHist man=$tMan sel=$tSel " +
            s"planMerge=$tPlanMerge commit=${ms(s4)} " +
            s"rewrite=${rewrite.size} carry=${carry.size}")
        }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    println("[q126] rows=" + Snap.read(c, dir).count())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val fams = if (args.length > 2) args.drop(2).toSet
               else Set("q61", "q106", "q111")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_r22_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("q01_scan_project", "q21_agg_groupby").foreach { w =>
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[r22] warmup $w skipped: ${e.getMessage}") }
    }
    val sh = ops.Dedup.shingles(spark, sfDir)

    def show(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq

    def duel(tag: String, ref: () => DataFrame,
             variants: Seq[(String, () => DataFrame)]): Unit = {
      val want = show(ref().orderBy(col("i"), col("j")))
      variants.foreach { case (vtag, mk) =>
        val got = show(mk().orderBy(col("i"), col("j")))
        require(got == want,
          s"$tag/$vtag output mismatch: ${got.size} vs ${want.size} rows")
      }
      val all = ("shipped", ref) +: variants
      all.foreach { case (_, mk) => mk().count() } // warm codegen
      val res = (1 to runs).flatMap(_ => all.map { case (vtag, mk) =>
        val t0 = System.nanoTime()
        mk().count()
        (vtag, (System.nanoTime() - t0) / 1e9)
      })
      all.foreach { case (vtag, _) =>
        val ts = res.collect { case (`vtag`, t) => t }
        println(f"$tag%-6s $vtag%-22s min=${ts.min}%5.2f  " +
          ts.map(t => f"$t%.2f").mkString(" "))
      }
    }

    if (fams("q61")) duel("q61",
      () => ops.Dedup.jaccardPairs(sh, 0.5),
      Seq(
        "carry-nsh"       -> (() => jaccardV1(sh, 0.5, "")),
        "carry-nsh+shj"   -> (() => jaccardV1(sh, 0.5, "shuffle_hash")),
        "carry-nsh+merge" -> (() => jaccardV1(sh, 0.5, "merge"))))

    if (fams("q106")) duel("q106",
      () => ops.Dedup.jaccardPairsPrefix(sh, 0.5),
      Seq(
        "shj-cand"        -> (() => prefixV(sh, 0.5, "shuffle_hash", false, false)),
        "shj+ckpt-sets"   -> (() => prefixV(sh, 0.5, "shuffle_hash", false, true)),
        "ckpt-pfx+sets"   -> (() => prefixV(sh, 0.5, "", true, true)),
        "shj+ckpt-both"   -> (() => prefixV(sh, 0.5, "shuffle_hash", true, true))))

    if (fams("q106b")) duel("q106b",
      () => ops.Dedup.jaccardPairsPrefix(sh, 0.5),
      Seq(
        "shj-sets"        -> (() => prefixV(sh, 0.5, "", false, false, "shuffle_hash")),
        "merge-sets"      -> (() => prefixV(sh, 0.5, "", false, false, "merge"))))

    if (fams("q111")) duel("q111",
      () => ops.Dedup.containmentPairs(sh, 0.8),
      Seq(
        "ckpt-sets"       -> (() => containV(sh, 0.8, true))))

    if (fams("q111b")) duel("q111b",
      () => ops.Dedup.containmentPairs(sh, 0.8),
      Seq(
        "shj-sets"        -> (() => containV(sh, 0.8, false, "shuffle_hash"))))

    if (fams("q126")) (1 to runs).foreach(_ => snapSinkTimed(spark, sfDir))

    if (fams("q97")) {
      // q97 with the srpCorpus union pinned (localCheckpoint): the
      // perturbed arm is an interpreted 64-lambda HOF transform and the
      // frame is referenced ~5x in the plan (two band sides, ei/ej
      // verify joins, the resolved left join).
      def q97v(ckpt: Boolean): DataFrame = {
        val u0 = ops.Similarity.srpCorpus(spark, sfDir)
        val u = if (ckpt) u0.localCheckpoint(true) else u0
        val cand = ops.Similarity.srpCandidates(u)
        val pairs = cand
          .join(u.select(col("vec_id").as("i"), col("emb").as("ei")), Seq("i"))
          .join(u.select(col("vec_id").as("j"), col("emb").as("ej")), Seq("j"))
          .select(col("i"), col("j"), expr("graft_cosine(ei, ej)").as("cos"))
          .filter(col("cos") >= 0.85)
          .select(col("i"), col("j"))
        val comp = ops.Dedup.resolveComponents(pairs)
        val resolved = u.select(col("vec_id"))
          .join(comp.select(col("node").as("vec_id"), col("lbl")),
            Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("lbl"), col("vec_id")).as("survivor"))
        val sizes = resolved.groupBy(col("survivor"))
          .agg(count(lit(1)).as("csize"))
        resolved.join(sizes, Seq("survivor"))
          .select(col("vec_id"), col("survivor"), col("csize"),
            (col("vec_id") === col("survivor")).cast(LongType).as("is_survivor"))
          .orderBy(col("vec_id"))
      }
      def showS(df: DataFrame) = df.collect().map(_.toString).toSeq
      require(showS(q97v(true)) == showS(q97v(false)), "q97 ckpt mismatch")
      val all = Seq(("shipped", () => q97v(false)), ("ckpt-u", () => q97v(true)))
      all.foreach { case (_, mk) => mk().count() }
      val res = (1 to runs).flatMap(_ => all.map { case (vtag, mk) =>
        val t0 = System.nanoTime()
        mk().count()
        (vtag, (System.nanoTime() - t0) / 1e9)
      })
      all.foreach { case (vtag, _) =>
        val ts = res.collect { case (`vtag`, t) => t }
        println(f"q97    $vtag%-22s min=${ts.min}%5.2f  " +
          ts.map(t => f"$t%.2f").mkString(" "))
      }
    }

    if (fams("finalplan")) {
      // post-execution (AQE-final) plan of a registered query — shows
      // runtime join conversions and exchange reuse explain() cannot
      args.drop(3).filter(SparkEntry.queries.contains).foreach { name =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.collect()
        println(s"===== $name (AQE-final) =====")
        println(df.queryExecution.executedPlan.toString)
      }
    }

    if (fams("q101")) {
      val docs = Tables.documents(spark, sfDir)
      def canonQ(df: DataFrame) =
        df.orderBy(col("lang"), col("rk"))
      def showQ(df: DataFrame) = canonQ(df).collect().map(_.toString).toSeq
      val want = showQ(ops.Corpus.bm25TopK(docs))
      val variants = Seq("cheap-qterms", "ckpt-dt")
      variants.foreach { v =>
        require(showQ(bm25V(docs, v)) == want, s"q101/$v output mismatch") }
      val all = ("shipped", () => ops.Corpus.bm25TopK(docs)) +:
        variants.map(v => (v, () => bm25V(docs, v)))
      all.foreach { case (_, mk) => mk().count() }
      val res = (1 to runs).flatMap(_ => all.map { case (vtag, mk) =>
        val t0 = System.nanoTime()
        mk().count()
        (vtag, (System.nanoTime() - t0) / 1e9)
      })
      all.foreach { case (vtag, _) =>
        val ts = res.collect { case (`vtag`, t) => t }
        println(f"q101   $vtag%-22s min=${ts.min}%5.2f  " +
          ts.map(t => f"$t%.2f").mkString(" "))
      }
    }

    spark.stop()
  }
}
