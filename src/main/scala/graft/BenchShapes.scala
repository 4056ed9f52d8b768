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

    // span-dedup winner shapes (q99): md5(span)-partitioned window anchor
    // vs the salted aggregate path — on a skewed corpus (one boilerplate
    // span planted in 30% of documents, the shape the salt exists for)
    import org.apache.spark.sql.functions._
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val skewed = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) < 3,
          concat(lit(boiler + " "), col("text"))).otherwise(col("text"))
          .as("text"))
    val wSpan = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k"))
    val (tWin, nWin) = med3(ops.Dedup.spanVerdict(
      ops.Dedup.spanFrame(skewed).withColumn("kept",
        struct(col("doc_id"), col("span_idx")) ===
          min(struct(col("doc_id"), col("span_idx"))).over(wSpan))).count())
    val (tSalt, nSalt) = med3(ops.Dedup.spanDedupSalted(skewed, 8).count())
    require(nWin == nSalt, s"span shapes must agree: window=$nWin salted=$nSalt")
    println(f"""{"shape_bench":"q99_span_winner","sf":"$sfDir","docs":$nWin,"window_sec":$tWin%.3f,"salted_sec":$tSalt%.3f}""")

    // q95 drain width (the state-store-count knob): a stream-stream join
    // keeps 4 state stores per shuffle partition, each paying delta-file +
    // commit fixed cost per batch, so the drain's width should follow the
    // JOIN KEY cardinality (user_id: thousands), not the corpus scan
    // width. Sweep the widths; the registered q95 pins the winner.
    val widths = Seq(2, 4, 8, 16)
    val sweep = widths.map { w =>
      // warm once per width so first-use codegen/store init is untimed
      ops.StreamOps.streamStreamJoinDrain(spark, sfDir, w).count()
      val (t, n) = med3(ops.StreamOps.streamStreamJoinDrain(spark, sfDir, w).count())
      (w, t, n)
    }
    require(sweep.map(_._3).distinct.size == 1,
      s"q95 output must be width-invariant: $sweep")
    val body = sweep.map { case (w, t, _) => f""""w$w":$t%.3f""" }.mkString(",")
    println(s"""{"shape_bench":"q95_drain_width","sf":"$sfDir","rows":${sweep.head._3},$body}""")

    // q124's MERGE shapes: file-level copy-on-write vs full-table rewrite
    // for a NARROW CDC batch (one file's key range) against the snapshot
    // table. The claim COW makes — "a narrow batch rewrites one file,
    // not the table" — measured rather than asserted. The base is the
    // x10 key-stride union (ScaleProbe's construction): at plain sf0.1
    // (~10 MB) per-job fixed cost swamps the byte-proportional rewrite
    // and the two shapes tie; the divergence IS the bytes written, so
    // the probe measures where bytes matter. Each run commits against a
    // fresh FS copy of the same 8-file base so layout and version are
    // identical across runs.
    import org.apache.hadoop.fs.{FileUtil, Path => HPath}
    val snapBase = java.nio.file.Files
      .createTempDirectory("graft_snapshape").toString + "/base"
    val init1 = ops.Warehouse.ordersInitState(spark, sfDir)
    val init10 = (0 until 10).map(i => init1.withColumn("order_key",
        col("order_key") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
    ops.Snapshot.commit(init10, snapBase, 0, "order_key")
    val m1 = ops.Snapshot.manifest(spark, snapBase, 1)
    val f0 = m1.files.minBy(_.min)
    val narrow = ops.Warehouse.ordersChanges(spark, sfDir)
      .filter(col("k").between(f0.min, f0.max)).localCheckpoint(true)
    val hconf = spark.sparkContext.hadoopConfiguration
    val hfs = new HPath(snapBase).getFileSystem(hconf)
    var runId = 0
    def freshCopy(): String = {
      runId += 1
      val dst = snapBase + s"_run_$runId"
      FileUtil.copy(hfs, new HPath(snapBase), hfs, new HPath(dst), false, hconf)
      dst
    }
    def medCommit(op: String => Unit): (Double, Long) = {
      val runs = (0 until 3).map { _ =>
        val dir = freshCopy()
        val t0 = System.nanoTime()
        op(dir)
        ((System.nanoTime() - t0) / 1e9,
          ops.Snapshot.read(spark, dir, 2).count())
      }
      (runs.map(_._1).sorted.apply(1), runs.head._2)
    }
    // warmup (JIT + footers), untimed
    ops.Snapshot.mergeCow(spark, freshCopy(), narrow, "k",
      ops.Warehouse.applyOrdersChanges)
    val (tCow, nCow) = medCommit { dir =>
      ops.Snapshot.mergeCow(spark, dir, narrow, "k",
        ops.Warehouse.applyOrdersChanges): Unit
    }
    val (tFull, nFull) = medCommit { dir =>
      ops.Snapshot.commit(
        ops.Warehouse.applyOrdersChanges(
          ops.Snapshot.read(spark, dir, 1), narrow),
        dir, 1, "order_key"): Unit
    }
    require(nCow == nFull, s"merge shapes must agree: cow=$nCow full=$nFull")
    val cowTouched = {
      val dir = freshCopy()
      ops.Snapshot.mergeCow(spark, dir, narrow, "k",
        ops.Warehouse.applyOrdersChanges)
      val m2 = ops.Snapshot.manifest(spark, dir, 2)
      m1.files.size - m2.files.map(_.path).toSet
        .intersect(m1.files.map(_.path).toSet).size
    }
    println(f"""{"shape_bench":"q124_merge_cow","sf":"$sfDir","rows":$nCow,"base_files":${m1.files.size},"rewritten_files":$cowTouched,"cow_sec":$tCow%.3f,"full_rewrite_sec":$tFull%.3f}""")

    // q127's Z-ORDER file skipping at x10 rows, 64 files: how many of
    // the 64 does each predicate class open, on the 1-D custkey-
    // clustered layout (v1) vs the z-ordered rewrite (v2) of the SAME
    // rows — the 2-D claim measured, not asserted. Plus wall time of
    // the pruned box read vs filtering a full scan of v2.
    val zdir = java.nio.file.Files
      .createTempDirectory("graft_zshape").toString + "/z"
    val zb = Tables.orders(spark, sfDir).select(
      col("o_orderkey"), col("o_custkey"),
      org.apache.spark.sql.functions.datediff(
        col("o_orderdate"), lit("1992-01-01")).as("dday"),
      Fns.dec2(col("o_totalprice")).as("price"))
    val zb10 = (0 until 10).map(i => zb.withColumn("o_orderkey",
        col("o_orderkey") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
    ops.Snapshot.commit(zb10, zdir, 0, "o_custkey", nFiles = 64)
    ops.Snapshot.optimizeZorder(spark, zdir, "o_custkey", "dday", 64)
    val zm1 = ops.Snapshot.manifest(spark, zdir, 1)
    def hit1d(lo: Long, hi: Long): Int =
      zm1.files.count(f => f.min <= hi && f.max >= lo)
    def hit2d(aLo: Long, aHi: Long, bLo: Long, bHi: Long): Int =
      ops.Snapshot.prunedFilesBox(spark, zdir, aLo, aHi, bLo, bHi).size
    // sf0.1 domains: custkey 0..~15k, dday ~1096..3500; 1996 = 1461..1826
    val dateZ = hit2d(0, 20000, 1461, 1826)
    val custZ = hit2d(1000, 3000, 0, 4000)
    val boxZ = hit2d(1000, 3000, 1461, 1826)
    val cust1 = hit1d(1000, 3000)
    ops.Snapshot.readPrunedBox(spark, zdir, "o_custkey", "dday",
      1000, 3000, 1461, 1826).count() // warmup
    val (tBox, nBox) = med3(ops.Snapshot.readPrunedBox(spark, zdir,
      "o_custkey", "dday", 1000, 3000, 1461, 1826).count())
    val (tFullScan, nFullScan) = med3(ops.Snapshot.read(spark, zdir, 2)
      .filter(col("o_custkey").between(1000, 3000) &&
              col("dday").between(1461, 1826)).count())
    require(nBox == nFullScan, s"box reads must agree: $nBox != $nFullScan")
    println(f"""{"shape_bench":"q127_zorder_prune","sf":"$sfDir","rows":$nBox,"files":64,"v2_date_only":$dateZ,"v2_cust_only":$custZ,"v2_box2d":$boxZ,"v1_cust_only":$cust1,"v1_date_only":64,"box_sec":$tBox%.3f,"fullscan_sec":$tFullScan%.3f}""")

    // q131/q128's MAINTENANCE interaction measured at the x10 base: the
    // changeFeed dataChange=false skip vs the table-vs-table diff it
    // avoids (a compaction shares zero files with its parent, so without
    // the marker the diff compares every row to find nothing), plus the
    // cost of the OPTIMIZE compact itself — the standing-maintenance
    // price the skip makes free for subscribers.
    val cRuns = (0 until 3).map { _ =>
      val dir = freshCopy()
      val t0 = System.nanoTime()
      ops.Snapshot.compactVersion(spark, dir, 128L << 20)
      (System.nanoTime() - t0) / 1e9
    }
    val tCompact = cRuns.sorted.apply(1)
    val skipDir = freshCopy()
    ops.Snapshot.compactVersion(spark, skipDir, 128L << 20) // v2 maintenance
    val (tSkipFeed, nSkipFeed) =
      med3(ops.Snapshot.changeFeed(spark, skipDir, 1, 2, "order_key").count())
    // the avoided shape: the same rows recommitted as a DATA commit (no
    // marker) forces the full diff — the pre-skip cost of ticking a
    // subscription over an OPTIMIZE
    val diffDir = freshCopy()
    ops.Snapshot.commit(ops.Snapshot.read(spark, diffDir, 1),
      diffDir, 1, "order_key")
    val (tDiffFeed, nDiffFeed) =
      med3(ops.Snapshot.changeFeed(spark, diffDir, 1, 2, "order_key").count())
    require(nSkipFeed == 0 && nDiffFeed == 0,
      s"both feeds must be empty: skip=$nSkipFeed diff=$nDiffFeed")
    println(f"""{"shape_bench":"q131_maintenance","sf":"$sfDir","base_rows":$nCow,"compact_sec":$tCompact%.3f,"feed_skip_sec":$tSkipFeed%.3f,"feed_diff_sec":$tDiffFeed%.3f}""")
    spark.stop()
  }
}
