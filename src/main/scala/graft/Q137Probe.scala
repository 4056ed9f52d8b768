package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Fns => F, Tables => T}
import graft.ops.{Snapshot, Warehouse}

/** Phase decomposition of q137's per-invocation cost (the r16 quiet
  * bench flagged 0.85 → 1.24 s): fixture build once, then time the
  * poison-batch rejection and the state read separately, with and
  * without write-path auto-stats, so the regression's component is a
  * measurement instead of a guess.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.Q137Probe /root/testdata/sf0.1
  */
object Q137Probe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_q137_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val dir = Warehouse.checkedOrders(spark, sf)
    val m5 = col("o_orderkey") % 20
    def poison = T.orders(spark, sf).filter(m5 === 5).select(
      col("o_orderkey").as("k"), lit("U").as("op"),
      (-F.dec2(col("o_totalprice"))).cast(DecimalType(21, 3)).as("c_price"),
      lit(null).cast("long").as("c_cust"),
      lit(null).cast("string").as("c_status"))
    def reject(): Unit =
      try {
        Snapshot.mergeCow(spark, dir, poison, "k",
          Warehouse.applyOrdersChanges)
        throw new IllegalStateException("must reject")
      } catch { case _: Snapshot.CheckViolation => () }
    def stateAgg(): Unit = {
      Snapshot.read(spark, dir)
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"), F.od(sum(col("price"))).as("total"))
        .collect()
      ()
    }
    // warm
    reject(); stateAgg()
    for (r <- 1 to 3) {
      val tr = time(reject())
      val ts = time(stateAgg())
      println(f"run$r: reject=${tr}%5.2f s  stateAgg=${ts}%5.2f s")
    }
    // same, with write-path auto-stats off: isolates the stats-pass
    // breadth (the suspected r16 cost rider)
    spark.conf.set("spark.graft.autoStats.maxCols", "0")
    for (r <- 1 to 3) {
      val tr = time(reject())
      println(f"run$r (autoStats off): reject=${tr}%5.2f s")
    }
    spark.conf.unset("spark.graft.autoStats.maxCols")
    // bounds-known vs sampling range partitioner (round 17): same verb,
    // conf-toggled — adjudicates whether skipping the sampling pass is
    // measurable once shuffle reuse has amortized the join recompute
    for (mode <- Seq("true", "false"); r <- 1 to 3) {
      spark.conf.set(Snapshot.BoundedWriteKey, mode)
      val tr = time(reject())
      println(f"run$r (bounded=$mode%5s): reject=${tr}%5.2f s")
    }
    spark.conf.unset(Snapshot.BoundedWriteKey)
    spark.stop()
  }
}
