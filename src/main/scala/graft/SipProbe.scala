package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ops.{SipJoin, Snapshot}

/** Measures sideways-information-passing file pruning ([[ops.SipJoin]])
  * against the plain broadcast join on a synthetically widened fact:
  * orders at the given SF replicated `mult`×, range-committed into 64
  * band files on `key = o_orderkey % 64000`, joined to a 500-key dim
  * whose key space covers ~1/64 of the fact's. The SIP path should plan
  * ~1 of 64 files; the plain join scans all of them. Interleaved
  * min-of-N wall times, one JSON-ish summary line — the SCALE.md
  * evidence for the q169 feature's 100 TB claim (the file-skip ratio is
  * layout arithmetic: dim key span / table key span, independent of SF).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=16 \
  *          runMain graft.SipProbe [mult] [runs]
  */
object SipProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = if (args.nonEmpty) args(0).toInt else 10
    val runs = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_sip_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = spark.conf.get("spark.sql.warehouse.dir") + "/sip_fact"
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    // replicate mult× with distinct keys so the fact's key space is dense
    val fact0 = orders.crossJoin(
        spark.range(mult.toLong).toDF("rep"))
      .select(((col("o_orderkey") * mult + col("rep")) % 64000L).as("key"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").cast("double").as("price"))
    Snapshot.commit(fact0, dir, 0, "key", nFiles = 64)
    val m = Snapshot.manifest(spark, dir, Snapshot.currentVersion(spark, dir))
    val nRows = Snapshot.rowCountMeta(spark, dir).getOrElse(-1L)

    val dim = spark.range(5000L, 5500L).toDF("dk") // 500 keys, ~1/128 span
    val ks = SipJoin.dimKeys(dim, "dk", LongType, maxKeys = 1024)
    val planned = SipJoin.plannedFiles(m, "key", ks).size
    val fact = spark.read.format("graft").load(dir)

    def timeIt(f: () => Long): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    val plain = () => fact.join(broadcast(dim), col("key") === col("dk"))
      .agg(count(lit(1)), sum(col("price"))).head().getLong(0)
    val sip = () => SipJoin.sipJoinWith(fact, dim, "key", "dk", ks)
      .agg(count(lit(1)), sum(col("price"))).head().getLong(0)
    require(plain() == sip(), "SIP answer must equal the plain join")

    // interleaved, min-of-N: contention hits both arms equally
    val (tp, ts) = (1 to runs).map(_ => (timeIt(plain), timeIt(sip))).unzip
    println(f"""{"probe":"sip","mult":$mult,"rows":$nRows,""" +
      f""""files":${m.files.size},"planned":$planned,""" +
      f""""plain_min":${tp.min}%.3f,"sip_min":${ts.min}%.3f,""" +
      f""""plain_all":[${tp.map(t => f"$t%.2f").mkString(",")}],""" +
      f""""sip_all":[${ts.map(t => f"$t%.2f").mkString(",")}]}""")

    // DYNAMIC arm (round 18): the same 500-key slice hidden behind a
    // NON-key filter on a graft dim TABLE covering the whole key space
    // — the shape where the static rule's leaf envelope ([0,64000))
    // prunes nothing and only the planning-time dim job can see the
    // surviving keys. Timed through the plain front door (no verb):
    // each iteration re-optimizes, so the dynamic times INCLUDE the
    // bounded dim job — the honest end-to-end cost a user pays.
    val dimDir = spark.conf.get("spark.sql.warehouse.dir") + "/sip_dim"
    Snapshot.commit(
      spark.range(64000L).toDF("dk")
        .withColumn("tag",
          when(col("dk") >= 5000L && col("dk") < 5500L, "hit")
            .otherwise("miss")),
      dimDir, 0, "dk", nFiles = 4)
    def dimF = spark.read.format("graft").load(dimDir)
      .filter(col("tag") === "hit")
    def autoJoin() = fact.join(dimF, col("key") === col("dk"))
      .agg(count(lit(1)), sum(col("price"))).head().getLong(0)
    val dynKey = graft.plans.SipJoinRule.DynamicKey
    def withDyn[A](on: Boolean)(body: => A): A = {
      spark.conf.set(dynKey, on.toString)
      try body finally spark.conf.unset(dynKey)
    }
    require(withDyn(true)(autoJoin()) == withDyn(false)(autoJoin()),
      "dynamic answer must equal the static-envelope join")
    val j0 = graft.plans.SipJoinRule.dynamicJobs.get()
    val (tStat, tDyn) = (1 to runs).map(_ =>
      (withDyn(false)(timeIt(() => autoJoin())),
        withDyn(true)(timeIt(() => autoJoin())))).unzip
    val nJobs = graft.plans.SipJoinRule.dynamicJobs.get() - j0
    println(f"""{"probe":"sip_dynamic","files":${m.files.size},""" +
      f""""planned_static":${m.files.size},"planned_dyn":$planned,""" +
      f""""static_min":${tStat.min}%.3f,"dyn_min":${tDyn.min}%.3f,""" +
      f""""dim_jobs":$nJobs,""" +
      f""""static_all":[${tStat.map(t => f"$t%.2f").mkString(",")}],""" +
      f""""dyn_all":[${tDyn.map(t => f"$t%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
