package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Usage demo + runtime check for the physical-layout operators: stages
  * bucketed copies of orders/customer, joins them, and prints whether the
  * executed plan contains an Exchange (it must not), then runs the salted
  * join and compares its rowcount with the plain join. */
object LayoutDemo {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_demo_wh").toString)
      // bucketing pays off in the sort-merge path; at demo scale broadcast
      // would bypass it
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Layout.stageBucketed(Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey"), "demo_orders_b", "o_custkey", 8)
    Layout.stageBucketed(Tables.customer(spark, sf)
      .select("c_custkey", "c_name"), "demo_customer_b", "c_custkey", 8)
    val j = spark.table("demo_orders_b")
      .join(spark.table("demo_customer_b"), col("o_custkey") === col("c_custkey"))
    println(s"BUCKETED_JOIN_ROWS=${j.count()}")
    println(s"BUCKETED_JOIN_HAS_EXCHANGE=${j.queryExecution.executedPlan.toString.contains("Exchange")}")

    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    val plain = o.join(c, Seq("o_custkey")).count()
    val salted = Layout.saltedJoin(o, c, "o_custkey", "o_orderkey", 8).count()
    println(s"PLAIN_JOIN_ROWS=$plain SALTED_JOIN_ROWS=$salted MATCH=${plain == salted}")
    spark.stop()
  }
}
