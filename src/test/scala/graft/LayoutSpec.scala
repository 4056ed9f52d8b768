package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Physical-layout guarantees, observed on executed plans and result sets:
  * bucketed staging removes the join shuffle; salted joins change the
  * distribution but never the result. */
class LayoutSpec extends SparkSpec {

  test("bucketed staging: co-located join runs with NO Exchange") {
    Layout.stageBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
      "graft_orders_b", "o_custkey", 8)
    Layout.stageBucketed(
      Tables.customer(spark, sf).select("c_custkey", "c_name"),
      "graft_customer_b", "c_custkey", 8)
    val o = spark.table("graft_orders_b")
    val c = spark.table("graft_customer_b")
    // bucketing pays off in the sort-merge path (broadcast would bypass it
    // — and at real scale neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      val n = joined.count()
      assert(n == Tables.orders(spark, sf).count(), "inner join keeps all orders")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan was:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("saltedJoin: result identical to the plain join, salt really spreads") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, sf).select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = o.join(c, Seq("o_custkey"))
      .select("o_orderkey", "o_custkey", "c_name")
      .collect().map(_.toString).sorted
    val salted = Layout.saltedJoin(o, c, "o_custkey", "o_orderkey", 8)
      .select("o_orderkey", "o_custkey", "c_name")
      .collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
    val nSalts = o.withColumn("__salt",
      pmod(xxhash64(col("o_orderkey")), lit(8)))
      .select("__salt").distinct().count()
    assert(nSalts == 8, "every salt bucket is used")
  }
}
