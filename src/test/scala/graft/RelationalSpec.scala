package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.expressions.Hll

/** Pins the semantics the oracle can't see: the approx-distinct tolerance,
  * the flagship's null-extension path, cast/null rules, and that the
  * scale-safe q35 rewrite is value-identical to Spark's own ntile. */
class RelationalSpec extends SparkSpec {

  test("q28 approx_count_distinct within 5% of exact") {
    val row = SparkEntry.queries("q28_agg_approx_distinct")(spark, sf)
      .collect()(0)
    val exact = Tables.events(spark, sf).select(countDistinct(col("user_id")))
      .collect()(0).getLong(0)
    assert(row.getLong(1) == exact, "n_exact must be the exact distinct")
    assert(row.getBoolean(2),
      s"sketch certificate must hold: exact=$exact row=$row")
  }

  test("graft_hll sketch export: bit-exact mergeable, estimate within 5%") {
    // The mergeable export q28's built-in can't give: per-group sketches
    // persisted by one job must roll up to the global sketch EXACTLY —
    // register merge is element-wise max, so sketch(A ∪ B) ==
    // merge(sketch(A), sketch(B)) bit for bit, in any grouping or order.
    val e = Tables.events(spark, sf)
    val whole = e.selectExpr("graft_hll_sketch(user_id) AS s")
      .collect()(0).getAs[Array[Byte]](0)
    // rolled up from 16 hash-arbitrary shards (re-aggregation path)
    val sharded = e.selectExpr("user_id", "pmod(xxhash64(event_id), 16) AS g")
      .groupBy("g").agg(expr("graft_hll_sketch(user_id) AS s"))
      .selectExpr("graft_hll_merge(s) AS s")
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(whole, sharded),
      "sharded roll-up must equal the whole-corpus sketch bit-exactly")
    // merge is idempotent: unioning a sketch with itself changes nothing
    val doubled = e.selectExpr("graft_hll_sketch(user_id) AS s")
      .unionAll(e.selectExpr("graft_hll_sketch(user_id) AS s"))
      .selectExpr("graft_hll_merge(s) AS s")
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(whole, doubled),
      "merge must be idempotent")
    // the estimate is usable: within 5% of exact (p=12 → ~1.6% RSE)
    val est = Hll.estimate(whole)
    val exact = e.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(math.abs(est - exact).toDouble / exact <= 0.05,
      s"hll est=$est exact=$exact")
    // scalar estimator agrees with the library call (codegen path)
    val estSql = e.selectExpr("graft_hll_est(graft_hll_sketch(user_id)) AS n")
      .collect()(0).getLong(0)
    assert(estSql == est, s"SQL estimator $estSql != library $est")
  }

  test("q10 join-miss rows are null-extended and decode to 'Unknown'") {
    val miss = SparkEntry.queries("q10_join_left_flagship")(spark, sf)
      .filter(col("has_order") === false)
    assert(miss.count() > 0, "fixture must exercise the null-extension path")
    assert(miss.filter(col("order_status_decoded") =!= "Unknown").count() == 0)
    assert(miss.filter(col("cust_key").isNotNull).count() == 0)
    assert(miss.filter(col("order_ymd").isNotNull).count() == 0)
  }

  test("q02 out-of-range substring is empty -> NULL via nullif (A9/A13)") {
    val r = SparkEntry.queries("q02_scan_cast_null")(spark, sf)
    assert(r.filter(col("empty_is_null").isNotNull).count() == 0)
    // text->BIGINT round-trip is lossless
    assert(r.filter(col("key_from_text") =!= col("o_orderkey")).count() == 0)
  }

  test("q35 two-pass ntile/percent_rank matches Spark's built-in window") {
    val mine = SparkEntry.queries("q35_win_ntile")(spark, sf)
      .select("c_custkey", "quartile", "pr_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    val builtin = Tables.customer(spark, sf).select(
      col("c_custkey"),
      ntile(4).over(w).cast(LongType),
      floor(percent_rank().over(w) * 1000000).cast(LongType)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(mine.sameElements(builtin))
  }

  test("q20 DQ gate reports ok=1 and n matching the flagship rowcount") {
    val r = SparkEntry.queries("q20_agg_dq_rowcount")(spark, sf).collect()(0)
    assert(r.getInt(0) == 1)
    assert(r.getLong(1) ==
      SparkEntry.queries("q10_join_left_flagship")(spark, sf).count())
  }

  test("q19 bucketed interval join equals the naive range join, equi-planned") {
    // Value equivalence: the ≤2-bucket expansion + residual filter must
    // reproduce exactly what the bare range predicate computes (the naive
    // plan is fine at fixture scale; it's the 100 TB plan that isn't).
    val ev = Tables.events(spark, sf).select(
      col("event_id"), col("user_id"), Tables.tsSec(col("ts")).as("sec"),
      col("event_type"), col("value").cast("decimal(18,2)").as("v"))
    val win = ev.filter(col("event_type") === "purchase" && col("v") >= 150)
      .select(col("event_id").as("win_id"), col("sec").as("ws"),
              (col("sec") + 3600L).as("we"))
    val naive = ev.join(win,
        col("sec") >= col("ws") && col("sec") < col("we") &&
          col("event_id") =!= col("win_id"))
      .groupBy(col("win_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("v")).cast("double").as("sum_value"),
           countDistinct(col("user_id")).as("n_users"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
                           r.getLong(3))).sortBy(_._1)
    val mine = SparkEntry.queries("q19_join_interval")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
                           r.getLong(3))).sortBy(_._1)
    assert(mine.nonEmpty, "fixture must produce interval-join matches")
    assert(mine.sameElements(naive))
    // Plan shape: the registered query joins on the bucket EQUI key —
    // never the nested-loop product the naive range predicate plans.
    val plan = SparkEntry.queries("q19_join_interval")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"interval join must stay an equi join on the time bucket:\n$plan")
  }

  test("q122 mixed-length interval join equals the naive range join, equi-planned") {
    // Window lengths 30 min - 2.5 h against 1-hour buckets: some windows
    // sit inside one bucket, some span four. The general sequence
    // expansion must reproduce the bare range predicate exactly, and the
    // plan must stay the bucket equi-join for every geometry.
    val ev = Tables.events(spark, sf).select(
      col("event_id"), col("user_id"), Tables.tsSec(col("ts")).as("sec"),
      col("event_type"), col("value").cast("decimal(18,2)").as("v"))
    val win = ev.filter(col("event_type") === "purchase" && col("v") >= 150)
      .select(col("event_id").as("win_id"), col("sec").as("ws"),
              (col("sec") + (lit(1L) + pmod(col("event_id"), lit(5L))) * 1800L)
                .as("we"))
    // the fixture must actually exercise MIXED geometry: both sub-bucket
    // and multi-bucket windows present
    val lens = win.select(((col("we") - col("ws")) / 3600L).cast("double"))
      .collect().map(_.getDouble(0))
    assert(lens.exists(_ < 1.0) && lens.exists(_ > 2.0),
      s"window lengths must straddle the bucket width; got ${lens.distinct.sorted.toSeq}")
    val naive = ev.join(win,
        col("sec") >= col("ws") && col("sec") < col("we") &&
          col("event_id") =!= col("win_id"))
      .groupBy(col("win_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("v")).cast("double").as("sum_value"),
           countDistinct(col("user_id")).as("n_users"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
                           r.getLong(3))).sortBy(_._1)
    val mine = SparkEntry.queries("q122_join_interval_varlen")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
                           r.getLong(3))).sortBy(_._1)
    assert(mine.nonEmpty, "fixture must produce interval-join matches")
    assert(mine.sameElements(naive))
    val plan = SparkEntry.queries("q122_join_interval_varlen")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"mixed-length interval join must stay an equi join on the time bucket:\n$plan")
  }

  test("q39 exact-moment stats match Spark's one-pass builtins") {
    // The oracled query derives var/std/cov/corr from exact decimal
    // moments; the 100 TB twin is the built-in mergeable one-pass
    // aggregate state. They must agree to float tolerance (the builtins'
    // summation order is partition-dependent, hence not oracle-able).
    val mine = SparkEntry.queries("q39_agg_stats")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val builtin = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(var_samp(col("l_quantity")).as("v"),
           stddev_samp(col("l_quantity")).as("s"),
           covar_samp(col("l_quantity"), col("l_extendedprice")).as("c"),
           corr(col("l_quantity"), col("l_extendedprice")).as("r"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(mine.keySet == builtin.keySet && mine.nonEmpty)
    def close(a: Double, b: Double) =
      math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
    for ((k, (v, s, c, r)) <- mine) {
      val (bv, bs, bc, br) = builtin(k)
      assert(close(v, bv) && close(s, bs) && close(c, bc) && close(r, br),
        s"$k: exact-moment vs builtin diverged: ($v,$s,$c,$r) vs ($bv,$bs,$bc,$br)")
    }
  }

  test("q06-q08 subqueries decorrelate: semi/anti joins, no per-row probe") {
    // The whole point of declaring these as subqueries is that Catalyst
    // plans them as the same distributed joins the hand-written forms
    // use. EXISTS/NOT EXISTS must become semi/anti hash joins…
    val p06 = SparkEntry.queries("q06_subquery_exists")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p06.contains("LeftSemi") && p06.contains("LeftAnti"),
      s"EXISTS pair must rewrite to semi+anti joins:\n$p06")
    // …and the correlated scalar + lateral subqueries must decorrelate
    // into aggregate/window joins — never a nested-loop re-execution of
    // the subquery per outer row (the plan that dies at 100 TB).
    for (q <- Seq("q06_subquery_exists", "q07_subquery_scalar",
                  "q08_join_lateral")) {
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
             !p.contains("CartesianProduct"),
        s"$q must decorrelate to equi joins:\n$p")
    }
    // The lateral LIMIT 2 must decorrelate into ONE per-key row_number
    // window (q31's shape) — not a per-customer subquery execution.
    // (Spark's rewrite does not add WindowGroupLimit pruning here the way
    // a hand-written q31 gets it; the window itself is the contract.)
    val p08 = SparkEntry.queries("q08_join_lateral")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p08.contains("row_number()"),
      s"lateral top-k must decorrelate to a row_number window:\n$p08")
  }
}
