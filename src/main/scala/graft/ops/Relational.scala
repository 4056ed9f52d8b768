package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Fns => F, QueryModule, Tables => T}

/** Relational core: scan/filter/cast (q01-q05), joins (q10-q17), aggregates
  * (q20-q28), windows (q30-q35), sort/limit (q40-q41), set ops (q45-q48).
  *
  * Semantics replayed from the reference pipeline
  * (/root/reference/dags/patient_claims_plus_postgres.py): the flagship q10
  * is the `patient_claims_plus` CTAS (lines 161-189) re-expressed on the
  * fixture star schema, and q20 is its row-count DQ gate (line 197) — with
  * the gate's result actually computed (the reference's PostgresOperator
  * never inspects it; see SURVEY.md A20).
  *
  * Scale notes (100 TB): every query is a declarative DataFrame plan —
  * filters/projections push into the parquet scan, aggregations are
  * partial+final hash aggregates, small dimensions broadcast (explicitly in
  * q12, by AQE threshold elsewhere), and no query collects to the driver.
  */
object Relational extends QueryModule {

  // ---- q10 flagship bits, shared with q20 -------------------------------

  /** Orders-side "beneficiary" filter: keeps ~half the orders so the left
    * join genuinely exercises the null-extension path (join misses ->
    * NULL-extended dim columns -> CASE ELSE 'Unknown'), mirroring
    * patient_claims_plus_postgres.py:187-189 + 182-186. */
  private val DimPriceFloor = 150000.0

  private def q10(s: SparkSession, d: String): DataFrame = {
    val li = T.lineitem(s, d)
    val dim = T.orders(s, d)
      .filter(col("o_totalprice") > DimPriceFloor)
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    li.join(dim, li("l_orderkey") === dim("o_orderkey"), "left")
      .select(
        col("l_orderkey").as("claim_key"),
        col("l_linenumber").as("claim_line"),
        concat(col("l_orderkey").cast(StringType), lit("-"),
               col("l_linenumber").cast(StringType)).as("claim_uid"),
        col("l_partkey").as("part_key"),
        col("l_suppkey").as("supp_key"),
        F.od(F.dec2(col("l_quantity"))).as("qty"),
        F.od(F.dec2(col("l_extendedprice"))).as("ext_price"),
        F.od(F.dec2(col("l_discount"))).as("discount"),
        F.od(F.dec2(col("l_tax"))).as("tax"),
        col("l_returnflag").as("ret_flag"),
        col("l_linestatus").as("line_status"),
        F.ymd(col("l_shipdate")).as("ship_ymd"),
        col("o_custkey").as("cust_key"),
        F.od(F.dec2(col("o_totalprice"))).as("total_price"),
        F.ymd(col("o_orderdate")).as("order_ymd"),
        col("o_orderpriority").as("order_priority"),
        when(col("o_orderstatus") === "O", "Open")
          .when(col("o_orderstatus") === "F", "Finished")
          .otherwise("Unknown").as("order_status_decoded"),
        col("o_orderkey").isNotNull.as("has_order"),
        F.od((F.dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) -
          F.dec2(col("l_discount")))).cast(DecimalType(28, 4))).as("gross"),
        substring(F.ymd(col("o_orderdate")), 1, 4).as("order_year"))
      .orderBy(col("claim_key"), col("claim_line"))
  }

  private val q10OracleSelect: String =
    s"""SELECT l_orderkey AS claim_key, l_linenumber AS claim_line,
       |  l_orderkey || '-' || l_linenumber AS claim_uid,
       |  l_partkey AS part_key, l_suppkey AS supp_key,
       |  CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS qty,
       |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS ext_price,
       |  CAST(CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS discount,
       |  CAST(CAST(l_tax AS DECIMAL(18,2)) AS DOUBLE) AS tax,
       |  l_returnflag AS ret_flag, l_linestatus AS line_status,
       |  strftime(l_shipdate, '%Y%m%d') AS ship_ymd,
       |  o_custkey AS cust_key,
       |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
       |  strftime(o_orderdate, '%Y%m%d') AS order_ymd,
       |  o_orderpriority AS order_priority,
       |  CASE WHEN o_orderstatus = 'O' THEN 'Open'
       |       WHEN o_orderstatus = 'F' THEN 'Finished'
       |       ELSE 'Unknown' END AS order_status_decoded,
       |  o_orderkey IS NOT NULL AS has_order,
       |  CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
       |       (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4)) AS DOUBLE) AS gross,
       |  substring(strftime(o_orderdate, '%Y%m%d'), 1, 4) AS order_year
       |FROM lineitem LEFT JOIN
       |  (SELECT * FROM orders WHERE o_totalprice > $DimPriceFloor) o
       |  ON l_orderkey = o_orderkey""".stripMargin

  /** Generalized interval/overlap join — the reusable form of q19's plan,
    * for ANY window length. Joins each probe row (instant = integral
    * column `ts`) to every window row whose half-open [`lo`, `hi`)
    * contains it, via a bucketed equi-join: each window explodes into the
    * `sequence` of bucketWidth-sized buckets it overlaps (a window
    * spanning B buckets contributes B rows — window-side duplication is
    * ceil(len/width)+1, which is the tuning knob), each probe carries its
    * single bucket, and exact containment runs as a post-join residual.
    * Per-bucket cost is probes/bucket × windows/bucket — never
    * |probe|×|windows|, the nested-loop product a bare range predicate
    * plans. Degenerate windows (hi <= lo) are dropped up front (they can
    * match nothing, and `sequence` would walk backwards through their
    * inverted bucket range). Equivalence to the naive range join for
    * arbitrary window/bucket geometry is property-tested (PropertySpec).
    * Column names must be distinct across the two frames; all three are
    * integral (epoch seconds, millis — any unit, as long as it's shared). */
  def intervalJoin(probe: DataFrame, ts: String,
                   windows: DataFrame, lo: String, hi: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val binned = windows.filter(col(hi) > col(lo)).withColumn("__bucket",
      explode(expr(s"sequence($lo DIV $bucketWidth, ($hi - 1) DIV $bucketWidth)")))
    probe.withColumn("__bucket", expr(s"$ts DIV $bucketWidth"))
      .join(binned, Seq("__bucket"))
      .filter(col(ts) >= col(lo) && col(ts) < col(hi))
      .drop("__bucket")
  }

  /** q09's CSV stage, written once per (session, fixture dir) — the
    * ivfServing discipline. Construction used to overwrite the shared
    * staging dir on EVERY call (including Plans explain audits), so two
    * concurrent constructions could race the overwrite and a reader could
    * catch a partial stage. The fixture slice is deterministic, so one
    * write per session is the correct cost; synchronized covers
    * concurrently-constructing suites sharing the session. Weak session
    * keys: a stopped session must not be pinned by its memo entry. */
  private val csvStageCache =
    new scala.collection.mutable.WeakHashMap[SparkSession,
      scala.collection.mutable.Set[String]]
  private def csvStageOnce(s: SparkSession, d: String): String =
    synchronized {
      val dir = s.conf.get("spark.sql.warehouse.dir") +
        "/graft_csv_stage_" + d.replaceAll("[^A-Za-z0-9]", "_")
      val staged =
        csvStageCache.getOrElseUpdate(s, scala.collection.mutable.Set.empty)
      if (!staged.contains(dir)) {
        T.orders(s, d).filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
                  col("o_orderpriority"), F.d(col("o_orderdate")).as("o_date"))
          .coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
        staged += dir
      }
      dir
    }

  // ---- queries -----------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q139_recursive_cte" -> ((s, d) => {
      // RECURSIVE CTE (transitive closure): walk key chains k → k+17
      // from every 64-aligned anchor, 3 steps deep — Spark 4's native
      // WITH RECURSIVE (the UnionLoop operator, SPARK-24497), which
      // plans the fixpoint as iterated joins exactly like this repo's
      // own q79/q83 loops, but declared in SQL. Each iteration's
      // frontier joins orders on its (pre-shuffled) key — at 100 TB the
      // frontier is anchor-sized, never table-sized, and the recursion
      // depth bounds the plan. Oracle = the identical recursion in
      // DuckDB.
      T.orders(s, d).select(col("o_orderkey"))
        .createOrReplaceTempView("rcte_orders")
      s.sql("""
        WITH RECURSIVE chain AS (
          SELECT o_orderkey AS k, o_orderkey AS root, 0 AS depth
          FROM rcte_orders WHERE o_orderkey % 64 = 0
          UNION ALL
          SELECT o.o_orderkey, c.root, c.depth + 1
          FROM rcte_orders o JOIN chain c ON o.o_orderkey = c.k + 17
          WHERE c.depth < 3
        )
        SELECT root, count(*) AS n, CAST(max(depth) AS BIGINT) AS maxd
        FROM chain GROUP BY root ORDER BY root""")
    }),

    "q01_scan_project" -> ((s, d) =>
      T.lineitem(s, d).select(
        col("l_orderkey").as("order_id"),
        col("l_linenumber").as("line_no"),
        col("l_quantity").as("qty"),
        col("l_extendedprice").as("ext_price"),
        col("l_returnflag").as("flag"),
        F.d(col("l_shipdate")).as("ship_date"))
      .orderBy(col("order_id"), col("line_no"))),

    "q02_scan_cast_null" -> ((s, d) =>
      // A13/A9 cast semantics: double->DECIMAL, text->BIGINT round-trip,
      // empty-string->NULL via nullif (patient_claims_plus_postgres.py:51,55-56).
      T.orders(s, d).select(
        col("o_orderkey"),
        F.od(F.dec2(col("o_totalprice")).cast(DecimalType(12, 2))).as("price_dec"),
        col("o_orderkey").cast(StringType).cast(LongType).as("key_from_text"),
        nullif(trim(col("o_orderstatus")), lit("")).as("status_n"),
        nullif(substring(col("o_orderpriority"), 100, 5), lit("")).as("empty_is_null"))
      .orderBy(col("o_orderkey"))),

    "q03_filter_range" -> ((s, d) =>
      T.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
                col("l_shipdate") <  lit("1997-01-01").cast(TimestampType) &&
                col("l_quantity") > 25)
        .select(col("l_orderkey"), col("l_linenumber"),
                col("l_quantity").as("qty"), F.d(col("l_shipdate")).as("ship_date"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "q04_filter_in_like" -> ((s, d) =>
      T.orders(s, d)
        .filter(col("o_orderstatus").isin("O", "F") &&
                col("o_orderpriority").like("%URGENT%"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))),

    "q05_filter_null3vl" -> ((s, d) => {
      val o = T.orders(s, d)
      val c = T.customer(s, d).filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), col("c_mktsegment"))
      o.join(c, o("o_custkey") === c("c_custkey"), "left")
        .select(
          col("o_orderkey"),
          col("c_custkey").isNull.as("miss"),
          col("c_custkey").isNotNull.as("hit"),
          (col("o_custkey") <=> col("c_custkey")).as("nse"),
          col("c_mktsegment").as("seg"))
        .orderBy(col("o_orderkey"))
    }),

    "q06_subquery_exists" -> ((s, d) => {
      // Correlated EXISTS / NOT EXISTS — declared as subqueries so
      // Catalyst's RewritePredicateSubquery turns them into the
      // left-semi + left-anti joins q13/q14 spell by hand; at 100 TB both
      // rewrites shuffle on the correlation key exactly like those joins
      // (or broadcast when the filtered orders side is small).
      T.customer(s, d).createOrReplaceTempView("graft_customer_q06")
      T.orders(s, d).createOrReplaceTempView("graft_orders_q06")
      s.sql(
        """SELECT c_custkey, c_name
          |FROM graft_customer_q06 c
          |WHERE EXISTS (SELECT 1 FROM graft_orders_q06 o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_orderpriority = '1-URGENT')
          |  AND NOT EXISTS (SELECT 1 FROM graft_orders_q06 o
          |                  WHERE o.o_custkey = c.c_custkey
          |                    AND o.o_totalprice > 400000)
          |ORDER BY c_custkey""".stripMargin)
    }),

    "q07_subquery_scalar" -> ((s, d) => {
      // Correlated scalar subqueries (orders above their customer's mean),
      // decorrelated by Catalyst into one aggregate-then-join per distinct
      // subquery — shuffle bounded by the key cardinality, never a per-row
      // probe. The mean predicate is spelled price*count > sum so every
      // compared value is exact DECIMAL/BIGINT arithmetic (§7.5: a
      // double AVG's summation order is not cross-engine reproducible).
      T.orders(s, d).createOrReplaceTempView("graft_orders_q07")
      s.sql(
        """SELECT o_orderkey, o_custkey,
          |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
          |  (SELECT count(*) FROM graft_orders_q07 o2
          |   WHERE o2.o_custkey = o.o_custkey) AS cust_n
          |FROM graft_orders_q07 o
          |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
          |      (SELECT count(*) FROM graft_orders_q07 o2
          |       WHERE o2.o_custkey = o.o_custkey)
          |    > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
          |       FROM graft_orders_q07 o2 WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    "q08_join_lateral" -> ((s, d) => {
      // LATERAL correlated subquery with ORDER BY + LIMIT (top-2 orders
      // per customer) — the per-row-subquery surface; Catalyst
      // decorrelates it into the same partitioned window top-k shape as
      // q31 (RelationalSpec pins no nested-loop/cartesian node), so the
      // scale behavior is one shuffle on the key with bounded per-key
      // state, never |customer| subquery executions.
      T.customer(s, d).createOrReplaceTempView("graft_customer_q08")
      T.orders(s, d).createOrReplaceTempView("graft_orders_q08")
      s.sql(
        """SELECT c.c_custkey, t.o_orderkey, t.price
          |FROM graft_customer_q08 c, LATERAL (
          |  SELECT o_orderkey,
          |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
          |  FROM graft_orders_q08 o
          |  WHERE o.o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
          |) t
          |ORDER BY c_custkey, o_orderkey""".stripMargin)
    }),

    "q09_scan_csv_roundtrip" -> ((s, d) => {
      // The reference's ENTIRE ingest is CSV → warehouse
      // (load_csv_subset_to_table, patient_claims_plus_postgres.py:34-58)
      // — this puts the CSV reader path INSIDE the correctness gate: a
      // deterministic orders slice is staged as a header CSV (overwrite,
      // under the session's temp warehouse) and read back through
      // Ingest.readCsv's declared-schema FAILFAST scan; the oracle derives
      // the same rows from parquet, so a hash match proves the CSV
      // round-trip lossless end-to-end. Columns are keys/strings/a
      // rendered date — the ingest subset shape (the reference keeps CMS
      // dates TEXT too, SURVEY A13). At 100 TB the same reader is a
      // splittable partitioned scan with no driver materialization and no
      // schema-inference pre-pass (declared schema).
      val dir = csvStageOnce(s, d)
      Ingest.readCsv(s, dir, StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_custkey", LongType),
          StructField("o_orderstatus", StringType),
          StructField("o_orderpriority", StringType),
          StructField("o_date", StringType))))
        .orderBy(col("o_orderkey"))
    }),

    "q10_join_left_flagship" -> (q10 _),

    "q20_agg_dq_rowcount" -> ((s, d) =>
      // The reference's DQ gate (patient_claims_plus_postgres.py:197) on the
      // flagship result. Ingest.dqGate is the asserting variant (SURVEY A20).
      q10(s, d).agg(
        when(count(lit(1)) > 0, 1).otherwise(0).as("ok"),
        count(lit(1)).as("n"))),

    "q11_join_inner" -> ((s, d) => {
      val o = T.orders(s, d)
      val c = T.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
             F.sum2(col("o_totalprice")).as("sum_price"))
        .orderBy(col("c_mktsegment"))
    }),

    "q12_join_broadcast" -> ((s, d) => {
      // Small-dimension chain: nation/region are tiny at any SF -> explicit
      // broadcast keeps this a pipelined double BroadcastHashJoin, no shuffle
      // of the customer side at 100 TB.
      val c = T.customer(s, d)
      val n = broadcast(T.nation(s, d))
      val r = broadcast(T.region(s, d))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
             F.sum2(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    "q13_join_semi" -> ((s, d) => {
      val c = T.customer(s, d)
      val o = T.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "q14_join_anti" -> ((s, d) => {
      val c = T.customer(s, d)
      val o = T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "q15_join_full" -> ((s, d) => {
      val o = T.orders(s, d).filter(col("o_custkey") % 4 === 0)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_ord"))
      val c = T.customer(s, d).filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), col("c_name"))
      o.join(c, o("o_custkey") === c("c_custkey"), "full_outer")
        .select(coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
                col("n_ord"), col("c_name"))
        .orderBy(col("custkey"))
    }),

    "q16_join_theta" -> ((s, d) => {
      val su = T.supplier(s, d)
      val c = T.customer(s, d)
      su.join(c, su("s_nationkey") === c("c_nationkey") &&
                 su("s_acctbal") > c("c_acctbal"))
        .select(col("s_suppkey"), col("c_custkey"),
                F.od(F.dec2(col("s_acctbal"))).as("s_bal"),
                F.od(F.dec2(col("c_acctbal"))).as("c_bal"))
        .orderBy(col("s_suppkey"), col("c_custkey"))
    }),

    "q17_join_asof" -> ((s, d) => {
      // As-of join: latest order (by o_orderdate) per key at or before each
      // event's synthetic day. Spark has no asof primitive -> union + running
      // `last(ignoreNulls)` window, the standard scale-safe encoding (one
      // shuffle on the key, no range cross-product). Ties on date are
      // pre-reduced to max(o_orderkey), making the pick deterministic.
      val ev = T.events(s, d).select(
        col("event_id"), col("user_id").as("k"),
        date_add(lit("1995-01-01").cast(DateType),
                 (col("event_id") % 2500).cast(IntegerType)).as("t"))
      val od = T.orders(s, d)
        .groupBy(col("o_custkey").as("k"), col("o_orderdate").cast(DateType).as("t"))
        .agg(max(col("o_orderkey")).as("best_ok"))
      val u = od.select(col("k"), col("t"), lit(0).as("tag"), col("best_ok"),
                        lit(null).cast(LongType).as("event_id"))
        .unionByName(ev.select(col("k"), col("t"), lit(1).as("tag"),
                               lit(null).cast(LongType).as("best_ok"), col("event_id")))
      val w = Window.partitionBy(col("k"))
        .orderBy(col("t").asc, col("tag").asc, col("best_ok").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("asof_ok", last(col("best_ok"), ignoreNulls = true).over(w))
        .withColumn("asof_date",
          last(when(col("tag") === 0, col("t")), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("k").as("user_id"),
                F.d(col("t")).as("ev_day"), F.d(col("asof_date")).as("asof_date"),
                col("asof_ok"))
        .orderBy(col("event_id"))
    }),

    "q18_resample_gapfill" -> ((s, d) => {
      // Time-series resample + forward fill: per entity, snap events to an
      // hourly grid (hourly max), generate the full hour range between the
      // entity's first and last hour, and carry the last observation
      // forward across gaps — the standard densification step before any
      // time-series model. Fixture slice: entities 0-10 (keeps the grid
      // output bounded for the oracle dump).
      //
      // 100 TB shape: the hourly pre-agg shuffles (entity, hour, partial)
      // with map-side combine; the grid generator is one row per (entity,
      // hour) — linear in the OUTPUT, never a cross join; the fill window
      // partitions per entity (series-length bounded). For years-long
      // series, chunk the window by (entity, month) and carry each chunk's
      // closing value in a tiny boundary table — same plan, bounded
      // partitions.
      val h = T.events(s, d).filter(col("user_id") <= 10)
        .select(col("user_id"),
          date_trunc("hour", T.tsUs(col("ts"))).as("hr"),
          F.dec2(col("value")).as("v"))
        .groupBy(col("user_id"), col("hr"))
        .agg(max(col("v")).as("hmax"), count(lit(1)).as("n"))
      val grid = h.groupBy(col("user_id"))
        .agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
        .select(col("user_id"),
          explode(expr("sequence(lo, hi, interval 1 hour)")).as("hr"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("hr").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(h, Seq("user_id", "hr"), "left")
        .withColumn("val_ff", F.od(last(col("hmax"), ignoreNulls = true).over(w)))
        .select(col("user_id"),
          date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
          coalesce(col("n"), lit(0L)).as("n"), col("val_ff"))
        .orderBy(col("user_id"), col("hr"))
    }),

    "q19_join_interval" -> ((s, d) => {
      // Interval/overlap join — the range-join shape Spark has no native
      // operator for. Windows = [ts, ts+1h) around every high-value
      // purchase; probe = every other event whose timestamp falls inside
      // a window. The scale-safe plan is a BUCKETED equi-join: both sides
      // key on the 1-hour epoch bucket — a window of length == bucket
      // width overlaps at most 2 buckets, so the window side expands into
      // ≤2 (bucket, window) rows while the probe side stays one row per
      // event; exact containment runs as a post-join residual. Per-bucket
      // cost is events/bucket × windows/bucket, never |events|×|windows|
      // (the BroadcastNestedLoopJoin a bare range predicate plans); the
      // bucket width is the knob that trades window-side duplication
      // against bucket occupancy at 100 TB. All time arithmetic is exact
      // epoch-second integers (tsSec), so bucket assignment and
      // containment are bit-identical cross-engine.
      val ev = T.events(s, d).select(
        col("event_id"), col("user_id"), T.tsSec(col("ts")).as("sec"),
        col("event_type"), F.dec2(col("value")).as("v"))
      val win = ev.filter(col("event_type") === "purchase" && col("v") >= 150)
        .select(col("event_id").as("win_id"), col("sec").as("ws"),
                (col("sec") + 3600L).as("we"))
      intervalJoin(ev, "sec", win, "ws", "we", 3600L)
        .filter(col("event_id") =!= col("win_id"))
        .groupBy(col("win_id"))
        .agg(count(lit(1)).as("n_events"),
             F.od(sum(col("v"))).as("sum_value"),
             countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("win_id"))
    }),

    "q122_join_interval_varlen" -> ((s, d) => {
      // q19's plan on MIXED-length windows — the common case a real
      // overlap join faces (session windows, retention horizons, ad
      // attribution all vary per row). Window length is row-dependent:
      // (1 + win_id mod 5) half-hours, i.e. 30 min to 2.5 h against the
      // same 1-hour bucket — some windows sit inside one bucket, some
      // span four. intervalJoin's sequence(lo DIV w, (hi-1) DIV w)
      // expansion handles every geometry (property-tested ∀ window/
      // bucket shapes); window-side duplication is ⌈len/width⌉+1 rows,
      // the knob the bucket width tunes. Same residual, same equi-join
      // plan, no NLJ (spec-pinned).
      val ev = T.events(s, d).select(
        col("event_id"), col("user_id"), T.tsSec(col("ts")).as("sec"),
        col("event_type"), F.dec2(col("value")).as("v"))
      val win = ev.filter(col("event_type") === "purchase" && col("v") >= 150)
        .select(col("event_id").as("win_id"), col("sec").as("ws"),
                (col("sec") +
                 (lit(1L) + pmod(col("event_id"), lit(5L))) * 1800L).as("we"))
      intervalJoin(ev, "sec", win, "ws", "we", 3600L)
        .filter(col("event_id") =!= col("win_id"))
        .groupBy(col("win_id"))
        .agg(count(lit(1)).as("n_events"),
             F.od(sum(col("v"))).as("sum_value"),
             countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("win_id"))
    }),

    "q21_agg_groupby" -> ((s, d) =>
      // TPC-H Q1 shape; decimal end-to-end per SURVEY §7.5, averages as
      // exact integer micro-units (no float/decimal division).
      T.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .select(col("l_returnflag"), col("l_linestatus"),
          F.dec2(col("l_quantity")).as("qty"),
          F.dec2(col("l_extendedprice")).as("ext"),
          F.cents(col("l_quantity")).as("qty_c"),
          F.cents(col("l_extendedprice")).as("ext_c"),
          F.cents(col("l_discount")).as("disc_c"),
          (F.dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) -
            F.dec2(col("l_discount")))).cast(DecimalType(18, 4)).as("disc_price"),
          ((F.dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) -
            F.dec2(col("l_discount")))).cast(DecimalType(18, 4)) *
            (lit(1).cast(DecimalType(8, 2)) + F.dec2(col("l_tax"))))
            .cast(DecimalType(18, 6)).as("charge"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          F.od(sum(col("qty"))).as("sum_qty"),
          F.od(sum(col("ext"))).as("sum_base_price"),
          F.od(sum(col("disc_price"))).as("sum_disc_price"),
          F.od(sum(col("charge"))).as("sum_charge"),
          sum(col("qty_c")).as("sum_qty_c"),
          sum(col("ext_c")).as("sum_ext_c"),
          sum(col("disc_c")).as("sum_disc_c"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("sum_base_price"), col("sum_disc_price"),
          col("sum_charge"),
          F.avgMicro("sum_qty_c", "count_order").as("avg_qty_micro"),
          F.avgMicro("sum_ext_c", "count_order").as("avg_price_micro"),
          F.avgMicro("sum_disc_c", "count_order").as("avg_disc_micro"),
          col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    "q22_agg_distinct" -> ((s, d) =>
      T.orders(s, d)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
             count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))),

    "q23_agg_multidistinct" -> ((s, d) =>
      T.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
             countDistinct(col("o_orderpriority")).as("n_prio"),
             count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))),

    "q24_agg_rollup" -> ((s, d) =>
      T.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             grouping_id().cast(IntegerType).as("gid"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
                coalesce(col("l_linestatus"), lit("(all)")).as("status"),
                col("gid"), col("n"))
        .orderBy(col("flag"), col("status"), col("gid"))),

    "q25_agg_cube" -> ((s, d) =>
      T.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
             F.sum2(col("o_totalprice")).as("sum_price"),
             grouping_id().cast(IntegerType).as("gid"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
                coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
                col("gid"), col("n"), col("sum_price"))
        .orderBy(col("status"), col("priority"), col("gid"))),

    "q26_agg_grouping_sets" -> ((s, d) => {
      T.orders(s, d).createOrReplaceTempView("graft_orders_q26")
      s.sql(
        """SELECT coalesce(o_orderstatus, '(all)') AS status,
          |       coalesce(o_orderpriority, '(all)') AS priority,
          |       CAST(grouping(o_orderstatus) AS INT) AS g_status,
          |       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
          |       count(1) AS n
          |FROM graft_orders_q26
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY status, priority, g_status, g_priority""".stripMargin)
    }),

    "q27_agg_filtered" -> ((s, d) =>
      T.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          F.od(sum(when(col("l_quantity") > 25, F.dec2(col("l_extendedprice")))))
            .as("sum_big_qty"),
          count(when(col("l_quantity") > 25, lit(1))).as("n_big_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))),

    "q28_agg_approx_distinct" -> ((s, d) =>
      // HLL++ sketch. The estimate itself is engine-specific (no
      // cross-engine value to pin), but its ERROR BOUND is a property
      // an independent engine CAN pin (round 17, the q65/q105/q121
      // planted-corpus discipline applied here): emit the exact
      // cardinality alongside a deterministic within-5% certificate —
      // Spark's sketch is deterministic for a fixed input, so the flag
      // is a constant TRUE the DuckDB oracle asserts without
      // reproducing the sketch. The raw estimate stays unit-pinned
      // (±5% of exact) in RelationalSpec.
      // rsd 0.01: the certificate asserts 5σ of the sketch's configured
      // relative standard deviation — the default rsd 0.05 makes a >5%
      // deviation an ordinary draw (observed at sf0.1), not a defect
      T.events(s, d).agg(
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        countDistinct(col("user_id")).as("n_exact"),
        count(lit(1)).as("n"))
        .select(col("n"), col("n_exact"),
          (abs(col("approx_users") - col("n_exact")) <=
            col("n_exact") * 0.05).as("within_5pct"))),

    "q39_agg_stats" -> ((s, d) => {
      // Statistical aggregates (variance/stddev/covariance/correlation)
      // made cross-engine-reproducible the §7.5 way: the per-group MOMENTS
      // (n, Σx, Σy, Σx², Σy², Σxy) accumulate as exact DECIMALs — order-
      // independent, so any partial-aggregate merge order gives the same
      // bits — and only the final derived arithmetic runs in DOUBLE, as
      // one identically-spelled IEEE expression per measure in both
      // engines. The built-in one-pass corr/stddev_samp (mergeable
      // central-moment state, the same scale shape) is pinned ≈ equal in
      // RelationalSpec; it isn't oracled directly because its running
      // float state is summation-order-dependent.
      val x = F.dec2(col("l_quantity"))
      val y = F.dec2(col("l_extendedprice"))
      val m = T.lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n"),
             F.od(sum(x)).as("sx"), F.od(sum(y)).as("sy"),
             F.od(sum(x * x)).as("sxx"), F.od(sum(y * y)).as("syy"),
             F.od(sum(x * y)).as("sxy"))
      val n = col("n"); val sx = col("sx"); val sy = col("sy")
      val sxx = col("sxx"); val syy = col("syy"); val sxy = col("sxy")
      m.select(col("flag"), n,
          (sx / n).as("mean_qty"),
          ((sxx - sx * sx / n) / (n - 1)).as("var_qty"),
          sqrt((sxx - sx * sx / n) / (n - 1)).as("std_qty"),
          ((sxy - sx * sy / n) / (n - 1)).as("cov_qty_price"),
          ((sxy - sx * sy / n) /
            sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)))
            .as("corr_qty_price"))
        .orderBy(col("flag"))
    }),

    "q29_agg_heavy_hitters" -> ((s, d) =>
      // Heavy hitters via the mergeable Misra-Gries sketch (graft_topk_*,
      // a TypedImperativeAggregate like graft_hll): top-20 tokens with
      // bounded memory — the regime q62's exact hash aggregate can't
      // reach when the vocabulary is web-scale (URLs, ids, n-grams).
      // Partial sketches build map-side and MERGE through the exchange,
      // so the oracle hash exercises the full mergeable path. On the
      // fixture's 31-token vocabulary no eviction fires, err is 0 and the
      // sketch is EXACT == the plain GROUP BY oracle; the eviction regime
      // (>Cap vocabulary) is property-tested in PropertySpec.
      T.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .agg(expr("graft_topk_sketch(tok)").as("sk"))
        .select(explode(expr("graft_topk(sk, 20)")).as("e"))
        .select(col("e.item").as("token"), col("e.est").as("n"),
                col("e.err").as("err"))
        .orderBy(col("n").desc, col("token").asc)),

    "q30_win_rank" -> ((s, d) => {
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc)
      val total = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      T.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(total).cast(LongType).as("rn"),
        rank().over(byPrice).cast(LongType).as("rnk"),
        dense_rank().over(byPrice).cast(LongType).as("drnk"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q31_win_topk_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      T.orders(s, d)
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    "q32_win_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.orders(s, d).select(
        col("o_custkey"), F.d(col("o_orderdate")).as("order_date"), col("o_orderkey"),
        F.od(sum(F.dec2(col("o_totalprice"))).over(w)).as("running_spend"))
        .orderBy(col("o_custkey"), col("order_date"), col("o_orderkey"))
    }),

    "q33_win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").asc)
      T.events(s, d).select(
        col("event_id"), col("user_id"),
        F.cents(col("value")).as("value_c"))
        .withColumn("prev_c", lag(col("value_c"), 1).over(w))
        .withColumn("next_c", lead(col("value_c"), 1).over(w))
        .withColumn("delta_c", col("value_c") - col("prev_c"))
        .orderBy(col("event_id"))
    }),

    "q34_win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec").asc)
        .rangeBetween(-3600L, 0L)
      T.events(s, d)
        .select(col("event_id"), col("user_id"), T.tsSec(col("ts")).as("sec"))
        .withColumn("n_last_hour", count(lit(1)).over(w))
        .orderBy(col("event_id"))
    }),

    "q35_win_ntile" -> ((s, d) => {
      // Global ntile/percent_rank WITHOUT a single-partition window (the
      // naive Window.orderBy moves the whole table to one task). Two-pass:
      // range-repartition on the global ordering, per-partition local row
      // numbers (bounded state), then add broadcast cumulative offsets —
      // the offsets table has <= spark.sql.shuffle.partitions rows, so its
      // global window is bounded by config, not by data size.
      val base = T.customer(s, d).select(col("c_custkey"), col("c_acctbal"))
      val local = base
        .repartitionByRange(col("c_acctbal").desc, col("c_custkey").asc)
        .withColumn("pid", spark_partition_id())
        .withColumn("lrn", row_number().over(
          Window.partitionBy(col("pid"))
            .orderBy(col("c_acctbal").desc, col("c_custkey").asc)).cast(LongType))
      // Cumulative offsets via a triangular self-join on the tiny per-
      // partition counts table (<= shuffle.partitions rows) — deliberately
      // NOT an unpartitioned window, so no stage ever funnels to one task.
      val pc = local.groupBy(col("pid")).agg(count(lit(1)).as("pn"))
      val cum = pc.as("a")
        .join(pc.select(col("pid").as("bpid"), col("pn").as("bpn")),
              col("bpid") < col("a.pid"), "left")
        .groupBy(col("a.pid").as("pid"), col("a.pn").as("pn"))
        .agg(coalesce(sum(col("bpn")), lit(0L)).as("off"))
      val offs = cum
        .crossJoin(broadcast(pc.agg(sum(col("pn")).as("n_total"))))
        .select(col("pid"), col("off"), col("n_total"))
      // SQL ntile(k): first (n % k) tiles get (n DIV k)+1 rows, the rest n DIV k.
      // Integer division via double floor — exact while operands < 2^53 and
      // the quotient is tiny (<= k), far beyond any realistic row count.
      def ldiv(a: Column, b: Column): Column =
        floor(a.cast(DoubleType) / b.cast(DoubleType)).cast(LongType)
      val k = lit(4L)
      val joined = local.join(broadcast(offs), Seq("pid"))
        .withColumn("rn", col("off") + col("lrn"))
      val q = ldiv(col("n_total"), k)
      val r = col("n_total") % k
      val boundary = r * (q + 1)
      joined.select(
        col("c_custkey"), col("c_acctbal"),
        when(col("rn") <= boundary, ldiv(col("rn") - 1, q + 1) + 1)
          .otherwise(r + ldiv(col("rn") - 1 - boundary, q) + 1)
          .cast(LongType).as("quartile"),
        floor(((col("rn") - 1).cast(DoubleType) /
               (col("n_total") - 1).cast(DoubleType)) * 1000000)
          .cast(LongType).as("pr_micro"))
        .orderBy(col("c_custkey"))
    }),

    "q36_win_distribution" -> ((s, d) => {
      // Distribution window functions — the family q30-q35 didn't cover:
      // cume_dist (exact micro-units; the (c_acctbal, c_custkey) order is
      // total, so every row is its own peer group and the value is
      // position/n in identical IEEE division both engines), plus
      // first_value/nth_value over an explicit running frame. One shuffle
      // on the partition key, per-key sorted state — same scale shape as
      // every other window here.
      // window orders by the DECIMAL-cast bal (order-equivalent to the
      // raw double; the oracle's ORDER BY c_acctbal matches)
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("bal").asc, col("c_custkey").asc)
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
                F.dec2(col("c_acctbal")).as("bal"))
        .select(col("c_custkey"), col("c_nationkey"),
          F.od(col("bal")).as("bal"),
          floor(cume_dist().over(w) * 1000000).cast(LongType).as("cd_micro"),
          F.od(first(col("bal")).over(run)).as("first_bal"),
          F.od(nth_value(col("bal"), 3).over(run)).as("nth3"))
        .orderBy(col("c_custkey"))
    }),

    "q40_sort_multi" -> ((s, d) =>
      T.customer(s, d)
        .select(col("c_custkey"), col("c_name"),
                nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_n"),
                col("c_acctbal"), col("c_nationkey"))
        .orderBy(col("seg_n").asc_nulls_first, col("c_acctbal").desc_nulls_last,
                 col("c_custkey").asc)),

    "q41_limit_topk" -> ((s, d) =>
      // orderBy().limit() -> TakeOrderedAndProject: per-partition top-k then
      // a k-row merge on the driver; never a global sort at scale.
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    "q45_union_all" -> ((s, d) => {
      val o = T.orders(s, d)
      val a = o.filter(col("o_orderstatus") === "O" && col("o_orderkey") % 10 < 3)
        .select(col("o_orderkey"), lit(1).as("src"), col("o_orderstatus"), col("o_orderpriority"))
      val b = o.filter(col("o_orderpriority").like("1-%") && col("o_orderkey") % 10 < 3)
        .select(col("o_orderkey"), lit(2).as("src"), col("o_orderstatus"), col("o_orderpriority"))
      a.unionAll(b).orderBy(col("o_orderkey"), col("src"))
    }),

    "q46_union_distinct" -> ((s, d) => {
      val o = T.orders(s, d)
      val a = o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("ck"), col("o_orderstatus").as("st"))
      val b = o.filter(col("o_orderpriority").like("1-%"))
        .select(col("o_custkey").as("ck"), col("o_orderstatus").as("st"))
      a.union(b).distinct().orderBy(col("ck"), col("st"))
    }),

    "q47_intersect" -> ((s, d) => {
      val a = T.orders(s, d).select(col("o_custkey").as("ck"))
      val b = T.customer(s, d).filter(col("c_acctbal") > 0)
        .select(col("c_custkey").as("ck"))
      a.intersect(b).orderBy(col("ck"))
    }),

    "q48_except" -> ((s, d) => {
      val a = T.customer(s, d).select(col("c_custkey").as("ck"))
      val b = T.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("ck"))
      a.except(b).orderBy(col("ck"))
    }),

    "q44_unpivot" -> ((s, d) =>
      // Unpivot/melt — q49's inverse: wide columns -> (key, attr, value)
      // long form. A stateless per-row generator (each input row emits one
      // row per value column, no shuffle); the value columns unify to
      // DOUBLE before melting, as unpivot requires one common type.
      T.customer(s, d)
        .select(col("c_custkey"),
          F.od(F.dec2(col("c_acctbal"))).as("acctbal"),
          col("c_nationkey").cast(DoubleType).as("nationkey"))
        .unpivot(Array(col("c_custkey")),
          Array(col("acctbal"), col("nationkey")), "attr", "val")
        .orderBy(col("c_custkey"), col("attr"))),

    "q49_pivot" -> ((s, d) =>
      // Pivot with EXPLICIT values — the scale-correct form: without the
      // value list, pivot first runs a distinct+collect on the pivot
      // column (a full extra job over the fact table); with it, the plan
      // is ONE pass — a plain partial+final hash agg whose shuffle rows
      // are (priority, 6 pivoted partials). Count cells are null-filled
      // to 0 (a pivot cell with no rows is an empty group = count 0);
      // sum cells stay NULL like any empty-group sum.
      T.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)).as("n"), F.od(sum(F.dec2(col("o_totalprice")))).as("total"))
        .na.fill(0L, Seq("O_n", "F_n", "P_n"))
        .orderBy(col("o_orderpriority")))
  )

  // ---- oracle SQL ---------------------------------------------------------

  def oracleSql: Map[String, String] = Map(
    "q44_unpivot" ->
      """SELECT c_custkey, 'acctbal' AS attr,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS val
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, 'nationkey' AS attr, CAST(c_nationkey AS DOUBLE) AS val
        |FROM customer
        |ORDER BY c_custkey, attr""".stripMargin,

    "q18_resample_gapfill" ->
      """WITH e AS (
        |  SELECT user_id, time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS hr,
        |         CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events WHERE user_id <= 10),
        |h AS (SELECT user_id, hr, max(v) AS hmax, count(*) AS n FROM e GROUP BY 1, 2),
        |span AS (SELECT user_id, min(hr) AS lo, max(hr) AS hi FROM h GROUP BY 1),
        |grid AS (SELECT user_id,
        |           unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hr
        |         FROM span),
        |j AS (SELECT g.user_id, g.hr, h.hmax, coalesce(h.n, 0) AS n
        |      FROM grid g LEFT JOIN h USING (user_id, hr))
        |SELECT user_id, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hr,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(last_value(hmax IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS val_ff
        |FROM j ORDER BY user_id, hr""".stripMargin,

    "q19_join_interval" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS sec,
        |         event_type, CAST(value AS DECIMAL(18,2)) AS v FROM events),
        |w AS (
        |  SELECT event_id AS win_id, sec AS ws, sec + 3600 AS we FROM e
        |  WHERE event_type = 'purchase' AND v >= 150)
        |SELECT w.win_id, count(*) AS n_events,
        |  CAST(sum(e.v) AS DOUBLE) AS sum_value,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM w JOIN e ON e.sec >= w.ws AND e.sec < w.we
        |               AND e.event_id <> w.win_id
        |GROUP BY w.win_id ORDER BY w.win_id""".stripMargin,

    "q122_join_interval_varlen" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS sec,
        |         event_type, CAST(value AS DECIMAL(18,2)) AS v FROM events),
        |w AS (
        |  SELECT event_id AS win_id, sec AS ws,
        |         sec + (1 + event_id % 5) * 1800 AS we FROM e
        |  WHERE event_type = 'purchase' AND v >= 150)
        |SELECT w.win_id, count(*) AS n_events,
        |  CAST(sum(e.v) AS DOUBLE) AS sum_value,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM w JOIN e ON e.sec >= w.ws AND e.sec < w.we
        |               AND e.event_id <> w.win_id
        |GROUP BY w.win_id ORDER BY w.win_id""".stripMargin,

    "q49_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (o_orderstatus = 'O') AS "O_n",
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'O') AS DOUBLE) AS "O_total",
        |  count(*) FILTER (o_orderstatus = 'F') AS "F_n",
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'F') AS DOUBLE) AS "F_total",
        |  count(*) FILTER (o_orderstatus = 'P') AS "P_n",
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'P') AS DOUBLE) AS "P_total"
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q39_agg_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag AS flag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) *
        |             CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) *
        |             CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT flag, n,
        |  sx / n AS mean_qty,
        |  (sxx - sx * sx / n) / (n - 1) AS var_qty,
        |  sqrt((sxx - sx * sx / n) / (n - 1)) AS std_qty,
        |  (sxy - sx * sy / n) / (n - 1) AS cov_qty_price,
        |  (sxy - sx * sy / n) / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
        |    AS corr_qty_price
        |FROM m ORDER BY flag""".stripMargin,

    "q06_subquery_exists" ->
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q07_subquery_scalar" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
        |  (SELECT count(*) FROM orders o2
        |   WHERE o2.o_custkey = o.o_custkey) AS cust_n
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |      (SELECT count(*) FROM orders o2
        |       WHERE o2.o_custkey = o.o_custkey)
        |    > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q08_join_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.price
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |  FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        |) t
        |ORDER BY c_custkey, o_orderkey""".stripMargin,

    "q09_scan_csv_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date
        |FROM orders WHERE o_orderkey % 7 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "q01_scan_project" ->
      """SELECT l_orderkey AS order_id, l_linenumber AS line_no, l_quantity AS qty,
        |  l_extendedprice AS ext_price, l_returnflag AS flag,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem ORDER BY order_id, line_no""".stripMargin,

    "q02_scan_cast_null" ->
      """SELECT o_orderkey,
        |  CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
        |  CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_from_text,
        |  nullif(trim(o_orderstatus), '') AS status_n,
        |  nullif(substring(o_orderpriority, 100, 5), '') AS empty_is_null
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q03_filter_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS qty,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity > 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q04_filter_in_like" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus IN ('O','F') AND o_orderpriority LIKE '%URGENT%'
        |ORDER BY o_orderkey""".stripMargin,

    "q05_filter_null3vl" ->
      """SELECT o_orderkey, c_custkey IS NULL AS miss, c_custkey IS NOT NULL AS hit,
        |  o_custkey IS NOT DISTINCT FROM c_custkey AS nse, c_mktsegment AS seg
        |FROM orders LEFT JOIN
        |  (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 0) c
        |  ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q10_join_left_flagship" ->
      (q10OracleSelect + "\nORDER BY claim_key, claim_line"),

    "q20_agg_dq_rowcount" ->
      s"""SELECT CASE WHEN count(*) > 0 THEN 1 ELSE 0 END AS ok, count(*) AS n
         |FROM ($q10OracleSelect)""".stripMargin,

    "q11_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q12_join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q13_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q14_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q15_join_full" ->
      """SELECT coalesce(o_custkey, c_custkey) AS custkey, n_ord, c_name
        |FROM (SELECT o_custkey, count(*) AS n_ord FROM orders
        |      WHERE o_custkey % 4 = 0 GROUP BY o_custkey) o
        |FULL OUTER JOIN
        |     (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0) c
        |  ON o_custkey = c_custkey
        |ORDER BY custkey""".stripMargin,

    "q16_join_theta" ->
      """SELECT s_suppkey, c_custkey,
        |  CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS s_bal,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS c_bal
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
        |ORDER BY s_suppkey, c_custkey""".stripMargin,

    "q17_join_asof" ->
      """WITH e AS (SELECT event_id, user_id,
        |             DATE '1995-01-01' + CAST(event_id % 2500 AS INT) AS ev_day
        |           FROM events),
        |     o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
        |             max(o_orderkey) AS best_ok
        |           FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, strftime(e.ev_day, '%Y-%m-%d') AS ev_day,
        |  strftime(o.od, '%Y-%m-%d') AS asof_date, o.best_ok AS asof_ok
        |FROM e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ev_day >= o.od
        |ORDER BY event_id""".stripMargin,

    "q21_agg_groupby" ->
      """WITH l AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS qty,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS ext,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_c,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS ext_c,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS disc_c,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |         (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS disc_price,
        |    CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |         (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) *
        |         (1 + CAST(l_tax AS DECIMAL(8,2))) AS DECIMAL(18,6)) AS charge
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
        |SELECT l_returnflag, l_linestatus,
        |  CAST(sum(qty) AS DOUBLE) AS sum_qty,
        |  CAST(sum(ext) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(disc_price) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(charge) AS DOUBLE) AS sum_charge,
        |  CAST(CAST(sum(qty_c) AS BIGINT) * 10000 // count(*) AS BIGINT) AS avg_qty_micro,
        |  CAST(CAST(sum(ext_c) AS BIGINT) * 10000 // count(*) AS BIGINT) AS avg_price_micro,
        |  CAST(CAST(sum(disc_c) AS BIGINT) * 10000 // count(*) AS BIGINT) AS avg_disc_micro,
        |  count(*) AS count_order
        |FROM l GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q22_agg_distinct" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(DISTINCT o_custkey) AS n_cust, count(*) AS n
        |FROM orders GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "q23_agg_multidistinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust,
        |  count(DISTINCT o_orderpriority) AS n_prio, count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q24_agg_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS flag,
        |  coalesce(l_linestatus, '(all)') AS status,
        |  CAST(grouping(l_returnflag, l_linestatus) AS INT) AS gid,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status, gid""".stripMargin,

    "q25_agg_cube" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  CAST(grouping(o_orderstatus, o_orderpriority) AS INT) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority, gid""".stripMargin,

    "q26_agg_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
        |  count(*) AS n
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority, g_status, g_priority""".stripMargin,

    "q27_agg_filtered" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |       FILTER (WHERE l_quantity > 25) AS DOUBLE) AS sum_big_qty,
        |  count(*) FILTER (WHERE l_quantity > 25) AS n_big_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the sketch's ESTIMATE is engine-specific; its error CERTIFICATE
    // is not — the oracle pins the exact cardinality and asserts the
    // within-5% flag as a constant (q65/q105/q121's closed-form
    // discipline; the raw estimate stays unit-pinned in RelationalSpec)
    "q28_agg_approx_distinct" ->
      """SELECT count(*) AS n, count(DISTINCT user_id) AS n_exact,
        |       TRUE AS within_5pct
        |FROM events""".stripMargin,

    "q29_agg_heavy_hitters" ->
      """SELECT tok AS token, count(*) AS n, CAST(0 AS BIGINT) AS err
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY tok ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,

    "q30_win_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
        |  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
        |  dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q31_win_topk_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q32_win_running" ->
      """SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend
        |FROM orders ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,

    "q33_win_lag_lead" ->
      """WITH e AS (SELECT event_id, user_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS value_c
        |  FROM events)
        |SELECT event_id, user_id, value_c,
        |  lag(value_c, 1) OVER w AS prev_c,
        |  lead(value_c, 1) OVER w AS next_c,
        |  value_c - lag(value_c, 1) OVER w AS delta_c
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id ASC)
        |ORDER BY event_id""".stripMargin,

    "q34_win_range_frame" ->
      """WITH e AS (SELECT event_id, user_id,
        |    epoch_us(ts) // 1000000 AS sec FROM events)
        |SELECT event_id, user_id, sec,
        |  count(*) OVER (PARTITION BY user_id ORDER BY sec
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour
        |FROM e ORDER BY event_id""".stripMargin,

    "q35_win_ntile" ->
      """SELECT c_custkey, c_acctbal,
        |  ntile(4) OVER w AS quartile,
        |  CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS pr_micro
        |FROM customer WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey ASC)
        |ORDER BY c_custkey""".stripMargin,

    "q36_win_distribution" ->
      """SELECT c_custkey, c_nationkey,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal,
        |  CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cd_micro,
        |  CAST(first_value(CAST(c_acctbal AS DECIMAL(18,2))) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS first_bal,
        |  CAST(nth_value(CAST(c_acctbal AS DECIMAL(18,2)), 3) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS nth3
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q40_sort_multi" ->
      """SELECT c_custkey, c_name, nullif(c_mktsegment, 'BUILDING') AS seg_n,
        |  c_acctbal, c_nationkey
        |FROM customer
        |ORDER BY seg_n ASC NULLS FIRST, c_acctbal DESC NULLS LAST, c_custkey ASC""".stripMargin,

    "q41_limit_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q139_recursive_cte" ->
      """WITH RECURSIVE chain AS (
        |  SELECT o_orderkey AS k, o_orderkey AS root, 0 AS depth
        |  FROM orders WHERE o_orderkey % 64 = 0
        |  UNION ALL
        |  SELECT o.o_orderkey, c.root, c.depth + 1
        |  FROM orders o JOIN chain c ON o.o_orderkey = c.k + 17
        |  WHERE c.depth < 3
        |)
        |SELECT root, count(*) AS n, CAST(max(depth) AS BIGINT) AS maxd
        |FROM chain GROUP BY root ORDER BY root
        |""".stripMargin,

    "q45_union_all" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, 1 AS src, o_orderstatus, o_orderpriority FROM orders
        |  WHERE o_orderstatus = 'O' AND o_orderkey % 10 < 3
        |  UNION ALL
        |  SELECT o_orderkey, 2 AS src, o_orderstatus, o_orderpriority FROM orders
        |  WHERE o_orderpriority LIKE '1-%' AND o_orderkey % 10 < 3)
        |ORDER BY o_orderkey, src""".stripMargin,

    "q46_union_distinct" ->
      """SELECT o_custkey AS ck, o_orderstatus AS st FROM orders WHERE o_orderstatus = 'O'
        |UNION
        |SELECT o_custkey, o_orderstatus FROM orders WHERE o_orderpriority LIKE '1-%'
        |ORDER BY ck, st""".stripMargin,

    "q47_intersect" ->
      """SELECT o_custkey AS ck FROM orders
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 0
        |ORDER BY ck""".stripMargin,

    "q48_except" ->
      """SELECT c_custkey AS ck FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY ck""".stripMargin
  )
}
