package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming state semantics only observable across micro-batches (q73/q74):
  * watermark-driven late-data drop and stateful dedup. MemoryStream lets us
  * control batch boundaries; the memory-sink table is the observed output. */
class StreamSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream drains restore the session conf they pin") {
    // q73/q74/q78 pin the shuffle width (= state-store count) for their
    // drain; a restoration regression would silently re-plan every later
    // batch query in the session at the drain's width
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    SparkEntry.queries("q73_stream_watermark")(spark, sf).count()
    SparkEntry.queries("q74_stream_dedup_state")(spark, sf).count()
    assert(spark.conf.get("spark.sql.shuffle.partitions") == parts,
      "the streaming drain must restore spark.sql.shuffle.partitions")
  }

  test("q73 semantics: watermark drops late events and finalizes windows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val agg = ms.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour").as("w"), $"k")
      .agg(count(lit(1)).as("n"))
      .select(date_format($"w.start", "HH:mm").as("ws"), $"k", $"n")
    val q = agg.writeStream.format("memory").queryName("wm_spec")
      .outputMode("append").start()
    try {
      // batch 1: two events in the 10:00 window
      ms.addData((ts("2024-01-01 10:00:00"), "a"), (ts("2024-01-01 10:30:00"), "a"))
      q.processAllAvailable()
      // batch 2: advance event time -> watermark 12:20 closes the 10:00 window
      ms.addData((ts("2024-01-01 12:30:00"), "a"))
      q.processAllAvailable()
      val closed = spark.table("wm_spec").collect()
      assert(closed.exists(r => r.getString(0) == "10:00" && r.getLong(2) == 2),
        s"10:00 window must finalize with n=2, got ${closed.mkString(",")}")
      // batch 3: a LATE event for the already-closed 10:00 window -> dropped
      ms.addData((ts("2024-01-01 10:45:00"), "a"))
      q.processAllAvailable()
      // batch 4: advance further; the 12:00 window closes WITHOUT the late row
      ms.addData((ts("2024-01-01 14:30:00"), "a"))
      q.processAllAvailable()
      val out = spark.table("wm_spec").collect()
      assert(out.count(r => r.getString(0) == "10:00") == 1,
        "late event must not re-emit or amend the closed 10:00 window")
      assert(out.exists(r => r.getString(0) == "12:00" && r.getLong(2) == 1),
        "12:00 window must close with only its on-time event")
    } finally q.stop()
  }

  test("durable file sink: restart resumes from checkpoint, exactly-once output") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // The production sink contract the memory-sink drains can't show:
    // a parquet writeStream with a checkpoint must (a) resume from its
    // committed offsets after the query stops — the second run processes
    // ONLY post-restart data — and (b) expose exactly-once reads via the
    // sink's _spark_metadata commit log even though task files land
    // before the batch commits. At 100 TB this pair is what makes a
    // nightly-restarted ingestion pipeline idempotent with no manual
    // dedup pass.
    val dir = java.nio.file.Files.createTempDirectory("graft_fsink")
    val out = dir.resolve("out").toString
    val chk = dir.resolve("chk").toString
    val ms = MemoryStream[Long]
    def drain(): Unit = {
      val q = ms.toDF().toDF("id")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    ms.addData(0L until 100L: _*)
    drain()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst == 100, s"first drain must commit 100 rows, got $afterFirst")
    // restart: the checkpoint must hide already-committed offsets from
    // the new query instance
    ms.addData(100L until 150L: _*)
    drain()
    val ids = spark.read.parquet(out).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids.length == 150,
      s"restart must add exactly the 50 new rows, got ${ids.length}")
    assert(ids == (0L until 150L),
      "every id exactly once — no duplicates, no gaps, across the restart")
  }

  test("q102 merge sink: upserts fold across batches; batch replay is a no-op") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def state(rows: Seq[(Long, Long, String, Double)]) =
      rows.toDF("user_id", "last_event", "last_type", "last_value")
    def batch(rows: Seq[(Long, Long, String, Double)]) =
      rows.map { case (e, u, t, v) => (e, u, t, v) }
        .toDF("event_id", "user_id", "event_type", "value")
    def collectState(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
                             r.getDouble(3))).toSet
    // cross-batch: batch 2's higher event_id wins for user 1; user 2
    // keeps batch 1's row; user 3 arrives new
    val s0 = state(Nil)
    val s1 = ops.StreamOps.mergeLatest(s0,
      batch(Seq((10L, 1L, "view", 1.0), (11L, 2L, "view", 2.0))))
    val b2 = batch(Seq((20L, 1L, "purchase", 5.0), (21L, 3L, "view", 3.0)))
    val s2 = ops.StreamOps.mergeLatest(s1, b2)
    val want = Set((1L, 20L, "purchase", 5.0), (2L, 11L, "view", 2.0),
                   (3L, 21L, "view", 3.0))
    assert(collectState(s2) == want)
    // idempotence under redelivery: a restarted query re-applies its last
    // uncommitted batch — the state must not change
    assert(collectState(ops.StreamOps.mergeLatest(s2, b2)) == want)
    // within-batch reduction: many events for one user in ONE batch
    // collapse to the argmax before touching state
    val s3 = ops.StreamOps.mergeLatest(s0,
      batch(Seq((1L, 7L, "a", 1.0), (3L, 7L, "c", 3.0), (2L, 7L, "b", 2.0))))
    assert(collectState(s3) == Set((7L, 3L, "c", 3.0)))
  }

  test("q114 fingerprint index: folds across batches; batch replay is a no-op") {
    import spark.implicits._
    def fps(rows: Seq[(String, Long)]) = rows.toDF("fp", "doc_id")
    def collectIdx(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val s0 = fps(Nil)
    val s1 = ops.StreamOps.mergeFpIndex(s0, fps(Seq(("a", 1L), ("b", 2L))))
    // a duplicate fingerprint from a LATER batch extends the index (both
    // holders kept — the survivor/min is derived at query time), and an
    // already-indexed pair arriving again changes nothing
    val b2 = fps(Seq(("a", 5L), ("c", 3L), ("b", 2L)))
    val s2 = ops.StreamOps.mergeFpIndex(s1, b2)
    val want = Set(("a", 1L), ("a", 5L), ("b", 2L), ("c", 3L))
    assert(collectIdx(s2) == want)
    // idempotence under redelivery — exactly-once rests on this
    assert(collectIdx(ops.StreamOps.mergeFpIndex(s2, b2)) == want)
    // within-batch duplicates collapse too
    assert(collectIdx(ops.StreamOps.mergeFpIndex(
      s0, fps(Seq(("x", 9L), ("x", 9L))))) == Set(("x", 9L)))
  }

  test("custom state: flatMapGroupsWithState carries per-user counts across batches") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long)] // (user, value)
    val counted = ms.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          Iterator((user, total))
      }
    val q = counted.toDF("user", "cnt").writeStream.format("memory")
      .queryName("fm_spec").outputMode("append").start()
    try {
      ms.addData((1L, 1L), (1L, 2L), (2L, 5L))
      q.processAllAvailable()
      ms.addData((1L, 3L))
      q.processAllAvailable()
      val out = spark.table("fm_spec").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch 1 emits (1,2),(2,1); batch 2 emits (1,3) — state survived
      assert(out == Set((1L, 2L), (2L, 1L), (1L, 3L)), s"got $out")
    } finally q.stop()
  }

  test("rate source: q78's profile kernel is source-agnostic, output equals arithmetic truth") {
    // The registered q78 drains the FILE source and the cross-batch pin
    // above uses MemoryStream; this case drives the SAME kernel
    // (StreamOps.profileState — shared by reference, not re-spelled) from
    // the rate-micro-batch source: deterministic generated rows
    // (value = 0,1,2,… with rowsPerBatch per batch), so the drained
    // profile must equal closed-form arithmetic over the consumed prefix
    // — no file, no fixture, proving nothing in the state logic depends
    // on the source. Kafka maps identically (projection only; scaladoc
    // on profileState).
    import spark.implicits._
    val rows = 140L // 20 per user, users = value % 7
    val src = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", "35").option("numPartitions", "2").load()
      .select((col("value") % 7).as("_1"), col("value").as("_2"))
      .as[(Long, Long)]
    val out = graft.ops.StreamOps.profileState(src)
      .toDF("user_id", "n_events", "min_eid", "max_eid")
    val q = out.writeStream.format("memory").queryName("rate_q78")
      .outputMode("append").start()
    try {
      // 4 batches of 35 = values 0..139; every user appears in every
      // batch, so waiting for all 4 batches' emissions (4*7 rows) makes
      // the final per-user state cover exactly the 140-value prefix
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (spark.table("rate_q78").count() < 28 &&
             System.nanoTime() < deadline) Thread.sleep(100)
      q.stop(); q.awaitTermination()
      val got = spark.table("rate_q78")
        .filter(col("max_eid") < rows) // bound to the 4-batch prefix
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n"), min(col("min_eid")).as("mn"),
             max(col("max_eid")).as("mx"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getLong(3)))).toMap
      assert(got.keySet == (0L until 7L).toSet, s"users: ${got.keySet}")
      for (u <- 0L until 7L) {
        // value % 7 == u within 0..139: 20 values, min u, max u + 133
        assert(got(u) == ((20L, u, u + 133L)),
          s"user $u profile ${got(u)} != arithmetic truth")
      }
    } finally if (q.isActive) q.stop()
  }

  test("large-state deployment: RocksDB state store, identical results off-heap") {
    // The default HDFS-backed state store keeps every key's state ON the
    // executor HEAP — fine for bounded window state (q70-q72), an OOM at
    // 100 TB for high-cardinality state like q74/q114's per-fingerprint
    // dedup index. The deployment answer is the bundled RocksDB provider:
    // state lives on executor local disk (memtable + SST), same exactly-
    // once semantics via the same checkpoint contract. Provider choice is
    // a CONF, not a plan change — pin that results are identical and that
    // RocksDB really served the state (its custom metrics appear in the
    // query progress). Conf set on a child session; concurrent suites
    // never see it.
    import org.apache.spark.sql.streaming.OutputMode
    import scala.jdk.CollectionConverters._
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val ctx = s2.sqlContext
    import s2.implicits._
    val ms = MemoryStream[(Long, Long)] // (key, value)
    val agg = ms.toDS().toDF("k", "v").groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val q = agg.writeStream.format("memory").queryName("rocks_spec")
      .outputMode(OutputMode.Complete).start()
    try {
      ms.addData((1L, 10L), (1L, 20L), (2L, 5L))
      q.processAllAvailable()
      ms.addData((2L, 7L), (3L, 1L))
      q.processAllAvailable()
      val out = s2.table("rocks_spec").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out == Set((1L, 2L, 30L), (2L, 2L, 12L), (3L, 1L, 1L)),
        s"state must fold across batches identically under RocksDB: $out")
      val rocksMetrics = q.lastProgress.stateOperators.toSeq
        .flatMap(_.customMetrics.keySet.asScala)
        .filter(_.toLowerCase.contains("rocksdb"))
      assert(rocksMetrics.nonEmpty,
        "the RocksDB provider must actually serve the state operator")
    } finally q.stop()
  }

  test("q90 semantics: stream-static join enriches per batch with ZERO streaming state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY")).toDF("k", "seg")
    val ms = MemoryStream[Long]
    val joined = ms.toDF().toDF("k").join(broadcast(dim), Seq("k"), "inner")
    val q = joined.writeStream.format("memory").queryName("ss_spec")
      .outputMode("append").start()
    try {
      ms.addData(1L, 2L, 3L) // 3 has no dim row -> dropped by inner join
      q.processAllAvailable()
      ms.addData(2L)
      q.processAllAvailable()
      val out = spark.table("ss_spec").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(out.sorted.toSeq ==
        Seq((1L, "BUILDING"), (2L, "MACHINERY"), (2L, "MACHINERY")),
        s"got ${out.toSeq}")
      // the 100 TB property: enrichment keeps NO state between batches —
      // an unbounded feed joins a dimension without watermarks or stores
      val st = q.lastProgress.stateOperators
      assert(st == null || st.isEmpty,
        s"stream-static inner join must be stateless, got ${st.mkString(",")}")
    } finally q.stop()
  }

  test("q95 semantics: stream-stream interval join matches across batches within the horizon") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val vs = MemoryStream[(Long, Long, Timestamp)] // (view_id, user, ts)
    val bs = MemoryStream[(Long, Long, Timestamp)] // (buy_id, user, ts)
    val views = vs.toDF().toDF("view_id", "user_id", "view_ts")
      .withWatermark("view_ts", "10 minutes")
    val buys = bs.toDF().toDF("buy_id", "buyer_id", "buy_ts")
      .withWatermark("buy_ts", "10 minutes")
    val joined = views.join(buys,
      col("user_id") === col("buyer_id") &&
        col("buy_ts") >= col("view_ts") &&
        col("buy_ts") < col("view_ts") + expr("INTERVAL 6 HOURS"))
      .select(col("user_id"), col("view_id"), col("buy_id"))
    val q = joined.writeStream.format("memory").queryName("ssj_spec")
      .outputMode("append").start()
    try {
      // batch 1: a view, no purchase yet — view state must be RETAINED
      vs.addData((100L, 1L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      assert(spark.table("ssj_spec").count() == 0)
      // batch 2: one purchase inside the 6 h horizon (joins the batch-1
      // view — cross-batch state), one outside it (must not join)
      bs.addData((200L, 1L, ts("2024-01-01 12:00:00")),
                 (201L, 1L, ts("2024-01-01 20:00:00")))
      q.processAllAvailable()
      val out = spark.table("ssj_spec").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out == Set((1L, 100L, 200L)),
        s"exactly the in-horizon cross-batch pair must join, got $out")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER emits unmatched rows after the watermark closes") {
    // The outer-join contract on two unbounded streams: an unmatched left
    // row CANNOT emit when seen (its match may still arrive); it emits
    // null-extended only once the watermark proves the join horizon is
    // closed. The global watermark is the min across both sources, so
    // both streams must advance.
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val vs = MemoryStream[(Long, Long, Timestamp)]
    val bs = MemoryStream[(Long, Long, Timestamp)]
    val views = vs.toDF().toDF("view_id", "user_id", "view_ts")
      .withWatermark("view_ts", "10 minutes")
    val buys = bs.toDF().toDF("buy_id", "buyer_id", "buy_ts")
      .withWatermark("buy_ts", "10 minutes")
    val joined = views.join(buys,
      col("user_id") === col("buyer_id") &&
        col("buy_ts") >= col("view_ts") &&
        col("buy_ts") < col("view_ts") + expr("INTERVAL 6 HOURS"),
      "left_outer")
      .select(col("view_id"), col("buy_id"))
    val q = joined.writeStream.format("memory").queryName("ssoj_spec")
      .outputMode("append").start()
    try {
      // batch 1: a view with no matching purchase — nothing may emit yet
      vs.addData((100L, 1L, ts("2024-01-01 10:00:00")))
      bs.addData((200L, 2L, ts("2024-01-01 10:00:00"))) // other user
      q.processAllAvailable()
      assert(spark.table("ssoj_spec").count() == 0,
        "an unmatched row must not emit while its horizon is open")
      // batch 2: both streams advance a day -> watermark passes
      // 10:00 + 6 h + 10 min, closing view 100's horizon
      vs.addData((101L, 9L, ts("2024-01-02 10:00:00")))
      bs.addData((201L, 9L, ts("2024-01-02 10:00:00")))
      q.processAllAvailable()
      // one more batch so the advanced watermark is applied to state
      vs.addData((102L, 8L, ts("2024-01-02 10:00:01")))
      bs.addData((202L, 8L, ts("2024-01-02 10:00:01")))
      q.processAllAvailable()
      val out = spark.table("ssoj_spec").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(out.contains((100L, -1L)),
        s"view 100 must emit null-extended after its horizon closed, got $out")
    } finally q.stop()
  }

  test("q74 semantics: dropDuplicatesWithinWatermark keeps one row per id") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val dedup = ms.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = dedup.writeStream.format("memory").queryName("dd_spec")
      .outputMode("append").start()
    try {
      ms.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      // duplicates inside the watermark horizon -> dropped
      ms.addData((1L, ts("2024-01-01 10:02:00")), (2L, ts("2024-01-01 10:03:00")),
                 (3L, ts("2024-01-01 10:04:00")))
      q.processAllAvailable()
      val ids = spark.table("dd_spec").select("id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.mkString(",")}")
    } finally q.stop()
  }

  test("cdf subscription: ticks converge the view; maintenance and idle ticks commit nothing") {
    import spark.implicits._
    import graft.ops.{Snapshot, StreamOps}
    val base = java.nio.file.Files.createTempDirectory("graft_cdf").toString
    val up = s"$base/up"; val view = s"$base/view"
    def rows(ks: Range, tag: String) =
      ks.map(k => (k.toLong, s"g${k % 3}", k.toLong * 10, tag))
        .toDF("k", "g", "p", "tag")
    def recompute(): Set[(String, Long, BigDecimal)] =
      Snapshot.read(spark, up).groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          sum(col("p")).cast("decimal(31,3)").as("t")).collect()
        .map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getDecimal(2)))).toSet
    def viewState(): Set[(String, Long, BigDecimal)] =
      Snapshot.read(spark, view).collect()
        .map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getDecimal(2)))).toSet
    def tick() = StreamOps.viewMaintainTick(spark, up, view, "k", "g", "p")
    // tick against an empty upstream: nothing to subscribe to yet
    tick()
    assert(Snapshot.versions(spark, view).isEmpty)
    // v1 data -> initializing tick aggregates the head once
    Snapshot.commit(rows(1 to 300, "a"), up, 0, "k")
    tick()
    assert(viewState() == recompute() && StreamOps.viewCursor(spark, view) == 1)
    // idle redelivery: no upstream movement, no view commit
    tick()
    assert(Snapshot.versions(spark, view) == Seq(1))
    // v2 = narrow COW update + insert; v3 = OPTIMIZE compact (maintenance)
    val ch = Seq((5L, 99L), (301L, 42L)).toDF("k", "np")
    Snapshot.mergeCow(spark, up, ch, "k", (b, c) =>
      b.join(c, Seq("k"), "full_outer")
        .select(col("k"),
          coalesce(col("g"), concat(lit("g"), col("k") % 3)).as("g"),
          coalesce(col("np"), col("p")).as("p"),
          coalesce(col("tag"), lit("i")).as("tag")))
    Snapshot.compactVersion(spark, up, 128L << 20)
    tick()
    assert(viewState() == recompute(), "delta application must equal recompute")
    assert(StreamOps.viewCursor(spark, view) == 3, "cursor reaches head past maintenance")
    assert(Snapshot.versions(spark, view) == Seq(1, 2),
      "the data step commits once; the maintenance step adds nothing")
    // maintenance-only movement: the subscription ticks over it for free
    Snapshot.compactVersion(spark, up, 128L << 20)
    tick()
    assert(Snapshot.versions(spark, view) == Seq(1, 2) &&
      StreamOps.viewCursor(spark, view) == 3)
    // a later data commit catches the cursor up across the skipped range
    Snapshot.mergeCow(spark, up, Seq((7L, 1L)).toDF("k", "np"), "k", (b, c) =>
      b.join(c, Seq("k"), "full_outer")
        .select(col("k"), col("g"), coalesce(col("np"), col("p")).as("p"),
          col("tag")))
    tick()
    assert(viewState() == recompute() && StreamOps.viewCursor(spark, view) == 5)
    // the cursor is DURABLE state: a fresh subscriber (nothing in memory)
    // resumes exactly; replaying the tick is a no-op
    assert(StreamOps.viewCursor(spark, view) == 5)
    val before = Snapshot.versions(spark, view)
    tick()
    assert(Snapshot.versions(spark, view) == before)
    // a RESTORE is a data change the subscription must apply like any
    // other: rolling the upstream back to v1 drives the view back to
    // the v1 aggregate through ordinary (inverse) deltas
    Snapshot.restore(spark, up, 1)
    tick()
    assert(viewState() == recompute() && StreamOps.viewCursor(spark, view) == 6)
  }
}
