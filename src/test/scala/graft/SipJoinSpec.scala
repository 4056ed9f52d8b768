package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ops.{SipJoin, Snapshot, Warehouse}

/** Sideways information passing ([[graft.ops.SipJoin]]): dim-derived
  * predicates prune fact FILES at planning time, answers unchanged. */
class SipJoinSpec extends SparkSpec {

  private def sorted(df: DataFrame): Seq[Row] =
    df.orderBy(df.columns.map(col).toIndexedSeq: _*).collect().toSeq

  private def fact(dir: String): DataFrame =
    spark.read.format("graft").load(dir)

  private def nationDim(mult: Int): DataFrame =
    Tables.nation(spark, sf)
      .select((col("n_nationkey") * mult).cast("long").as("dk"))

  test("in-list SIP join equals the unpruned join, plans a proper file subset") {
    val dir = Warehouse.rangeOrders(spark, sf)
    val m = Snapshot.manifest(spark, dir, Snapshot.currentVersion(spark, dir))
    val dim = nationDim(13) // keys 0,13,…,312 — low two of four bands
    val ks = SipJoin.dimKeys(dim, "dk", LongType, maxKeys = 1024)
    assert(ks.isInstanceOf[SipJoin.KeyList], s"expected verbatim list: $ks")
    val planned = SipJoin.plannedFiles(m, "key2", ks)
    assert(planned.nonEmpty && planned.size < m.files.size,
      s"expected a proper subset, got ${planned.size}/${m.files.size}")
    val sip = SipJoin.sipJoinWith(fact(dir), dim, "key2", "dk", ks)
    val plain = fact(dir).join(dim, col("key2") === col("dk"))
    assert(sorted(sip) == sorted(plain))
  }

  test("past maxKeys the summary falls back to the range envelope, stays correct") {
    val dir = Warehouse.rangeOrders(spark, sf)
    val m = Snapshot.manifest(spark, dir, Snapshot.currentVersion(spark, dir))
    val dim = nationDim(13) // 25 distinct keys > maxKeys = 8
    val ks = SipJoin.dimKeys(dim, "dk", LongType, maxKeys = 8)
    ks match {
      case SipJoin.KeyRange(lo, hi, n) =>
        assert(lo == 0L && hi == 312L && n == 9L, s"bad envelope: $ks")
      case other => fail(s"expected KeyRange, got $other")
    }
    // the envelope still prunes the bands above the dim's key space
    val planned = SipJoin.plannedFiles(m, "key2", ks)
    assert(planned.nonEmpty && planned.size < m.files.size,
      s"expected a proper subset, got ${planned.size}/${m.files.size}")
    val sip = SipJoin.sipJoinWith(fact(dir), dim, "key2", "dk", ks)
    val plain = fact(dir).join(dim, col("key2") === col("dk"))
    assert(sorted(sip) == sorted(plain))
  }

  test("bloom sidecars prune range-overlapping files from an in-list summary") {
    // bloomOrders clusters on cust_key, so order_key RANGES prune
    // nothing — only the per-file sketches can narrow the in-list
    val dir = Warehouse.bloomOrders(spark, sf)
    val m = Snapshot.manifest(spark, dir, Snapshot.currentVersion(spark, dir))
    val present = SipJoin.KeyList(Warehouse.bloomProbeKeys)
    val planned = SipJoin.plannedFiles(m, "order_key", present)
    assert(planned.nonEmpty && planned.size < m.files.size,
      s"blooms should skip files, got ${planned.size}/${m.files.size}")
    // keys provably absent from the table: zero files planned, and the
    // executed join agrees
    val absent = SipJoin.KeyList(Seq(2000000L, 2000001L))
    assert(SipJoin.plannedFiles(m, "order_key", absent).isEmpty)
    import spark.implicits._
    val dim = Seq(2000000L, 2000001L).toDF("dk")
    val out = SipJoin.sipJoinWith(fact(dir), dim, "order_key", "dk", absent)
    assert(out.count() == 0)
  }

  test("an empty dim folds the join to an empty local relation") {
    val dir = Warehouse.rangeOrders(spark, sf)
    val m = Snapshot.manifest(spark, dir, Snapshot.currentVersion(spark, dir))
    val dim = nationDim(1).filter(lit(false))
    val ks = SipJoin.dimKeys(dim, "dk", LongType)
    assert(ks == SipJoin.EmptyDim)
    assert(SipJoin.plannedFiles(m, "key2", ks).isEmpty)
    val out = SipJoin.sipJoinWith(fact(dir), dim, "key2", "dk", ks)
    assert(out.count() == 0)
    // lit(false) folds before any source is planned: every surviving
    // leaf is a LocalRelation — no graft scan, no parquet scan
    assert(out.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[LocalRelation]), "expected a folded plan")
  }

  test("join types that keep non-matching fact rows refuse") {
    val dir = Warehouse.rangeOrders(spark, sf)
    val dim = nationDim(13)
    Seq("left", "left_outer", "full", "right").foreach { jt =>
      val e = intercept[IllegalArgumentException] {
        SipJoin.sipJoin(fact(dir), dim, "key2", "dk", joinType = jt)
      }
      assert(e.getMessage.contains("inner/left_semi"), s"$jt: $e")
    }
  }

  test("left_semi SIP keeps the fact schema and the filter semantics") {
    val dir = Warehouse.rangeOrders(spark, sf)
    val dim = nationDim(13)
    val semi = SipJoin.sipJoin(fact(dir), dim, "key2", "dk",
      joinType = "left_semi")
    assert(semi.columns.toSeq == fact(dir).columns.toSeq)
    val plain = fact(dir).join(dim, col("key2") === col("dk"), "left_semi")
    assert(sorted(semi) == sorted(plain))
  }

  test("null and mistyped dim keys: nulls drop, ints cast to the fact key type") {
    val dir = Warehouse.rangeOrders(spark, sf)
    import spark.implicits._
    // INT keys + a null: the summary casts to LongType and drops the
    // null (it never equi-matches), so pushdown sees bare long literals
    val dim = Seq[Option[Int]](Some(13), Some(26), None).toDF("dk")
    val ks = SipJoin.dimKeys(dim, "dk",
      fact(dir).schema("key2").dataType, maxKeys = 16)
    ks match {
      case SipJoin.KeyList(vs) =>
        assert(vs.toSet == Set(13L, 26L), s"bad keys: $vs")
      case other => fail(s"expected KeyList, got $other")
    }
    val sip = SipJoin.sipJoin(fact(dir), dim, "key2", "dk")
    val plain = fact(dir).join(dim, col("key2") === col("dk"))
    assert(sorted(sip) == sorted(plain))
  }
}
