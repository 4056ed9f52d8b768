package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable heavy-hitters (top-k frequent items) sketch — the
  * bounded-memory twin of exact token counting (q62), for the regime
  * where the vocabulary does NOT fit a hash aggregate (URLs, user ids,
  * n-grams at web scale). Misra-Gries summary (Misra & Gries 1982) with
  * the subtract-min eviction and the mergeable-summaries combine of
  * Agarwal et al. (PODS 2012):
  *
  *  - `graft_topk_sketch(x)` (aggregate, STRING input) → BINARY summary
  *    of at most [[TopK.Cap]] counters.
  *  - `graft_topk_merge(s)` (aggregate) → BINARY: combine pre-computed
  *    summaries (sum counts, keep the top Cap, fold the truncation mass
  *    into the error bound) — per-day sketches roll up to any range.
  *  - `graft_topk(s, n)` (scalar) → ARRAY<STRUCT<item, est, err>>: the
  *    top-n surviving items by estimated count (desc, then item asc for
  *    determinism). `est` never exceeds the true count and undercounts
  *    by at most `err` (the summary's accumulated decrement mass), so
  *    true ∈ [est, est + err] — and any item whose true count exceeds
  *    `err` is guaranteed present.
  *
  * When the distinct-item count never exceeds Cap (every graft fixture:
  * 31-token vocabulary), no eviction fires anywhere, `err` is 0 and the
  * sketch is EXACT — which is what lets q29 run against a plain GROUP BY
  * oracle while the eviction regime is property-tested separately
  * (PropertySpec: error bound + heavy-hitter recall on >Cap vocabularies,
  * split-merge vs one-pass agreement).
  */
object TopK {

  /** Counter capacity: 256 entries bounds the summary at a few KB and the
    * undercount at N/256 — the classic accuracy/memory trade; a 100 TB
    * deployment sizes this to its tolerated error, the point is that
    * memory NEVER follows the vocabulary. */
  val Cap = 256

  /** cap counters + the accumulated decrement mass (the error bound). */
  final class Summary(val cap: Int) {
    var dec: Long = 0L
    val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
  }

  def create(cap: Int = Cap): Summary = new Summary(cap)

  def add(s: Summary, item: String): Unit = {
    val cur = s.counts.getOrElse(item, -1L)
    if (cur >= 0L) s.counts(item) = cur + 1L
    else if (s.counts.size < s.cap) s.counts(item) = 1L
    else {
      // subtract-min eviction: every min-count entry zeroes out, so a slot
      // is always freed; the subtracted mass joins the error bound
      val m = s.counts.values.min
      s.dec += m
      val ks = s.counts.keys.toArray
      ks.foreach { k =>
        val v = s.counts(k) - m
        if (v <= 0L) s.counts.remove(k) else s.counts(k) = v
      }
      s.counts(item) = 1L
    }
  }

  /** Combine `other` into `into` (Agarwal et al.: sum counts, then if over
    * capacity subtract the (cap+1)-th largest and drop non-positives). */
  def mergeInto(into: Summary, other: Summary): Summary = {
    require(into.cap == other.cap,
      s"cannot merge summaries of capacity ${into.cap} and ${other.cap}")
    into.dec += other.dec
    other.counts.foreach { case (k, v) =>
      into.counts(k) = into.counts.getOrElse(k, 0L) + v
    }
    if (into.counts.size > into.cap) {
      val t = into.counts.values.toArray.sorted(Ordering[Long].reverse)
        .apply(into.cap) // (cap+1)-th largest
      into.dec += t
      val ks = into.counts.keys.toArray
      ks.foreach { k =>
        val v = into.counts(k) - t
        if (v <= 0L) into.counts.remove(k) else into.counts(k) = v
      }
    }
    into
  }

  /** Top-n by (est desc, item asc); each row carries the summary's error
    * bound (true count ∈ [est, est + err]). */
  def topN(s: Summary, n: Int): Array[(String, Long, Long)] =
    s.counts.toArray.sortBy { case (k, v) => (-v, k) }.take(n)
      .map { case (k, v) => (k, v, s.dec) }

  def serialize(s: Summary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(s.cap)
    out.writeLong(s.dec)
    out.writeInt(s.counts.size)
    // sorted writes make equal summaries byte-equal (stable across map
    // iteration order) — useful for test diffing, required by nothing
    s.counts.toArray.sortBy(_._1).foreach { case (k, v) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Summary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new Summary(in.readInt())
    s.dec = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      s.counts(new String(b, "UTF-8")) = in.readLong()
      i += 1
    }
    s
  }
}

/** `graft_topk_sketch(x)` — build the group's Misra-Gries summary. */
case class TopKSketchAgg(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopK.Summary] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_topk_sketch expects STRING, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): TopK.Summary = TopK.create()

  override def update(buf: TopK.Summary, row: InternalRow): TopK.Summary = {
    val v = child.eval(row)
    if (v != null) TopK.add(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: TopK.Summary, other: TopK.Summary): TopK.Summary =
    TopK.mergeInto(buf, other)

  override def eval(buf: TopK.Summary): Any = TopK.serialize(buf)

  override def serialize(buf: TopK.Summary): Array[Byte] = TopK.serialize(buf)
  override def deserialize(b: Array[Byte]): TopK.Summary = TopK.deserialize(b)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_sketch"

  override def withNewMutableAggBufferOffset(n: Int): TopKSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(nc: Expression): TopKSketchAgg =
    copy(child = nc)
}

/** `graft_topk_merge(s)` — combine pre-computed summaries (re-aggregation:
  * per-partition/per-day sketches roll up without touching raw data). */
case class TopKMergeAgg(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopK.Summary] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_topk_merge expects BINARY (a graft_topk_sketch), got " +
        other.simpleString)
  }

  override def createAggregationBuffer(): TopK.Summary = TopK.create()

  override def update(buf: TopK.Summary, row: InternalRow): TopK.Summary = {
    val v = child.eval(row)
    if (v != null)
      TopK.mergeInto(buf, TopK.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: TopK.Summary, other: TopK.Summary): TopK.Summary =
    TopK.mergeInto(buf, other)

  override def eval(buf: TopK.Summary): Any = TopK.serialize(buf)

  override def serialize(buf: TopK.Summary): Array[Byte] = TopK.serialize(buf)
  override def deserialize(b: Array[Byte]): TopK.Summary = TopK.deserialize(b)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_merge"

  override def withNewMutableAggBufferOffset(n: Int): TopKMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(nc: Expression): TopKMergeAgg =
    copy(child = nc)
}

/** `graft_topk(s, n)` — scalar: top-n items of a summary, ordered
  * (est desc, item asc). Evaluated once per result row, never in a hot
  * per-input loop, so interpreted eval (CodegenFallback) is fine. */
case class TopKItems(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk expects (BINARY, INT), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_topk"

  override def nullSafeEval(sk: Any, n: Any): Any = {
    val rows = TopK.topN(
      TopK.deserialize(sk.asInstanceOf[Array[Byte]]), n.asInstanceOf[Int])
      .map { case (item, est, err) =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(item), est, err)) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TopKItems = copy(left = l, right = r)
}
