package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable HyperLogLog sketch surface (SURVEY §4.2's
  * `TypedImperativeAggregate` slot — the one custom-agg shape q28's
  * built-in `approx_count_distinct` never exercises):
  *
  *  - `graft_hll_sketch(x)` (aggregate) → BINARY: the 2^12-register HLL
  *    of the group's values. This is the EXPORT: a per-partition /
  *    per-day sketch can be persisted and unioned later without
  *    re-reading the data — the pattern a 100 TB pipeline needs for
  *    "distinct users per day, rolled up to any date range".
  *  - `graft_hll_merge(s)` (aggregate) → BINARY: union of pre-computed
  *    sketches (element-wise register max).
  *  - `graft_hll_est(s)` (scalar) → BIGINT: cardinality estimate.
  *
  * Register merge is an element-wise max, so sketch(A ∪ B) ==
  * merge(sketch(A), sketch(B)) BIT-EXACT — merging is associative,
  * commutative and idempotent, which is what makes the export safely
  * re-aggregable in any order/grouping (PropertySpec pins this, plus the
  * estimate's accuracy band). Standard HLL (Flajolet et al. 2007) with
  * the HLL++ small-range linear-counting correction (Heule et al. 2013);
  * p = 12 → m = 4096 registers, ~1.6% relative standard error, 4 KB per
  * sketch. Hashing is fixed and seedless (splitmix64 / FNV-1a+splitmix
  * finalizer — same determinism-over-randomness rule as the MinHash
  * salts and SRP planes), so sketches are replay-stable and mergeable
  * across jobs and sessions.
  */
object Hll {

  val P = 12
  val M: Int = 1 << P // 4096 registers, one byte each

  private def splitmix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 64-bit value hash per supported input type. Strings fold bytes with
    * FNV-1a then finalize with splitmix64 (FNV alone is too linear for
    * the leading-zero statistics HLL reads). */
  def hash(v: Any): Long = v match {
    case l: Long => splitmix64(l)
    case i: Int => splitmix64(i.toLong)
    case s: UTF8String =>
      val bytes = s.getBytes
      var h = 0xCBF29CE484222325L
      var i = 0
      while (i < bytes.length) {
        h ^= bytes(i) & 0xFFL
        h *= 0x100000001B3L
        i += 1
      }
      splitmix64(h)
    case other => throw new IllegalArgumentException(
      s"graft_hll_sketch: unsupported runtime value $other")
  }

  /** Fold one hashed value into the register array: register index from
    * the top P bits, rank = leading zeros of the remaining 52 bits + 1
    * (the (1 << (P-1)) guard bit caps the rank for an all-zero tail). */
  def add(regs: Array[Byte], hash: Long): Unit = {
    val idx = (hash >>> (64 - P)).toInt
    val rank = (java.lang.Long.numberOfLeadingZeros(
      (hash << P) | (1L << (P - 1))) + 1).toByte
    if (rank > regs(idx)) regs(idx) = rank
  }

  /** Element-wise register max of `other` into `into` (the union). */
  def mergeInto(into: Array[Byte], other: Array[Byte]): Array[Byte] = {
    require(other.length == M,
      s"graft_hll sketch must be $M bytes, got ${other.length}")
    var i = 0
    while (i < M) {
      if (other(i) > into(i)) into(i) = other(i)
      i += 1
    }
    into
  }

  /** Cardinality estimate: bias-corrected harmonic mean, with the
    * linear-counting small-range correction when registers are empty. */
  def estimate(regs: Array[Byte]): Long = {
    require(regs.length == M,
      s"graft_hll sketch must be $M bytes, got ${regs.length}")
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * M.toDouble * M.toDouble / invSum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.rint(est).toLong
  }

  private[expressions] def checkSketchInput(dt: DataType,
                                            fn: String): TypeCheckResult =
    dt match {
      case LongType | IntegerType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn expects BIGINT, INT or STRING, got ${other.simpleString}")
    }
}

/** `graft_hll_sketch(x)` — build the group's HLL registers (BINARY). */
case class HllSketchAgg(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    Hll.checkSketchInput(child.dataType, prettyName)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) Hll.add(buf, Hll.hash(v))
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    Hll.mergeInto(buf, other)

  // clone: the caller may reuse/mutate the buffer after eval
  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_sketch"

  override def withNewMutableAggBufferOffset(n: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(nc: Expression): HllSketchAgg =
    copy(child = nc)
}

/** `graft_hll_merge(s)` — union pre-computed sketches (BINARY). The
  * re-aggregation half of the export: group sketches staged by one job
  * roll up to any coarser grouping without touching the raw data. */
case class HllMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hll_merge expects BINARY (a graft_hll_sketch), got " +
        other.simpleString)
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) Hll.mergeInto(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    Hll.mergeInto(buf, other)

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_merge"

  override def withNewMutableAggBufferOffset(n: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(nc: Expression): HllMergeAgg =
    copy(child = nc)
}

/** `graft_hll_est(s)` — scalar cardinality estimate of a sketch. */
case class HllEstimate(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hll_est expects BINARY (a graft_hll_sketch), got " +
        other.simpleString)
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll_est"

  override def nullSafeEval(v: Any): Any =
    Hll.estimate(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Hll.estimate($c);")

  override protected def withNewChildInternal(nc: Expression): HllEstimate =
    copy(child = nc)
}
