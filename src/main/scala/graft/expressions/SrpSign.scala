package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** 64-bit sign-random-projection (SRP) LSH signature over an ARRAY<FLOAT>
  * or ARRAY<DOUBLE> embedding: bit r of the result is set iff the dot
  * product of the input with fixed hyperplane r is >= 0.
  *
  * Charikar's SimHash-for-vectors bound ("Similarity estimation techniques
  * from rounding algorithms", STOC 2002): P[bit r agrees for vectors x, y]
  * = 1 - theta(x, y)/pi. Banding the 64 bits 8x8 therefore gives a
  * cos ~ 0.998 pair a per-band collision probability of ~0.85 and a
  * >=1-of-8-bands probability of ~(1 - 2.6e-7), while a random pair
  * (cos ~ 0) collides in ~8/256 ~ 3% of cases. This is the embedding-space
  * analog of the MinHash banding in [[graft.ops.Similarity]]: candidates
  * grow with hash-bucket occupancy, never as an all-pairs product.
  *
  * The hyperplanes are a fixed splitmix64-derived matrix (same
  * determinism-over-randomness rule as the MinHash xxhash64 salts): replay,
  * retry and speculative re-execution always see identical planes, with no
  * side table, no broadcast, and no RNG state. Only the SIGN of each
  * projection is used, so the component distribution just needs symmetry
  * around 0; components are uniform in [-1, 1).
  *
  * Registered as SQL function `graft_srp_sign` by [[graft.GraftExtensions]].
  * One fused codegen loop per row (64 x dim multiply-adds); supports input
  * dimension up to [[SrpSign.MaxDim]].
  */
case class SrpSign(child: Expression) extends UnaryExpression {

  /** True when the input is ARRAY<FLOAT>; false for ARRAY<DOUBLE>. */
  private lazy val floatInput: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Static may-contain-null-elements bit (same convention as
    * [[CosineSimilarity]]): a NULL element yields a NULL signature instead
    * of an unsafe-array garbage read; when the array type declares
    * containsNull=false the per-element branch is omitted entirely. */
  private lazy val elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def nullable: Boolean = child.nullable || elementsNullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_sign expects ARRAY<FLOAT> or ARRAY<DOUBLE>, got " +
        other.simpleString)
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_srp_sign"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(n <= SrpSign.MaxDim,
      s"graft_srp_sign supports dim <= ${SrpSign.MaxDim}, got $n")
    if (elementsNullable) {
      var k = 0
      while (k < n) {
        if (x.isNullAt(k)) return null
        k += 1
      }
    }
    val planes = SrpSign.planes
    var sig = 0L
    var r = 0
    while (r < 64) {
      var dot = 0.0
      val base = r * SrpSign.MaxDim
      var k = 0
      while (k < n) {
        val xv = if (floatInput) x.getFloat(k).toDouble else x.getDouble(k)
        dot += planes(base + k) * xv
        k += 1
      }
      if (dot >= 0.0) sig |= (1L << r)
      r += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planes = ctx.addReferenceObj("srpPlanes", SrpSign.planes, "double[]")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val r = ctx.freshName("r")
      val k = ctx.freshName("k")
      val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      val kn = ctx.freshName("kn")
      val get = if (floatInput) "getFloat" else "getDouble"
      val nullElemCheck =
        if (elementsNullable)
          s"""for (int $kn = 0; $kn < $n; $kn++) {
             |  if ($a.isNullAt($kn)) { ${ev.isNull} = true; break; }
             |}""".stripMargin
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n > ${SrpSign.MaxDim}) {
         |  throw new IllegalArgumentException(
         |    "graft_srp_sign supports dim <= ${SrpSign.MaxDim}, got " + $n);
         |}
         |$nullElemCheck
         |if (!${ev.isNull}) {
         |  long $sig = 0L;
         |  for (int $r = 0; $r < 64; $r++) {
         |    double $dot = 0.0;
         |    final int $base = $r * ${SrpSign.MaxDim};
         |    for (int $k = 0; $k < $n; $k++) {
         |      $dot += $planes[$base + $k] * (double) $a.$get($k);
         |    }
         |    if ($dot >= 0.0) $sig |= (1L << $r);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpSign =
    copy(child = newChild)
}

object SrpSign {

  /** Largest supported embedding dimension; the plane matrix is 64 x MaxDim
    * (128 KiB of doubles), shipped once per plan as a codegen reference. */
  val MaxDim = 256

  /** splitmix64 — tiny public-domain PRNG step; fixed seed-derived plane
    * components make the signature replay-stable. */
  private def splitmix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 64 x MaxDim fixed hyperplane matrix, row-major, components uniform in
    * [-1, 1). An input of dim d uses the first d columns of each row, so
    * signatures are stable per dimension. */
  lazy val planes: Array[Double] = {
    val out = new Array[Double](64 * MaxDim)
    var r = 0
    while (r < 64) {
      var k = 0
      while (k < MaxDim) {
        out(r * MaxDim + k) =
          ((splitmix64((r.toLong << 32) | k) >>> 11) * math.pow(2, -53)) * 2.0 - 1.0
        k += 1
      }
      r += 1
    }
    out
  }
}
