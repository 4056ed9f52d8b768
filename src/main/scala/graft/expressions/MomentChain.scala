package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, Decimal, DoubleType}

/** The exact big-integer central-moment chain, as an expression:
  * m2 = (n·Σx² − (Σx)²).toDouble / n — BYTE-IDENTICAL to the
  * driver-side fold the full-metadata variance serve runs
  * (`metaMomentEval`: BigInt difference, ONE double conversion, one
  * division), so the kind-7 HYBRID merge can union stamped and
  * scanned exact integer moments and still produce the same
  * deterministic m2 the pure-stamp arm produces. Inputs: (n LONG
  * non-null count, Σx DECIMAL(38,0), Σx² DECIMAL(38,0)) — the caller
  * guarantees exactness (every scanned file carries an `sq:` stamp,
  * whose per-row try_multiply gate proves |x| ≤ ~3.04e9, so the
  * decimal partials are exact integers). n == 0 answers the driver
  * chain's 0.0 — the aggregate's own evaluation turns it into its
  * n==0 contract (NULL). Evaluated once per merged result row, never
  * in a per-input loop — interpreted eval (CodegenFallback) is fine. */
case class MomentM2(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_moment_m2"

  override def nullSafeEval(nV: Any, sxV: Any, sqV: Any): Any = {
    val n = nV.asInstanceOf[Long]
    if (n == 0L) 0.0
    else {
      val sx = BigInt(sxV.asInstanceOf[Decimal]
        .toJavaBigDecimal.toBigIntegerExact)
      val sq = BigInt(sqV.asInstanceOf[Decimal]
        .toJavaBigDecimal.toBigIntegerExact)
      val d = BigInt(n) * sq - sx * sx
      d.toDouble / n.toDouble
    }
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): MomentM2 =
    copy(first = f, second = s, third = t)
}
