package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two ARRAY<FLOAT> or two
  * ARRAY<DOUBLE> columns (both arguments the same element type).
  *
  * Value-identical to the higher-order-function formulation used by the
  * DuckDB oracles (Similarity.cosExpr): a single sequential left-to-right
  * double fold for the dot product and both norms, then
  * dot / (sqrt(nx) * sqrt(ny)) — every operation IEEE-deterministic, so
  * swapping this in changes no oracled value (floats are widened to double
  * before any arithmetic, exactly like CAST(x AS DOUBLE) in the HOF/oracle
  * spelling). The win over the HOF chain is execution cost: one fused
  * whole-stage-codegen loop over the unsafe array data instead of three
  * interpreted ArrayAggregate/ZipWith lambda towers per row (the briefing's
  * preference order: builtin > native Expression > UDF). Registered as SQL
  * function `graft_cosine` via [[graft.GraftExtensions]].
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  /** True when both inputs are ARRAY<FLOAT>; false for ARRAY<DOUBLE>. */
  private lazy val floatInput: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Static may-contain-null-elements bit: when both array types declare
    * containsNull=false (e.g. a transform over non-null inputs) the per-
    * element null branch is omitted from the generated loop entirely. */
  private lazy val elementsNullable: Boolean = Seq(left, right).exists(
    _.dataType match {
      case ArrayType(_, cn) => cn
      case _ => false
    })

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(FloatType, DoubleType).exists(et =>
      Seq(left, right).forall(_.dataType match {
        case ArrayType(`et`, _) => true
        case _ => false
      }))
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects two ARRAY<FLOAT> or two ARRAY<DOUBLE> " +
        s"arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  /** Nullable beyond input nulls: degenerate inputs (length mismatch,
    * zero-norm vector, a NULL array element) yield NULL rather than a
    * truncated fold, 0/0=NaN, or an unsafe-array garbage read — Spark and
    * DuckDB disagree on NaN handling downstream (e.g. Cast NaN->BIGINT is
    * 0 in Spark, an error in DuckDB), so NULL is the only cross-engine-safe
    * answer and matches the HOF/zip_with semantics (whose lambda arithmetic
    * also null-propagates a NULL element to the whole fold). */
  override def nullable: Boolean = true

  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (elementsNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (floatInput) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (floatInput) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val bad = ctx.freshName("bad")
      val get = if (floatInput) "getFloat" else "getDouble"
      val nullElemCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemCheck
         |    final double $xv = (double) $a.$get($i);
         |    final double $yv = (double) $b.$get($i);
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  if ($bad || $nx == 0.0 || $ny == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
