package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.CosineSimilarity

/** Engine extension point, installed with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (all of the
  * engine's session builders do). Currently injects one native function:
  *
  *  - `graft_cosine(a, b)` — codegen'd cosine similarity over float arrays
  *    ([[graft.expressions.CosineSimilarity]]), value-identical to the HOF
  *    formulation mirrored by the DuckDB oracles.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => CosineSimilarity(a, b)
        case other => throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "`graft_cosine`",
            "expectedNum" -> "2",
            "actualNum" -> other.size.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }))
  }
}
