package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** The second `private[sql]` doorway the SQL DML rewrites need: turning
  * an analyzer-resolved catalyst [[Expression]] back into a user-level
  * [[Column]] so it can be applied to a DIFFERENT DataFrame (the COW
  * rewrite's fresh read of the touched files). Resolved
  * [[AttributeReference]]s carry exprIds scoped to the ORIGINAL plan —
  * applied verbatim to another plan they fail resolution — so they are
  * first rewound to name-based [[UnresolvedAttribute]]s (quoted, so a
  * dotted column name stays one name), which re-resolve against
  * whatever frame the Column lands on. Same posture as
  * [[StreamingFrame]]: narrow methods, one purpose each. */
object ExprColumn {
  /** Wrap `e` with every attribute rewound to its bare name. */
  def reresolving(e: Expression): Column =
    ExpressionUtils.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  /** Wrap `e` verbatim — the caller has already rewritten attributes
    * (the MERGE rewrite maps target/source attrs to disambiguated
    * names itself, by exprId membership). */
  def of(e: Expression): Column = ExpressionUtils.column(e)

  /** Execute an analyzer-resolved plan as a DataFrame —
    * `Dataset.ofRows`'s job, needed to run a MERGE's source query
    * inside the command. */
  def frameOf(session: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
