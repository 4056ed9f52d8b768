package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.classic.ExpressionUtils

/** The second `private[sql]` doorway the SQL DML rewrites need: turning
  * an analyzer-resolved catalyst [[Expression]] back into a user-level
  * [[Column]] so it can be applied to a DIFFERENT DataFrame (the COW
  * rewrite's fresh read of the touched files). Resolved
  * [[AttributeReference]]s carry exprIds scoped to the ORIGINAL plan —
  * applied verbatim to another plan they fail resolution — so they are
  * first rewound to name-based [[UnresolvedAttribute]]s, which re-resolve
  * against whatever frame the Column lands on. One method, one purpose,
  * same posture as [[StreamingFrame]]. */
object ExprColumn {
  def reresolving(e: Expression): Column =
    ExpressionUtils.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute(a.name)
    })
}
