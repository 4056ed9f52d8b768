package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftshim.ExprColumn
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.ops.Snapshot

/** SQL `DELETE FROM` / `UPDATE` on registered snapshot tables, rewritten
  * by [[SnapshotTimeTravelRule]] into these execution-time commands (the
  * same discipline as the INSERT rewrite: ANALYSIS stays side-effect
  * free — EXPLAIN never mutates). Each command re-resolves the current
  * version when it RUNS and lands through the narrow COW verbs
  * ([[Snapshot.deleteWhere]] / [[Snapshot.updateWhere]]): the
  * clustering-column bounds implied by the WHERE clause are extracted
  * driver-side ([[GraftDml.boundsOn]]) so only stats-overlapping files
  * rewrite — a keyed SQL DELETE at 100 TB costs the touched files, and
  * a WHERE with no extractable bounds degrades honestly to a full COW
  * rewrite (correct, never silent). Each returns one row with the
  * committed version — the feedback a DML statement owes its caller. */
final case class GraftDeleteCommand(dir: String, cond: Expression)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    GraftDml.versionOutput
  override def run(session: SparkSession): Seq[Row] = {
    val m0 = Snapshot.manifest(session, dir,
      Snapshot.currentVersion(session, dir))
    // the WHERE clause speaks LOGICAL names; the verbs' [lo,hi] window
    // is on the clustering column under either name
    val statsCol = Snapshot.logicalName(m0, m0.statsCol)
    val (lo, hi) = GraftDml.boundsOn(statsCol, Some(cond))
    val residual = ExprColumn.reresolving(cond)
    // spark.graft.deletionVectors=true routes through the merge-on-read
    // verb (Delta's enableDeletionVectors): scattered deletes cost a
    // manifest publish; the verb itself falls back to COW above its
    // position bound, so the switch never changes an answer
    val v =
      if (GraftDml.dvEnabled(session))
        Snapshot.deleteWhereDV(session, dir, lo, hi, residual)
      else Snapshot.deleteWhere(session, dir, lo, hi, residual)
    Seq(Row(v.toLong))
  }
}

final case class GraftUpdateCommand(dir: String, set: Seq[(String, Expression)],
                                    cond: Option[Expression])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    GraftDml.versionOutput
  override def run(session: SparkSession): Seq[Row] = {
    val m0 = Snapshot.manifest(session, dir,
      Snapshot.currentVersion(session, dir))
    // the WHERE clause speaks LOGICAL names; the verbs' [lo,hi] window
    // is on the clustering column under either name
    val statsCol = Snapshot.logicalName(m0, m0.statsCol)
    val (lo, hi) = GraftDml.boundsOn(statsCol, cond)
    val setCols = set.map { case (n, e) => n -> ExprColumn.reresolving(e) }.toMap
    val residual = cond.map(ExprColumn.reresolving).getOrElse(lit(true))
    val v =
      if (GraftDml.dvEnabled(session))
        Snapshot.updateWhereDV(session, dir, lo, hi, setCols, residual)
      else Snapshot.updateWhere(session, dir, lo, hi, setCols, residual)
    Seq(Row(v.toLong))
  }
}

private[plans] object GraftDml {
  /** `SET spark.graft.deletionVectors=true` flips SQL DELETE/UPDATE to
    * the merge-on-read verbs — read at RUN time, per statement, so a
    * session can mix disciplines (bulk purge COW, scattered fix MoR). */
  def dvEnabled(session: SparkSession): Boolean =
    session.conf.getOption("spark.graft.deletionVectors")
      .exists(_.equalsIgnoreCase("true"))

  def versionOutput: Seq[Attribute] =
    StructType(Seq(StructField("version", LongType, nullable = false)))
      .toAttributes_

  // DataTypeUtils.toAttributes moved around across Spark versions; the
  // two-liner is stable and dependency-free
  implicit final class StructOps(private val s: StructType) extends AnyVal {
    def toAttributes_ : Seq[Attribute] =
      s.fields.toIndexedSeq.map(f =>
        AttributeReference(f.name, f.dataType, f.nullable)())
  }

  /** The clustering-column [lo, hi] window a WHERE clause IMPLIES — the
    * file-selection handle for the COW verbs. Conservative by
    * construction: only top-level conjuncts tighten the window
    * (anything under OR/NOT is ignored), a literal-less or non-integral
    * comparison contributes nothing, and the fallback window is
    * all-files. The residual predicate is always applied in full, so
    * extraction affects COST, never the answer. */
  def boundsOn(statsCol: String, cond: Option[Expression]): (Long, Long) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    def asLong(l: Literal): Option[Long] = l.value match {
      case b: Byte  => Some(b.toLong)
      case s: Short => Some(s.toLong)
      case i: Int   => Some(i.toLong)
      case x: Long  => Some(x)
      case _        => None
    }
    def name(e: Expression): Option[String] = e match {
      case a: AttributeReference if a.name.equalsIgnoreCase(statsCol) =>
        Some(a.name)
      case _ => None
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x         => Seq(x)
    }
    cond.toSeq.flatMap(conjuncts).foreach {
      case EqualTo(a, l: Literal) if name(a).isDefined =>
        asLong(l).foreach { v => lo = math.max(lo, v); hi = math.min(hi, v) }
      case EqualTo(l: Literal, a) if name(a).isDefined =>
        asLong(l).foreach { v => lo = math.max(lo, v); hi = math.min(hi, v) }
      case GreaterThan(a, l: Literal) if name(a).isDefined =>
        asLong(l).foreach(v => lo = math.max(lo,
          if (v == Long.MaxValue) v else v + 1))
      case GreaterThanOrEqual(a, l: Literal) if name(a).isDefined =>
        asLong(l).foreach(v => lo = math.max(lo, v))
      case LessThan(a, l: Literal) if name(a).isDefined =>
        asLong(l).foreach(v => hi = math.min(hi,
          if (v == Long.MinValue) v else v - 1))
      case LessThanOrEqual(a, l: Literal) if name(a).isDefined =>
        asLong(l).foreach(v => hi = math.min(hi, v))
      // flipped literal-first comparisons: `5 < k` tightens lo, etc.
      case GreaterThan(l: Literal, a) if name(a).isDefined =>
        asLong(l).foreach(v => hi = math.min(hi,
          if (v == Long.MinValue) v else v - 1))
      case GreaterThanOrEqual(l: Literal, a) if name(a).isDefined =>
        asLong(l).foreach(v => hi = math.min(hi, v))
      case LessThan(l: Literal, a) if name(a).isDefined =>
        asLong(l).foreach(v => lo = math.max(lo,
          if (v == Long.MaxValue) v else v + 1))
      case LessThanOrEqual(l: Literal, a) if name(a).isDefined =>
        asLong(l).foreach(v => lo = math.max(lo, v))
      case In(a, vs) if name(a).isDefined &&
          vs.forall(_.isInstanceOf[Literal]) =>
        val ks = vs.collect { case l: Literal => asLong(l) }.flatten
        if (ks.nonEmpty && ks.length == vs.length) {
          lo = math.max(lo, ks.min); hi = math.min(hi, ks.max)
        }
      case _ => ()
    }
    (lo, hi)
  }
}
