package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, Cast, EqualTo, Expression, GreaterThanOrEqual, In, InSubquery, LessThanOrEqual, ListQuery, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, GlobalLimit, Join, LocalLimit, LocalRelation, LogicalPlan, Project, Sample, Sort, SubqueryAlias, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Snapshot
import graft.sources.GraftRelation

/** Optimizer rule: AUTOMATIC sideways information passing for
  * equi-joins over graft snapshot reads — the front-door spelling of
  * [[graft.ops.SipJoin]] (q169), firing with ZERO planning-time jobs.
  *
  * `SELECT … FROM fact f JOIN dim d ON f.k = d.k` over graft tables
  * scans every fact file under plain Spark: the keys that could prune
  * live in the dim's ROWS, invisible to static pushdown, and Spark's
  * own runtime filters (`InjectRuntimeFilter`) prune rows after the
  * scan, never files (its DPP fires only on partitioned catalog
  * tables). This rule closes the gap for the cases where the dim
  * side's key ENVELOPE is already known on the driver without running
  * anything:
  *
  *  - the dim subtree bottoms out in a [[LocalRelation]] (VALUES,
  *    `Seq(...).toDF`, a collected lookup): its rows are IN the plan,
  *    so up to [[SipJoinRule.InListMax]] distinct keys inject verbatim
  *    as `k IN (…)` (range + Bloom file candidacy), more inject as
  *    their [min,max] envelope, and an EMPTY dim injects `false` —
  *    Catalyst folds the join away;
  *  - the dim subtree bottoms out in another GRAFT relation whose key
  *    column carries EXACT value stamps (integral/date `colStats`,
  *    string `strStats`, or the clustering column's own file stamps —
  *    the q168 eligibility machinery, guards included): the manifest's
  *    min/max is a sound envelope for the dim's keys. Filters,
  *    projections, aggregates, limits etc. above the dim leaf only
  *    SHRINK its key set, so the leaf envelope stays a sound
  *    over-approximation — conservative when the dim is filtered hard
  *    (the verb, which summarizes actual rows, prunes tighter; use it
  *    when the dim is a 0.1% slice of its table).
  *
  * The summary becomes a REDUNDANT conjunct on the join-side key
  * expression, injected as a Filter that the existing pushdown moves
  * into the graft scan, where file candidacy acts on it at planning
  * time. Soundness by join type: the predicate only drops rows whose
  * key is provably absent from the other side, which inner joins drop
  * anyway; for one-sided joins only the NON-preserved side is pruned
  * (LeftOuter prunes right, RightOuter left, LeftSemi both — a
  * keyless left row has no match and is dropped by the semi itself,
  * LeftAnti right only — removing never-matching right rows preserves
  * every left row's match set). NULL keys never equi-match, so
  * dropping them is sound everywhere this fires; null-safe equality
  * (`<=>`) CAN match NULLs and is excluded. FullOuter prunes nothing.
  *
  * Injection targets only fact keys that reach an UNRESTRICTED graft
  * relation's own output (through attribute-preserving nodes) AND name
  * a column the manifest has something on (clustering stamps, sidecar
  * stats, or a Bloom sketch) — anywhere else the conjunct would be a
  * per-row tax with no file-skip payoff. Convergence: before
  * injecting, the rule checks the join side's existing Filter
  * conjuncts for a semantically equal predicate and skips it — the
  * fixed-point batch settles in one extra pass. Kill switch:
  * `spark.graft.sipRule.enabled=false` (SipRuleSpec A/Bs both settings
  * to identical answers).
  */
case class SipJoinRule(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  import SipJoinRule._

  private def enabled: Boolean =
    session.conf.get("spark.graft.sipRule.enabled", "true") == "true"

  /** Name equality under the session's case-sensitivity setting (the
    * analyzer's own resolver) — see MetadataOnlyCountRule.sameName:
    * under `spark.sql.caseSensitive=true` an unconditional
    * equalsIgnoreCase would route `K` to `k`'s stamps. */
  private def sameName(x: String, y: String): Boolean =
    session.sessionState.conf.resolver(x, y)

  /** (left prunable?, right prunable?) per join type — prune only the
    * side whose non-matching rows the join itself would drop. */
  private def prunable(jt: JoinType): (Boolean, Boolean) = jt match {
    case Inner      => (true, true)
    case LeftSemi   => (true, true)
    case LeftAnti   => (false, true)
    case LeftOuter  => (false, true)
    case RightOuter => (true, false)
    case _          => (false, false)
  }

  /** Bare attribute, or a widening integral cast of one (the shape
    * analyzer-coerced equi-keys take; order-preserving, so an envelope
    * on the cast value is an envelope on the attribute). */
  private def attrOf(e: Expression): Option[AttributeReference] = {
    def w(dt: DataType): Int = dt match {
      case ByteType => 1; case ShortType => 2
      case IntegerType => 3; case LongType => 4; case _ => 0
    }
    e match {
      case a: AttributeReference => Some(a)
      case Cast(a: AttributeReference, dt, _, _)
          if w(dt) > 0 && w(a.dataType) > 0 && w(dt) >= w(a.dataType) =>
        Some(a)
      case _ => None
    }
  }

  /** Nodes whose output rows' `a` values are a subset of their child's
    * (∪ NULL, which never equi-matches): safe to descend through when
    * tracing where a key attribute's VALUES can come from. */
  private def descends(p: LogicalPlan, a: Attribute): Option[LogicalPlan] =
    p match {
      case _: Project | _: Filter | _: Aggregate | _: Sort |
          _: GlobalLimit | _: LocalLimit | _: SubqueryAlias |
          _: Window | _: Sample | _: Generate =>
        val c = p.asInstanceOf[UnaryNode].child
        if (c.outputSet.contains(a)) Some(c) else None
      case j: Join =>
        if (j.left.outputSet.contains(a)) Some(j.left)
        else if (j.right.outputSet.contains(a)) Some(j.right)
        else None
      case _ => None
    }

  private def leafOf(plan: LogicalPlan, a: Attribute): Option[LogicalPlan] =
    plan match {
      case lr: LogicalRelation if lr.output.exists(_.exprId == a.exprId) =>
        Some(lr)
      case loc: LocalRelation if loc.output.exists(_.exprId == a.exprId) =>
        Some(loc)
      case p => descends(p, a).flatMap(leafOf(_, a))
    }

  // ------------------------------------------------------- dim side

  /** Internal-value ordering for the supported key dtypes (UTF8String
    * is binary order — the same order `strStats` stamps use). */
  private def lt(dt: DataType)(x: Any, y: Any): Boolean = dt match {
    case ByteType    => x.asInstanceOf[Byte] < y.asInstanceOf[Byte]
    case ShortType   => x.asInstanceOf[Short] < y.asInstanceOf[Short]
    case IntegerType | DateType =>
      x.asInstanceOf[Int] < y.asInstanceOf[Int]
    case LongType    => x.asInstanceOf[Long] < y.asInstanceOf[Long]
    case StringType  =>
      x.asInstanceOf[UTF8String].compareTo(y.asInstanceOf[UTF8String]) < 0
    case _ => throw new IllegalStateException(s"unordered dtype $dt")
  }

  private def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        StringType => true
    case _ => false
  }

  /** The dim key's summary from plan-time knowledge alone: exact rows
    * of a LocalRelation leaf, or the manifest's exact-value stamps of
    * a graft leaf (values in the ATTRIBUTE's dtype; the caller lifts
    * them through the key expression's widening cast if any). */
  private def dimSummary(plan: LogicalPlan, key: Expression)
      : Option[(AttributeReference, Summary)] =
    attrOf(key).filter(a => supported(a.dataType)).flatMap { a =>
      leafOf(plan, a).flatMap {
        case loc: LocalRelation =>
          val ord = loc.output.indexWhere(_.exprId == a.exprId)
          val vs = loc.data.iterator
            .map(_.get(ord, a.dataType)).filter(_ != null)
            .toSeq.distinct
          if (vs.isEmpty) Some(a -> EmptyKeys)
          else if (vs.size <= InListMax) Some(a -> Keys(vs))
          else {
            val o = lt(a.dataType) _
            Some(a -> Envelope(vs.reduce((x, y) => if (o(x, y)) x else y),
              vs.reduce((x, y) => if (o(x, y)) y else x)))
          }
        case lr: LogicalRelation => lr.relation match {
          case g: GraftRelation if !g.isRestricted =>
            val m = g.pinnedManifest
            val phys = Snapshot.physicalName(m, a.name)
            val cluster =
              sameName(a.name, Snapshot.logicalName(m, m.statsCol))
            a.dataType match {
              case ByteType | ShortType | IntegerType | LongType =>
                val mm =
                  if (cluster) Snapshot.clusteringMinMaxMeta(m)
                  else Snapshot.sidecarMinMaxMeta(m, phys)
                mm.map { case (lo, hi) =>
                  a -> Envelope(narrow(lo, a.dataType),
                    narrow(hi, a.dataType))
                }
              case DateType =>
                Snapshot.sidecarMinMaxMeta(m, phys).map { case (lo, hi) =>
                  a -> Envelope(lo.toInt, hi.toInt)
                }
              case StringType =>
                Snapshot.sidecarStrMinMaxMeta(m, phys).map {
                  case (lo, hi) =>
                    a -> Envelope(UTF8String.fromString(lo),
                      UTF8String.fromString(hi))
                }
              case _ => None
            }
          case _ => None
        }
        case _ => None
      }
    }

  private def narrow(v: Long, dt: DataType): Any = dt match {
    case ByteType    => v.toByte
    case ShortType   => v.toShort
    case IntegerType => v.toInt
    case _           => v
  }

  private def widen(v: Any, dt: DataType): Long = dt match {
    case ByteType    => v.asInstanceOf[Byte].toLong
    case ShortType   => v.asInstanceOf[Short].toLong
    case IntegerType => v.asInstanceOf[Int].toLong
    case LongType    => v.asInstanceOf[Long]
    case _ => throw new IllegalStateException(s"not integral: $dt")
  }

  private def rangeOf(dt: DataType): (Long, Long) = dt match {
    case ByteType    => (Byte.MinValue.toLong, Byte.MaxValue.toLong)
    case ShortType   => (Short.MinValue.toLong, Short.MaxValue.toLong)
    case IntegerType => (Int.MinValue.toLong, Int.MaxValue.toLong)
    case _           => (Long.MinValue, Long.MaxValue)
  }

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  // ------------------------------------------------------ fact side

  /** Does this key reach an unrestricted graft relation's own output,
    * naming a column the manifest can act on (clustering stamps,
    * sidecar stats, or a Bloom sketch)? Anything else would make the
    * injected conjunct a pure per-row tax. */
  private def factActionable(plan: LogicalPlan, key: Expression): Boolean =
    attrOf(key).exists { a =>
      leafOf(plan, a).exists {
        case lr: LogicalRelation => lr.relation match {
          case g: GraftRelation if !g.isRestricted =>
            val m = g.pinnedManifest
            val phys = Snapshot.physicalName(m, a.name)
            sameName(a.name,
              Snapshot.logicalName(m, m.statsCol)) ||
              m.colStats.keysIterator.exists(_._2 == phys) ||
              m.strStats.keysIterator.exists(_._2 == phys) ||
              m.blooms.keysIterator.exists(_._2 == phys)
          case _ => false
        }
        case _ => false
      }
    }

  // ------------------------------------------------------ injection

  /** The redundant conjunct(s) for one equi-pair, injected on the BARE
    * fact attribute with literals in ITS dtype (never on the coercion
    * cast — `UnwrapCastInBinaryComparison` would rewrite a cast-side
    * predicate and defeat the convergence guard). Dim values convert
    * across integral widths with bound-sound handling: an
    * unrepresentable IN value can match no fact row and drops; an
    * envelope bound clamps inward when trivial and contradicts when it
    * excludes the whole fact dtype. */
  private def predicatesFor(factAttr: AttributeReference,
                            dimAttr: AttributeReference,
                            s: Summary): Seq[Expression] = {
    val fdt = factAttr.dataType
    val ddt = dimAttr.dataType
    if (fdt != ddt && (!integral(fdt) || !integral(ddt))) return Nil
    val (fLo, fHi) = if (integral(fdt)) rangeOf(fdt) else (0L, 0L)
    // a single key injects as EqualTo directly — OptimizeIn rewrites a
    // 1-element IN to exactly that, which would defeat the convergence
    // guard's semantic-equality check
    def inList(lits: Seq[Literal]): Expression =
      if (lits.size == 1) EqualTo(factAttr, lits.head)
      else In(factAttr, lits)
    s match {
      case EmptyKeys => Seq(Literal.FalseLiteral)
      case Keys(vs) =>
        if (fdt == ddt)
          Seq(inList(vs.map(Literal(_, fdt))))
        else { // integral↔integral only (the analyzer coerces the rest)
          val fit = vs.map(widen(_, ddt)).filter(l => l >= fLo && l <= fHi)
          if (fit.isEmpty) Seq(Literal.FalseLiteral)
          else Seq(inList(fit.map(l => Literal(narrow(l, fdt), fdt))))
        }
      case Envelope(lo, hi) =>
        if (fdt == ddt)
          Seq(GreaterThanOrEqual(factAttr, Literal(lo, fdt)),
            LessThanOrEqual(factAttr, Literal(hi, fdt)))
        else {
          val (l, h) = (widen(lo, ddt), widen(hi, ddt))
          if (l > fHi || h < fLo) Seq(Literal.FalseLiteral)
          else Seq(
            GreaterThanOrEqual(factAttr,
              Literal(narrow(math.max(l, fLo), fdt), fdt)),
            LessThanOrEqual(factAttr,
              Literal(narrow(math.min(h, fHi), fdt), fdt)))
        }
    }
  }

  /** All Filter conjuncts already on the side (the convergence guard —
    * the fixed-point batch re-runs this rule after pushdown moves the
    * injected Filter, and a second copy must not land). */
  private def existingConjuncts(plan: LogicalPlan): Seq[Expression] =
    plan.collect { case Filter(c, _) => splitConjunctivePredicates(c) }
      .flatten

  /** Is `p` already present — verbatim, or as the `InSet` that
    * `OptimizeIn` rewrites a large injected IN-list into? */
  private def covered(existing: Seq[Expression], p: Expression): Boolean =
    existing.exists { e =>
      e.semanticEquals(p) || ((e, p) match {
        case (is: org.apache.spark.sql.catalyst.expressions.InSet,
            In(k, lits)) =>
          is.child.semanticEquals(k) &&
            lits.forall(_.isInstanceOf[Literal]) &&
            is.hset == lits.map(_.asInstanceOf[Literal].value).toSet
        case _ => false
      })
    }

  private def injectInto(side: LogicalPlan, other: LogicalPlan,
                         pairs: Seq[(Expression, Expression)])
      : Option[LogicalPlan] = {
    lazy val existing = existingConjuncts(side)
    val fresh0 = pairs.flatMap { case (sideKey, otherKey) =>
      attrOf(sideKey).toSeq.flatMap { factAttr =>
        if (!factActionable(side, sideKey)) Nil
        else dimSummary(other, otherKey).toSeq.flatMap { case (dimAttr, s) =>
          predicatesFor(factAttr, dimAttr, s)
        }
      }
    }.filterNot(covered(existing, _))
    // dedup within one injection (two pairs can derive the same bound)
    val fresh = fresh0.foldLeft(Seq.empty[Expression])((acc, p) =>
      if (acc.exists(_.semanticEquals(p))) acc else acc :+ p)
    if (fresh.isEmpty) None
    else Some(Filter(fresh.reduce(And), side))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      // `key IN (SELECT dk FROM dim)` BEFORE its semi-join rewrite —
      // RewritePredicateSubquery runs in a later batch than injected
      // operator rules, so the join case below never sees it. Same
      // soundness: a row whose key is outside the subquery's envelope
      // fails the IN (false or NULL — the filter drops both), so the
      // envelope conjunct drops exactly rows the filter already drops.
      // Positive top-level conjuncts only: `NOT IN` keeps non-matching
      // rows and must never prune.
      case f @ Filter(cond, child)
          if cond.exists(_.isInstanceOf[InSubquery]) =>
        val conjs = splitConjunctivePredicates(cond)
        lazy val existing = conjs ++ existingConjuncts(child)
        val fresh0 = conjs.collect {
          case InSubquery(Seq(k), lq: ListQuery)
              if lq.plan.output.size == 1 && factActionable(child, k) =>
            attrOf(k).toSeq.flatMap { factAttr =>
              dimSummary(lq.plan, lq.plan.output.head).toSeq.flatMap {
                case (dimAttr, s) => predicatesFor(factAttr, dimAttr, s)
              }
            }
        }.flatten.filterNot(covered(existing, _))
        val fresh = fresh0.foldLeft(Seq.empty[Expression])((acc, p) =>
          if (acc.exists(_.semanticEquals(p))) acc else acc :+ p)
        if (fresh.isEmpty) f
        else f.copy(condition = (fresh :+ cond).reduce(And))
      case j @ Join(left, right, jt, Some(cond), _) =>
        val (pl, pr) = prunable(jt)
        if (!pl && !pr) j
        else {
          // equi-pairs: strict equality only (<=> can match NULLs the
          // envelope ignores), each side referencing one input exactly
          val pairs = splitConjunctivePredicates(cond).collect {
            case EqualTo(l, r)
                if l.references.subsetOf(left.outputSet) &&
                  r.references.subsetOf(right.outputSet) => (l, r)
            case EqualTo(l, r)
                if r.references.subsetOf(left.outputSet) &&
                  l.references.subsetOf(right.outputSet) => (r, l)
          }
          if (pairs.isEmpty) j
          else {
            val newLeft =
              if (pl) injectInto(left, right, pairs) else None
            val newRight =
              if (pr) injectInto(right, left, pairs.map(_.swap)) else None
            if (newLeft.isEmpty && newRight.isEmpty) j
            else j.copy(left = newLeft.getOrElse(left),
              right = newRight.getOrElse(right))
          }
        }
    }
  }
}

object SipJoinRule {
  /** Above this many distinct LocalRelation keys the verbatim IN-list
    * gives way to the [min,max] envelope — bounds plan size and the
    * driver's per-file Bloom-probe work. */
  val InListMax = 256

  private[plans] sealed trait Summary
  private[plans] case object EmptyKeys extends Summary
  private[plans] final case class Keys(vs: Seq[Any]) extends Summary
  private[plans] final case class Envelope(lo: Any, hi: Any) extends Summary
}
