package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, Attribute, AttributeReference, Cast, Coalesce, Divide, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, If, IsNotNull, LessThan, LessThanOrEqual, Literal, Multiply, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, CentralMomentAgg, Complete, Count, DeclarativeAggregate, HyperLogLogPlusPlus, Max, Min, StddevPop, StddevSamp, Sum, VariancePop, VarianceSamp}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{ByteType, DataType, DecimalType, DoubleType, IntegerType, LongType, ShortType}

import graft.ops.Snapshot
import graft.sources.GraftRelation

/** Optimizer rule: METADATA-ONLY aggregates over graft snapshot reads —
  * Delta's metadata-only query optimization
  * (`OptimizeMetadataOnlyQuery` / numRecords), re-expressed as a
  * Catalyst `Rule[LogicalPlan]` injected through
  * [[graft.GraftExtensions]]. Three rewrites, each firing ONLY when it
  * is provably the same answer:
  *
  * '''1. Global unfiltered COUNT(*)''' (round 16).
  * `spark.read.format("graft").load(dir).count()` on a 100 TB table
  * becomes one `LocalRelation` row built from Σ per-file row stamps −
  * Σ deletion-vector positions: zero tasks, zero bytes of data I/O.
  * Guards: the aggregate is global (no grouping) and every output is a
  * non-distinct, unfiltered `count(<non-null literal>)` — the
  * `count(*)` / `count(1)` family (`count(col)` is null-sensitive and
  * never rewrites); the child is the relation under Project nodes only
  * (projections cannot change cardinality); every file carries a row
  * stamp ([[GraftRelation.metaRowCount]] is Some) — unknown is never
  * zero, pre-stamp and adopted tables keep scanning.
  *
  * '''2. Clustering-range-filtered COUNT(*)''' (round 17).
  * `count(*) WHERE key BETWEEN lo AND hi` on the CLUSTERING column
  * splits the manifest's files by [[Snapshot.metaRangeSplit]]: files
  * WHOLLY inside [lo,hi] sum from stamps (row count − DV positions;
  * exact only under a stamped ZERO clustering-key null count — the
  * [min,max] stamps ignore NULLs, which fail the predicate), files
  * merely OVERLAPPING the range become a boundary relation restricted
  * to exactly those files and scan with the predicate, and files
  * wholly outside contribute nothing. On a range-clustered 100 TB
  * table that is one or two boundary files per bound instead of the
  * range's interior. Guards: every filter conjunct is a comparison of
  * the clustering attribute against an integral literal (or
  * `IsNotNull(key)`); anything else — other columns, casts of other
  * shapes, disjunctions, non-literal bounds — refuses. Unknown rows,
  * unknown null counts, DVs and adopted entries never refuse: they
  * just degrade the file into the boundary SCAN set, which is always
  * exact. A contradictory range (`lo > hi`) answers 0 — proven by the
  * predicate itself, independent of any stamp.
  *
  * '''3. Global unfiltered MIN/MAX of the clustering column'''
  * (round 17). `min(key)` / `max(key)` (mixed freely with count-star
  * outputs) answer from pure manifest arithmetic — min of file mins /
  * max of file maxes — when [[Snapshot.clusteringMinMaxMeta]] can
  * prove the stamps exact: no deletion vectors anywhere (a DV may
  * have masked the extreme row), every file's row count stamped
  * positive (an adopted empty file would stamp phantom extremes), no
  * degraded full-open stamp. NULL keys are harmless: SQL MIN/MAX and
  * the stamps both ignore them. Widening integral casts of the key
  * commute with MIN/MAX and are accepted.
  *
  * All three rewrites reuse the Aggregate's own output attributes (or
  * alias onto its exprIds), so downstream references resolve
  * unchanged; time travel is free in each — the relation pins its
  * version's manifest, so a `VERSION AS OF` aggregate answers from
  * that version's stamps. Boundary relations are marked restricted
  * and are never themselves rewritten (convergence + soundness). */
case class MetadataOnlyCountRule(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  /** A non-distinct, unfiltered count of a non-null literal — the
    * shapes whose value is exactly the child's row count. */
  private def isCountStar(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) =>
      ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty &&
        (ae.aggregateFunction match {
          case Count(Seq(Literal(v, _))) => v != null
          case _ => false
        })
    case _ => false
  }

  /** A constant output (`SELECT 'x' AS phase, count(*) …`):
    * CollapseProject folds the phase/label projections every real
    * report wraps around an aggregate INTO the Aggregate itself, so
    * the rewrites must carry literal outputs through or they refuse
    * exactly the queries they were built for (round 19 — found when
    * the variance serve exposed that the registered metadata queries
    * were scanning). ConstantFolding has already run, so any foldable
    * constant arrives as a plain Literal. */
  private def litOf(e: NamedExpression): Option[Literal] = e match {
    case Alias(l: Literal, _) => Some(l)
    case _ => None
  }

  /** The graft relation under cardinality-preserving Project nodes
    * only — restricted (boundary) relations excluded. */
  private def relationOf(plan: LogicalPlan)
      : Option[(LogicalRelation, GraftRelation)] = plan match {
    case Project(_, child) => relationOf(child)
    case lr: LogicalRelation => lr.relation match {
      case g: GraftRelation if !g.isRestricted => Some((lr, g))
      case _ => None
    }
    case _ => None
  }

  private def metaCountOf(plan: LogicalPlan): Option[Long] =
    relationOf(plan).flatMap(_._2.metaRowCount)

  /** The key expression shapes MIN/MAX/compare may wrap the clustering
    * attribute in: bare, or a WIDENING integral cast (order-preserving
    * and exactly representable, so it commutes with min/max and with
    * range bounds). */
  private def keyAttrOf(e: Expression): Option[AttributeReference] = {
    def width(dt: DataType): Int = dt match {
      case ByteType => 1; case ShortType => 2
      case IntegerType => 3; case LongType => 4; case _ => 0
    }
    e match {
      case a: AttributeReference => Some(a)
      case Cast(a: AttributeReference, dt, _, _)
          if width(dt) > 0 && width(a.dataType) > 0 &&
            width(dt) >= width(a.dataType) => Some(a)
      case _ => None
    }
  }

  /** Name equality under the SESSION's case-sensitivity setting — the
    * same resolver Spark's analyzer used to bind these attributes. An
    * unconditional equalsIgnoreCase would, under
    * `spark.sql.caseSensitive=true`, route a column differing from the
    * clustering column only in case (`K` vs `k`) to the WRONG column's
    * stamps — wrong, not degraded, answers. */
  private def sameName(x: String, y: String): Boolean =
    session.sessionState.conf.resolver(x, y)

  /** Does `a` name the relation's clustering column (logical name —
    * column mapping translates) AND come from this relation? */
  private def isClusteringAttr(a: AttributeReference,
      lr: LogicalRelation, g: GraftRelation): Boolean = {
    val m = g.pinnedManifest
    lr.output.exists(_.exprId == a.exprId) &&
      sameName(a.name, Snapshot.logicalName(m, m.statsCol))
  }

  private def asLongLit(e: Expression): Option[Long] = e match {
    case Literal(v, dt) if v != null => dt match {
      case ByteType    => Some(v.asInstanceOf[Byte].toLong)
      case ShortType   => Some(v.asInstanceOf[Short].toLong)
      case IntegerType => Some(v.asInstanceOf[Int].toLong)
      case LongType    => Some(v.asInstanceOf[Long])
      case _ => None
    }
    case _ => None
  }

  /** Fold the filter's conjuncts into one inclusive [lo, hi] window on
    * the clustering attribute. None = a conjunct we cannot prove
    * (wrong column, non-literal, disjunction, …) → no rewrite. A
    * returned lo > hi is a CONTRADICTION: zero rows satisfy. Strict
    * bounds saturate instead of wrapping (`key > Long.MaxValue`
    * becomes the contradiction, which is the correct answer). */
  private def boundsOf(conjuncts: Seq[Expression],
      lr: LogicalRelation, g: GraftRelation): Option[(Long, Long)] = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    def key(e: Expression): Boolean =
      keyAttrOf(e).exists(isClusteringAttr(_, lr, g))
    def tighten(nLo: Option[Long], nHi: Option[Long]): Boolean = {
      nLo.foreach(v => lo = math.max(lo, v))
      nHi.foreach(v => hi = math.min(hi, v))
      true
    }
    val ok = conjuncts.forall {
      case IsNotNull(a) if key(a) => true // counted rows are non-null anyway
      case EqualTo(a, l) if key(a) =>
        asLongLit(l).exists(v => tighten(Some(v), Some(v)))
      case EqualTo(l, a) if key(a) =>
        asLongLit(l).exists(v => tighten(Some(v), Some(v)))
      case GreaterThanOrEqual(a, l) if key(a) =>
        asLongLit(l).exists(v => tighten(Some(v), None))
      case LessThanOrEqual(a, l) if key(a) =>
        asLongLit(l).exists(v => tighten(None, Some(v)))
      case GreaterThan(a, l) if key(a) =>
        asLongLit(l).exists(v => tighten(
          Some(if (v == Long.MaxValue) { hi = Long.MinValue; v }
          else v + 1), None))
      case LessThan(a, l) if key(a) =>
        asLongLit(l).exists(v => tighten(None,
          Some(if (v == Long.MinValue) { lo = Long.MaxValue; v }
          else v - 1)))
      // literal-first spellings mirror to the attribute-first ones
      case GreaterThanOrEqual(l, a) if key(a) =>
        asLongLit(l).exists(v => tighten(None, Some(v)))
      case LessThanOrEqual(l, a) if key(a) =>
        asLongLit(l).exists(v => tighten(Some(v), None))
      case GreaterThan(l, a) if key(a) => // lit > key ≡ key < lit
        asLongLit(l).exists(v => tighten(None,
          Some(if (v == Long.MinValue) { lo = Long.MaxValue; v }
          else v - 1)))
      case LessThan(l, a) if key(a) => // lit < key ≡ key > lit
        asLongLit(l).exists(v => tighten(
          Some(if (v == Long.MaxValue) { hi = Long.MinValue; v }
          else v + 1), None))
      case _ => false
    }
    if (ok) Some((lo, hi)) else None
  }

  /** The Filter directly under cardinality-preserving Projects, with
    * the relation under attribute-only Projects below it (so the
    * filter's attributes ARE relation outputs, not derived aliases). */
  private def filteredRelationOf(plan: LogicalPlan)
      : Option[(Filter, LogicalRelation, GraftRelation)] = plan match {
    case Project(_, child) => filteredRelationOf(child)
    case f @ Filter(_, fchild) =>
      def under(p: LogicalPlan): Option[(LogicalRelation, GraftRelation)] =
        p match {
          case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
            under(c)
          case lr: LogicalRelation => lr.relation match {
            case g: GraftRelation if !g.isRestricted => Some((lr, g))
            case _ => None
          }
          case _ => None
        }
      under(fchild).map { case (lr, g) => (f, lr, g) }
    case _ => None
  }

  private def countRows(exprs: Seq[NamedExpression],
      output: Seq[Attribute], n: Long): LocalRelation =
    LocalRelation(output,
      Seq(InternalRow.fromSeq(exprs.map(e =>
        litOf(e).map(_.value).getOrElse(n: Any)))))

  /** Range-filtered count rewrite: stamps for wholly-inside files, a
    * boundary-restricted scan for the rest. None = shape/guards refuse. */
  private def filteredCountRewrite(agg: Aggregate): Option[LogicalPlan] =
    filteredRelationOf(agg.child).flatMap { case (f, lr, g) =>
      boundsOf(splitConjunctivePredicates(f.condition), lr, g).flatMap {
        case (lo, hi) if lo > hi =>
          // contradiction: zero rows satisfy, by the predicate alone
          Some(countRows(agg.aggregateExpressions, agg.output, 0L))
        case (lo, hi) =>
          val m = g.pinnedManifest
          val (inside, boundary) = Snapshot.metaRangeSplit(m, lo, hi)
          if (boundary.isEmpty)
            Some(countRows(agg.aggregateExpressions, agg.output, inside))
          else if (inside == 0 && boundary.size == m.files.size)
            None // nothing answered from metadata: keep the plain scan
          else {
            val cnt = Alias(AggregateExpression(
              Count(Seq(Literal(1L))), Complete, isDistinct = false),
              "gm_boundary_cnt")()
            val newChild = agg.child.transformUp {
              case l: LogicalRelation if l eq lr =>
                l.copy(relation =
                  g.restrictedTo(boundary.map(_.path).toSet))
            }
            val inner = Aggregate(Nil, Seq(cnt), newChild)
            val outs = agg.aggregateExpressions.zip(agg.output).map {
              case (e, a) => litOf(e) match {
                case Some(l) => Alias(l, a.name)(exprId = a.exprId)
                case None => Alias(Add(cnt.toAttribute, Literal(inside)),
                  a.name)(exprId = a.exprId)
              }
            }
            Some(Project(outs, inner))
          }
      }
    }

  /** min/max/count-star mix over the unfiltered relation → one
    * LocalRelation row from manifest arithmetic. The clustering column
    * answers from the FileEntry stamps; any OTHER stamped column
    * answers from its sidecar stamps when (and only when) the stamp
    * kind is an exact value — integral (raw longs), DATE (epoch days)
    * and STRING (full values under UTF-8 byte order, Spark's own);
    * timestamp and decimal/double stamps are truncated/saturated and
    * refuse by dtype. None = guards refuse (scan answers). */
  private def minMaxRewrite(agg: Aggregate): Option[LogicalPlan] =
    relationOf(agg.child).flatMap { case (lr, g) =>
      val m = g.pinnedManifest
      val clusterName = Snapshot.logicalName(m, m.statsCol)
      lazy val clusterMeta = Snapshot.clusteringMinMaxMeta(m)
      val longMeta =
        scala.collection.mutable.Map.empty[String, Option[(Long, Long)]]
      val strMeta =
        scala.collection.mutable.Map.empty[String,
          Option[(String, String)]]
      def typedLong(v: Long, dt: DataType): Option[Any] = dt match {
        case LongType    => Some(v)
        case IntegerType => Some(v.toInt)
        case ShortType   => Some(v.toShort)
        case ByteType    => Some(v.toByte)
        case _           => None
      }
      def boundOf(c: Expression, outDt: DataType,
                  isMin: Boolean): Option[Any] =
        keyAttrOf(c).flatMap { a =>
          if (!lr.output.exists(_.exprId == a.exprId)) None
          else if (sameName(a.name, clusterName))
            clusterMeta.flatMap(p =>
              typedLong(if (isMin) p._1 else p._2, outDt))
          else {
            val phys = Snapshot.physicalName(m, a.name)
            a.dataType match {
              case ByteType | ShortType | IntegerType | LongType =>
                longMeta.getOrElseUpdate(phys,
                  Snapshot.sidecarMinMaxMeta(m, phys))
                  .flatMap(p =>
                    typedLong(if (isMin) p._1 else p._2, outDt))
              case org.apache.spark.sql.types.DateType
                  if outDt == org.apache.spark.sql.types.DateType =>
                longMeta.getOrElseUpdate(phys,
                  Snapshot.sidecarMinMaxMeta(m, phys))
                  .map(p => (if (isMin) p._1 else p._2).toInt)
              case org.apache.spark.sql.types.StringType
                  if outDt == org.apache.spark.sql.types.StringType =>
                strMeta.getOrElseUpdate(phys,
                  Snapshot.sidecarStrMinMaxMeta(m, phys))
                  .map(p =>
                    org.apache.spark.unsafe.types.UTF8String
                      .fromString(if (isMin) p._1 else p._2))
              case _ => None
            }
          }
        }
      def minMaxValueOf(e: NamedExpression): Option[Any] = e match {
        case al @ Alias(ae: AggregateExpression, _)
            if ae.mode == Complete && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case Min(c) => boundOf(c, al.dataType, isMin = true)
            case Max(c) => boundOf(c, al.dataType, isMin = false)
            // '''6. Global SUM from per-file sum stamps''' (round 18)
            // — full-metadata arm only (every file stamped or provably
            // all-NULL; the partial/hybrid arm is [[sumRewrite]]).
            // Some(null) is the honest SQL answer for an all-NULL
            // column, distinct from None = refuse.
            case Sum(c, _) if !ae.isDistinct =>
              sumAttrOf(c, lr, g).flatMap { a =>
                sumCodecOf(a).filter(_._1 == al.dataType)
                  .flatMap { case (_, dec) =>
                    val (total, any, scan) = Snapshot.metaSumSplitCol(m,
                      Snapshot.physicalName(m, a.name))
                    if (scan.nonEmpty) None
                    else if (!any) Some(null: Any)
                    else dec(total)
                  }
              }
            case _      => None
          }
        case _ => None
      }
      val exprs = agg.aggregateExpressions
      val isCnt = exprs.map(isCountStar)
      if (!exprs.indices.exists(i => !isCnt(i))) None // pure counts: above
      else {
        lazy val nOpt = g.metaRowCount
        val vals = exprs.indices.map { i =>
          if (isCnt(i)) nOpt.map(n => n: Any)
          else litOf(exprs(i)).map(l => Some(l.value))
            .getOrElse(minMaxValueOf(exprs(i)))
        }
        if (vals.exists(_.isEmpty)) None
        else Some(LocalRelation(agg.output,
          Seq(InternalRow.fromSeq(vals.map(_.get)))))
      }
    }

  /** Is `e` the grouped key column itself (bare or trivially
    * aliased) — the output shapes whose per-group value IS the group. */
  private def isKeyOutput(e: NamedExpression,
                          g: AttributeReference): Boolean = e match {
    case a: AttributeReference      => a.exprId == g.exprId
    case Alias(a: AttributeReference, _) => a.exprId == g.exprId
    case _ => false
  }

  /** '''4. GROUP BY the clustering column, counting''' (round 17 —
    * Delta's `OptimizeMetadataOnlyQuery` partition-value analog on
    * range stamps). `SELECT key[, count(*)…] GROUP BY key` answers
    * per-group sums from [[Snapshot.metaGroupSplit]]'s stamp
    * arithmetic for SINGLE-VALUED files (min == max: a
    * partition-value-clustered table — ingest-date bands, tenant
    * shards, status codes — is all such files), while mixed-value,
    * DV-ambiguous or unstamped files degrade into one
    * boundary-restricted grouped scan merged by a final aggregate.
    * A clustering-range FILTER below the grouping ("rows per day for
    * the last week") composes: wholly-outside files drop by stamps
    * alone, NULL keys are excluded (they fail any range predicate),
    * a contradictory range answers zero groups, and the scan branch
    * keeps the predicate. None = guards refuse (non-integral key,
    * unprovable filter conjuncts, every file degraded). */
  /** Eligible grouped-count dtype: integral always; DATE for
    * NON-clustering columns (epoch-day `colStats` stamps are exact and
    * its internal representation is the stamped Int — the clustering
    * column is integral by the stats contract). Timestamp/decimal
    * stamps are truncated/saturated and never single-value-exact. */
  private def groupableDtype(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case org.apache.spark.sql.types.DateType => true
    case _ => false
  }

  private def typedKey(v: Long, dt: DataType): Any = dt match {
    case LongType    => v
    case IntegerType => v.toInt
    case ShortType   => v.toShort
    case ByteType    => v.toByte
    case org.apache.spark.sql.types.DateType => v.toInt
  }

  /** The grouped stamp split for `a` — the clustering column reads the
    * `FileEntry` stamps ([[Snapshot.metaGroupSplit]]), any other
    * exactly-stamped column its `colStats` + null-witness sidecars
    * ([[Snapshot.metaGroupSplitCol]], round 17). */
  private def groupSplitOf(gr: GraftRelation, a: AttributeReference)
      : (Map[Option[Long], Long], Seq[Snapshot.FileEntry]) = {
    val m = gr.pinnedManifest
    if (sameName(a.name, Snapshot.logicalName(m, m.statsCol)))
      Snapshot.metaGroupSplit(m)
    else
      Snapshot.metaGroupSplitCol(m, Snapshot.physicalName(m, a.name))
  }

  private def groupedCountRewrite(agg: Aggregate,
      g: AttributeReference): Option[LogicalPlan] = {
    val unfiltered = relationOf(agg.child)
      .map(r => (r, None: Option[(Long, Long)]))
    def filtered = filteredRelationOf(agg.child).flatMap {
      case (f, lr, gr) =>
        boundsOf(splitConjunctivePredicates(f.condition), lr, gr)
          .map(b => ((lr, gr), Some(b): Option[(Long, Long)]))
    }
    unfiltered.orElse(filtered).flatMap { case ((lr, gr), bounds) =>
      if (!groupableDtype(g.dataType) ||
          !lr.output.exists(_.exprId == g.exprId) ||
          // a range FILTER composes only when the grouped column IS the
          // clustering column (the bounds and the grouping must speak
          // about the same stamps)
          (bounds.isDefined && !isClusteringAttr(g, lr, gr))) None
      else if (bounds.exists(b => b._1 > b._2))
        // contradictory range: zero rows, hence zero groups
        Some(LocalRelation(agg.output, Nil))
      else {
        def typed(v: Long): Any = typedKey(v, g.dataType)
        val m = gr.pinnedManifest
        val (sums, scan) = bounds match {
          case Some((lo, hi)) =>
            Snapshot.metaGroupSplit(m, lo, hi, nullsPass = false)
          case None => groupSplitOf(gr, g)
        }
        if (scan.size == m.files.size) None // nothing proven: plain scan
        else if (scan.isEmpty) {
          // every file single-valued and fully accounted: one local row
          // per group, in the aggregate's own output shape
          val rows = sums.toSeq.map { case (k, n) =>
            val kv = k.map(typed).orNull
            InternalRow.fromSeq(agg.aggregateExpressions.map(e =>
              if (isKeyOutput(e, g)) kv
              else litOf(e).map(_.value).getOrElse(n: Any)))
          }
          Some(LocalRelation(agg.output, rows))
        } else {
          // stamped groups as a LocalRelation, degraded files as one
          // restricted grouped scan, merged by a summing aggregate that
          // reuses the original output exprIds
          val cnt = Alias(AggregateExpression(
            Count(Seq(Literal(1L))), Complete, isDistinct = false),
            "gm_part_cnt")()
          val newChild = agg.child.transformUp {
            case l: LogicalRelation if l eq lr =>
              l.copy(relation = gr.restrictedTo(scan.map(_.path).toSet))
          }
          val scanAgg = Aggregate(Seq(g), Seq(g, cnt), newChild)
          val localOut = Seq(
            AttributeReference("gm_k", g.dataType)(),
            AttributeReference("gm_c", LongType, nullable = false)())
          val local = LocalRelation(localOut,
            sums.toSeq.map { case (k, n) =>
              InternalRow.fromSeq(Seq(k.map(typed).orNull, n))
            })
          val un = Union(Seq(scanAgg, local))
          val uk = un.output.head
          val uc = un.output(1)
          val sumCnt = Coalesce(Seq(AggregateExpression(
            Sum(uc), Complete, isDistinct = false), Literal(0L)))
          val outs = agg.aggregateExpressions.map { e =>
            if (isKeyOutput(e, g)) Alias(uk, e.name)(exprId = e.exprId)
            else litOf(e) match {
              case Some(l) => Alias(l, e.name)(exprId = e.exprId)
              case None    => Alias(sumCnt, e.name)(exprId = e.exprId)
            }
          }
          Some(Aggregate(Seq(uk), outs, un))
        }
      }
    }
  }

  /** The stamp decoding for a summable column dtype: Spark's SUM
    * result dtype for it, and the internal result value from the
    * folded stamp total — the raw Long for integral columns, exact
    * micro-units reconstructed to the result scale for DECIMAL ones
    * (refusing — None — if a corrupted/legacy stamp is not divisible
    * down to the column scale, or precision+10 would hit the 38 cap
    * where Spark's own overflow semantics take over). Doubles never
    * stamp (order-dependent sums). */
  private def sumCodecOf(a: AttributeReference)
      : Option[(DataType, Long => Option[Any])] = a.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      Some((LongType, l => Some(l)))
    case dt: org.apache.spark.sql.types.DecimalType
        if dt.scale >= 0 && dt.scale <= 6 && dt.precision + 10 <= 38 =>
      val rt = org.apache.spark.sql.types.DecimalType(
        dt.precision + 10, dt.scale)
      Some((rt, l => try {
        val bd = new java.math.BigDecimal(
          java.math.BigInteger.valueOf(l), 6)
          .setScale(dt.scale) // exact by stamp construction; throws on
                              // a corrupted/legacy stamp → refuse
        Some(org.apache.spark.sql.types.Decimal(
          scala.math.BigDecimal(bd), rt.precision, rt.scale))
      } catch { case _: ArithmeticException => None }))
    case dt: org.apache.spark.sql.types.DecimalType =>
      // eligible-looking decimal that the stamp contract can't carry:
      // scale > 6 exceeds micro-units, precision + 10 > 38 hits the
      // cap where Spark's own overflow contract must decide — say WHY
      // the scan happened instead of refusing silently
      logDebug(s"metadata SUM/AVG refused for ${a.name}: " +
        s"decimal(${dt.precision},${dt.scale}) is outside the stamp " +
        "contract (needs scale <= 6 and precision + 10 <= 38); the " +
        "plain scan answers")
      None
    case _ => None
  }

  /** The summable relation attribute under a sum child — bare or
    * widening-integral-cast (summing widened values is the same sum;
    * the stamp is the native per-file arithmetic either way). */
  private def sumAttrOf(c: Expression, lr: LogicalRelation,
      g: GraftRelation): Option[AttributeReference] =
    keyAttrOf(c).filter(a => lr.output.exists(_.exprId == a.exprId) &&
      sumCodecOf(a).isDefined)

  /** Is `e` a non-distinct unfiltered `sum(col)` whose answer the
    * per-file sum stamps can speak about? Returns the attribute. */
  private def sumKeyOf(e: NamedExpression, lr: LogicalRelation,
      g: GraftRelation): Option[AttributeReference] = e match {
    case al @ Alias(ae: AggregateExpression, _)
        if ae.mode == Complete && ae.filter.isEmpty && !ae.isDistinct =>
      ae.aggregateFunction match {
        case Sum(c, _) => sumAttrOf(c, lr, g)
            .filter(a => sumCodecOf(a).exists(_._1 == al.dataType))
        case _         => None
      }
    case _ => None
  }

  /** Is `e` a non-distinct unfiltered `avg(col)` the per-file sum +
    * NULL-witness stamps can answer? Returns the attribute and a
    * re-rooted [[Average]] (the bare attribute as child, the ORIGINAL
    * evalMode kept), whose own `evaluateExpression` later turns
    * stamped (sum, count) partials into the final value — so division
    * typing, rounding, and overflow semantics are Spark's own code,
    * not a re-implementation (avg(cast(int as bigint)) re-roots to
    * avg(int): both run the same Double sum buffer, so the value is
    * unchanged). Eligibility is exactly the sum stamp's
    * ([[sumCodecOf]]): integral (Double result) or decimal with
    * scale ≤ 6 and precision + 10 ≤ 38. */
  private def avgKeyOf(e: NamedExpression, lr: LogicalRelation,
      g: GraftRelation): Option[(AttributeReference, Average)] = e match {
    case al @ Alias(ae: AggregateExpression, _)
        if ae.mode == Complete && ae.filter.isEmpty && !ae.isDistinct =>
      ae.aggregateFunction match {
        case av: Average =>
          keyAttrOf(av.child).flatMap { a =>
            if (!lr.output.exists(_.exprId == a.exprId) ||
                sumCodecOf(a).isEmpty) None
            else {
              val fn = Average(a, av.evalMode)
              if (fn.dataType == al.dataType) Some((a, fn)) else None
            }
          }
        case _ => None
      }
    case _ => None
  }

  /** Evaluate `fn`'s own final-value expression over stamped partials:
    * substitute the (sum, count) aggregation-buffer attributes with
    * literals and fold the tree on the driver — byte-identical to what
    * Spark's final aggregation would compute over the same buffer.
    * None = the evaluation refused (ANSI overflow, …) — the plain scan
    * then raises the same error with proper query context. */
  private def metaAvgEval(fn: Average, sumV: Any, cnt: Long)
      : Option[Any] = {
    val buf = fn.aggBufferAttributes
    val ev = (fn: DeclarativeAggregate).evaluateExpression.transform {
      case r: AttributeReference if r.exprId == buf(0).exprId =>
        Literal.create(sumV, buf(0).dataType)
      case r: AttributeReference if r.exprId == buf(1).exprId =>
        Literal(cnt, LongType)
    }
    try Some(ev.eval(InternalRow.empty))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The stamped avg partial decoded to `fn`'s SUM BUFFER dtype —
    * Double for integral children (the exact stamped Long converted
    * once: equal to Spark's own running double sum whenever that sum
    * is exactly representable, i.e. everywhere short of |sum| > 2⁵³,
    * where Spark's answer is already partitioning-dependent), exact
    * micro-units reconstructed for decimal children (inner None =
    * corrupted stamp → refuse). A zero count is the empty-input state:
    * `fn`'s own evaluation answers NULL from it. */
  private[graft] def avgSumBuffer(fn: Average, a: AttributeReference,
      total: Long, any: Boolean): Option[Any] =
    if (!any) Some(null)
    else fn.aggBufferAttributes.head.dataType match {
      case org.apache.spark.sql.types.DoubleType => Some(total.toDouble)
      case bt: org.apache.spark.sql.types.DecimalType =>
        val scale = a.dataType
          .asInstanceOf[org.apache.spark.sql.types.DecimalType].scale
        try {
          val bd = new java.math.BigDecimal(
            java.math.BigInteger.valueOf(total), 6).setScale(scale)
          // bound to the buffer dtype Decimal(p+10, s): a total that
          // does not fit must REFUSE (the scan raises the overflow
          // error with query context), not flow into Literal.create
          // whose converter would null it silently under ANSI
          Some(org.apache.spark.sql.types.Decimal(
            scala.math.BigDecimal(bd), bt.precision, bt.scale))
        } catch { case _: ArithmeticException => None }
      case _ => None
    }

  /** Is `e` a non-distinct unfiltered variance/stddev whose moments
    * the per-file stamps carry? Matches the four central-moment
    * shapes (`var_samp`/`var_pop`/`stddev_samp`/`stddev_pop`) over an
    * INTEGRAL attribute under the analyzer's double cast. The `sq:`
    * stamp's own per-row try_multiply gate is the exactness proof: a
    * present stamp means every |x| ≤ ~3.04e9 < 2⁵³, so the
    * value-by-value double cast Spark aggregates over is exact and
    * the raw-integer moments ARE the cast values' moments. Returns
    * the attribute and the ORIGINAL aggregate (kept for its own
    * final-value evaluation — n==0/n==1/nullOnDivideByZero semantics
    * included). */
  private def momentKeyOf(e: NamedExpression, lr: LogicalRelation,
      g: GraftRelation)
      : Option[(AttributeReference, CentralMomentAgg)] = e match {
    case Alias(ae: AggregateExpression, _)
        if ae.mode == Complete && ae.filter.isEmpty && !ae.isDistinct =>
      ae.aggregateFunction match {
        case cm @ (_: VarianceSamp | _: VariancePop | _: StddevSamp |
            _: StddevPop) =>
          val fn = cm.asInstanceOf[CentralMomentAgg]
          (fn.child match {
            case Cast(a: AttributeReference, dt, _, _)
                if dt == org.apache.spark.sql.types.DoubleType => Some(a)
            case _ => None
          }).filter { a =>
            lr.output.exists(_.exprId == a.exprId) &&
              (a.dataType match {
                case ByteType | ShortType | IntegerType | LongType => true
                case _ => false
              })
          }.map(a => (a, fn))
        case _ => None
      }
    case _ => None
  }

  /** Evaluate a central-moment aggregate's own final-value expression
    * over exactly-stamped moments: n (the non-null count), avg (only
    * substituted for completeness — the variance/stddev evaluations
    * never read it), and m2 = Σ(x − μ)² computed EXACTLY as the
    * integer (n·Σx² − (Σx)²) and converted with the ONE deterministic
    * rounding sequence `dbl(D) / dbl(n)` an oracle can reproduce in
    * SQL (`CAST(n*sxx - sx*sx AS DOUBLE) / n`). Spark's own running
    * m2 is partition-order-dependent in the last ulps — like AVG,
    * there is no single scan answer to betray, and this one is
    * deterministic and exact-to-one-rounding. None = the evaluation
    * refused. */
  private def metaMomentEval(fn: CentralMomentAgg, cnt: Long, sx: Long,
      sq: Long): Option[Any] = {
    val d = BigInt(cnt) * BigInt(sq) - BigInt(sx) * BigInt(sx)
    val n = cnt.toDouble
    val m2 = if (cnt == 0) 0.0 else d.toDouble / n
    val avg = if (cnt == 0) 0.0 else sx.toDouble / n
    val buf = fn.aggBufferAttributes
    val ev = (fn: DeclarativeAggregate).evaluateExpression.transform {
      case r: AttributeReference if r.exprId == buf(0).exprId =>
        Literal(n, org.apache.spark.sql.types.DoubleType)
      case r: AttributeReference if r.exprId == buf(1).exprId =>
        Literal(avg, org.apache.spark.sql.types.DoubleType)
      case r: AttributeReference if r.exprId == buf(2).exprId =>
        Literal(m2, org.apache.spark.sql.types.DoubleType)
    }
    try Some(ev.eval(InternalRow.empty))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** min/max stamp decoding to the OUTPUT dtype (bare attr, or the
    * widening integral cast `keyAttrOf` admits): integral and DATE
    * columns only — string/timestamp/decimal hybrids refuse here (the
    * full-metadata rewrite #3 already serves full-stamp strings). */
  private def rangeValue(v: Long, outDt: DataType): Option[Any] =
    outDt match {
      case LongType    => Some(v)
      case IntegerType => Some(v.toInt)
      case ShortType   => Some(v.toShort)
      case ByteType    => Some(v.toByte)
      case org.apache.spark.sql.types.DateType => Some(v.toInt)
      case _ => None
    }

  /** Is `e` a non-distinct unfiltered `count(col)` of a bare (or
    * widening-cast) relation attribute? ANY dtype qualifies — the
    * answer needs only the NULL witness (`rows − nulls` per file),
    * which every auto-stamped column carries. */
  private def countColKeyOf(e: NamedExpression, lr: LogicalRelation,
      g: GraftRelation): Option[AttributeReference] = e match {
    case Alias(ae: AggregateExpression, _)
        if ae.mode == Complete && ae.filter.isEmpty && !ae.isDistinct =>
      ae.aggregateFunction match {
        case Count(Seq(c)) => keyAttrOf(c)
          .filter(a => lr.output.exists(_.exprId == a.exprId))
        case _ => None
      }
    case _ => None
  }

  /** Is `e` a non-distinct unfiltered `min(col)`/`max(col)` whose
    * answer per-file [min,max] stamps can speak about? Returns
    * (attr, isMin, output dtype). */
  private def rangeKeyOf(e: NamedExpression, lr: LogicalRelation,
      g: GraftRelation)
      : Option[(AttributeReference, Boolean, DataType)] = e match {
    case al @ Alias(ae: AggregateExpression, _)
        if ae.mode == Complete && ae.filter.isEmpty && !ae.isDistinct =>
      def attr(c: Expression): Option[AttributeReference] =
        keyAttrOf(c).filter(a => lr.output.exists(_.exprId == a.exprId) &&
          rangeValue(0L, al.dataType).isDefined &&
          (a.dataType match {
            case ByteType | ShortType | IntegerType | LongType |
                org.apache.spark.sql.types.DateType => true
            case _ => false
          }))
      ae.aggregateFunction match {
        case Min(c) => attr(c).map(a => (a, true, al.dataType))
        case Max(c) => attr(c).map(a => (a, false, al.dataType))
        case _ => None
      }
    case _ => None
  }

  /** '''6b. Global SUM — partial-stamp hybrid and the range-filtered
    * window''' (round 18): when SOME files carry [[Snapshot.SumPfx]]
    * stamps (or are provably all-NULL) and the rest must scan,
    * `sum(c)` [+ count-star mixes] becomes the stamped partial as a
    * LocalRelation row UNIONed with one restricted scan's aggregate,
    * merged by an outer Sum — SQL SUM ignores NULLs, so the
    * NULL-partial (nothing stamped non-null) merges correctly and an
    * all-NULL table still answers NULL. A clustering-range FILTER
    * composes (`sum(amount) WHERE key BETWEEN lo AND hi` — the
    * canonical windowed warehouse aggregate): wholly-inside files sum
    * from stamps via [[Snapshot.metaRangeSumSplit]] (zero key-nulls,
    * zero DVs, `c` stamped or witnessed all-NULL), straddlers scan
    * WITH the predicate, wholly-outside files vanish, and a
    * contradictory range answers (0, NULL) from the predicate alone.
    * The full-stamp unfiltered case is rewrite #6 inside
    * [[minMaxRewrite]]. Round 19 adds `avg(c)` (kind 5): the SumSpec +
    * CountSpec pair over existing stamps, the stamped (sum, count)
    * partial riding the union UNDIVIDED as a (double sum, long count)
    * pair mirroring Average's own buffer, the division done ONCE by
    * the query's own [[Average.evaluateExpression]] over the merged
    * aggregates — decimal avg serves only the full-metadata arm
    * ([[avgKeyOf]]). Multiple measured columns compose in one rewrite,
    * each with its own stamp fold, all sharing ONE all-in-or-all-scan
    * file set; count-star outputs additionally require the stamped
    * rows known. None = guards refuse (plain scan answers). */
  private def sumRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val unfiltered = relationOf(agg.child)
      .map(r => (r, None: Option[(Long, Long)]))
    def filtered = filteredRelationOf(agg.child).flatMap {
      case (fil, lr, gr) =>
        boundsOf(splitConjunctivePredicates(fil.condition), lr, gr)
          .map(b => ((lr, gr), Some(b): Option[(Long, Long)]))
    }
    unfiltered.orElse(filtered).flatMap { case ((lr, gr), bounds) =>
      // per-output shape: kind 3 = count-star; 0 = sum, 1 = min,
      // 2 = max, 5 = avg (round 19), 6 = count(col), each with its
      // attribute and OUTPUT dtype; avg also records its re-rooted
      // Average (by output position) for the final-value evaluation
      val avgFns = scala.collection.mutable.Map.empty[Int, Average]
      val momFns = scala.collection.mutable.Map.empty[Int, CentralMomentAgg]
      val litVals = scala.collection.mutable.Map.empty[Int, Literal]
      // outputs of the form f(one-served-aggregate) — the shape
      // CollapseProject leaves when a report wraps an aggregate in a
      // cast/round/unit-scale projection (`F.od(sum(x))`,
      // `avg(p) * 1e6`): the WRAPPER body and its single inner
      // AggregateExpression, substituted with the served value (full
      // arm) or the merged aggregate tree (hybrid arm)
      val wrappers =
        scala.collection.mutable.Map.empty[Int, (Expression,
          AggregateExpression)]
      def shapeOf(e: NamedExpression, ei: Int)
          : Option[(Int, AttributeReference, DataType)] =
        if (isCountStar(e))
          Some((3, null: AttributeReference, LongType))
        else sumKeyOf(e, lr, gr)
          .map(a => (0, a, sumCodecOf(a).get._1))
          .orElse(rangeKeyOf(e, lr, gr).map { case (a, isMin, dt) =>
            (if (isMin) 1 else 2, a, dt)
          })
          .orElse(countColKeyOf(e, lr, gr).map(a => (6, a, LongType)))
          .orElse(avgKeyOf(e, lr, gr).map { case (a, fn) =>
            avgFns(ei) = fn; (5, a, fn.dataType)
          })
          .orElse(momentKeyOf(e, lr, gr).map { case (a, fn) =>
            momFns(ei) = fn
            (7, a, org.apache.spark.sql.types.DoubleType)
          })
      val shapes: Seq[Option[(Int, AttributeReference, DataType)]] =
        agg.aggregateExpressions.zipWithIndex.map { case (e, ei) =>
          shapeOf(e, ei)
            .orElse(litOf(e).map { l =>
              litVals(ei) = l; (8, null: AttributeReference, l.dataType)
            })
            .orElse(e match {
              case Alias(body, _)
                  if !body.isInstanceOf[AggregateExpression] &&
                    body.deterministic =>
                body.collect { case ae: AggregateExpression => ae } match {
                  case Seq(ae)
                      // the wrapper itself may reference NOTHING
                      // beyond its aggregate (a grouping-attribute
                      // reference could neither fold on the driver
                      // nor resolve against the hybrid merge). The
                      // subset check alone is NOT enough: in
                      // `sum(g) + g GROUP BY g` the references
                      // coincide, yet substituting the merged Sum
                      // tree leaves a bare `g` the hybrid Aggregate
                      // cannot resolve — so additionally require the
                      // body reference-free once the aggregate is
                      // removed
                      if body.references.subsetOf(ae.references) &&
                        body.transform {
                          case x: AggregateExpression if x eq ae =>
                            Literal(null, ae.dataType)
                        }.references.isEmpty =>
                    shapeOf(Alias(ae, "gm_w")(), ei).map { sh =>
                      wrappers(ei) = (body, ae); sh
                    }
                  case _ => None
                }
              case _ => None
            })
        }
      // the served value pushed through an output's wrapper (identity
      // when none) — None = the wrapper refused to fold (never wrong)
      def finish(ei: Int, v: Any): Option[Any] = wrappers.get(ei) match {
        case Some((body, ae)) =>
          try Some(body.transform {
            case x: AggregateExpression if x eq ae =>
              Literal(v, ae.dataType)
          }.eval(InternalRow.empty))
          catch { case scala.util.control.NonFatal(_) => None }
        case None => Some(v)
      }
      // the merged aggregate tree substituted into the wrapper
      def finishExpr(ei: Int, m2e: Expression): Expression =
        wrappers.get(ei) match {
          case Some((body, ae)) => body.transform {
            case x: AggregateExpression if x eq ae => m2e
          }
          case None => m2e
        }
      val keyed = shapes.flatten.filter(k => k._1 != 3 && k._1 != 8)
      // pure count/literal mixes belong to dispatch arm 1 — EXCEPT
      // when a wrapper is involved (`count(*) * 2`), which only this
      // rewrite's machinery can fold
      if (shapes.exists(_.isEmpty) ||
          (keyed.isEmpty && wrappers.isEmpty)) None
      else if (bounds.exists(b => b._1 > b._2))
        // contradiction: zero rows — count 0, every aggregate NULL,
        // literals pass through, by the predicate alone
        shapes.zipWithIndex.map {
          case (Some((3, _, _)), ei)  => finish(ei, 0L)
          case (Some((8, _, _)), ei) => Some(litVals(ei).value)
          case (_, ei)               => finish(ei, null)
        } match {
          case vs if vs.forall(_.isDefined) =>
            Some(LocalRelation(agg.output,
              Seq(InternalRow.fromSeq(vs.map(_.get)))))
          case _ => None
        }
      else {
        val m = gr.pinnedManifest
        def dedup(as: Seq[AttributeReference]) =
          as.foldLeft(Seq.empty[AttributeReference])((acc, a) =>
            if (acc.exists(_.exprId == a.exprId)) acc else acc :+ a)
        // one fold spec per distinct (attr, sum-vs-range-vs-count) —
        // an avg contributes BOTH a sum and a non-null-count spec
        val sumAttrs = dedup(keyed
          .filter(k => k._1 == 0 || k._1 == 5 || k._1 == 7).map(_._2))
        val rngAttrs = dedup(keyed.filter(k => k._1 == 1 || k._1 == 2)
          .map(_._2))
        val cntAttrs = dedup(keyed
          .filter(k => k._1 == 6 || k._1 == 5 || k._1 == 7).map(_._2))
        val sqAttrs = dedup(keyed.filter(_._1 == 7).map(_._2))
        val specs: Seq[Snapshot.StampSpec] =
          sumAttrs.map(a => Snapshot.SumSpec(
            Snapshot.physicalName(m, a.name))) ++
            rngAttrs.map(a => Snapshot.RangeSpec(
              Snapshot.physicalName(m, a.name),
              cluster = isClusteringAttr(a, lr, gr))) ++
            cntAttrs.map(a => Snapshot.CountSpec(
              Snapshot.physicalName(m, a.name),
              cluster = isClusteringAttr(a, lr, gr))) ++
            sqAttrs.map(a => Snapshot.SumSpec(
              Snapshot.physicalName(m, a.name), Snapshot.SqPfx))
        def sumIdxOf(a: AttributeReference): Int =
          sumAttrs.indexWhere(_.exprId == a.exprId)
        def cntIdxOf(a: AttributeReference): Int =
          sumAttrs.length + rngAttrs.length +
            cntAttrs.indexWhere(_.exprId == a.exprId)
        def sqIdxOf(a: AttributeReference): Int =
          sumAttrs.length + rngAttrs.length + cntAttrs.length +
            sqAttrs.indexWhere(_.exprId == a.exprId)
        def specIdx(kind: Int, a: AttributeReference): Int =
          if (kind == 0) sumIdxOf(a)
          else if (kind == 6) cntIdxOf(a)
          else sumAttrs.length + rngAttrs.indexWhere(_.exprId == a.exprId)
        val (stampedRows, rowsOk, accs, scan) =
          Snapshot.metaAggSplitCols(m, specs, bounds)
        // the raw stamped (sum-buffer, non-null count) pair per avg
        // OUTPUT — the hybrid arm merges these undivided
        def avgPartOf(a: AttributeReference, ei: Int)
            : Option[(Any, Long)] =
          (accs(sumIdxOf(a)), accs(cntIdxOf(a))) match {
            case (Snapshot.SumAcc(st, any), Snapshot.SumAcc(cnt, _)) =>
              avgSumBuffer(avgFns(ei), a, st, any).map(sv => (sv, cnt))
            case _ => None
          }
        // raw stamped (Σx, Σx², n) triple per variance OUTPUT — exact
        // integers the hybrid arm merges undivided (all-NULL stamped
        // sides carry NULL sums the union Sum ignores)
        def momPartOf(a: AttributeReference): (Any, Any, Long) =
          (accs(sumIdxOf(a)), accs(cntIdxOf(a)), accs(sqIdxOf(a))) match {
            case (Snapshot.SumAcc(sx, anyX), Snapshot.SumAcc(cnt, _),
                Snapshot.SumAcc(sq, anyQ)) =>
              (if (anyX) org.apache.spark.sql.types.Decimal(
                 scala.math.BigDecimal(sx), 38, 0) else null,
                if (anyQ) org.apache.spark.sql.types.Decimal(
                  scala.math.BigDecimal(sq), 38, 0) else null,
                cnt)
            case _ => (null, null, 0L) // unreachable: partialsClean gated
          }
        // decoded stamped partial per non-count shape; inner None =
        // corrupted stamp → refuse whole
        def partialOf(kind: Int, a: AttributeReference, dt: DataType,
            ei: Int): Option[Any] = kind match {
          case 5 => avgPartOf(a, ei).flatMap { case (sv, c) =>
            metaAvgEval(avgFns(ei), sv, c)
          }
          case 7 =>
            (accs(sumIdxOf(a)), accs(cntIdxOf(a)), accs(sqIdxOf(a))) match {
              case (Snapshot.SumAcc(sx, _), Snapshot.SumAcc(cnt, _),
                  Snapshot.SumAcc(sq, _)) =>
                metaMomentEval(momFns(ei), cnt, sx, sq)
              case _ => None
            }
          case _ => accs(specIdx(kind, a)) match {
            case Snapshot.SumAcc(t, _) if kind == 6 =>
              Some(t: Any) // count(c): 0 is the answer, never NULL
            case Snapshot.SumAcc(t, any) =>
              if (any) sumCodecOf(a).get._2(t) else Some(null: Any)
            case Snapshot.RangeAcc(mn, mx, any) =>
              if (!any) Some(null: Any)
              else rangeValue(if (kind == 1) mn else mx, dt)
          }
        }
        val partialsClean: Seq[Option[Any]] =
          shapes.zipWithIndex.map {
            case (Some((3, _, _)), _)  => Some(0L: Any)
            case (Some((8, _, _)), i)  => Some(litVals(i).value)
            case (Some((k, a, dt)), i) => partialOf(k, a, dt, i)
            case (None, _)             => None
          }
        val hasCount = shapes.exists(_.exists(_._1 == 3))
        if (scan.size == m.files.size) None
        else if (hasCount && !rowsOk) None
        else if (partialsClean.exists(_.isEmpty)) None // corrupted
        else if (scan.isEmpty)
          // every file answered from stamps: one local row. This arm
          // also serves the unfiltered shapes rewrite #6 declines
          // (count(col)/avg outputs, mixes #6's per-output table
          // lacks) — sumRewrite runs LAST in the orElse chain, so no
          // overlap.
          shapes.zip(partialsClean).zipWithIndex.map {
            case ((Some((3, _, _)), _), ei) => finish(ei, stampedRows)
            case ((Some((8, _, _)), Some(v)), _) => Some(v)
            case ((_, Some(v)), ei)         => finish(ei, v)
            case _ => return None // unreachable by the guards
          } match {
            case vs if vs.forall(_.isDefined) =>
              Some(LocalRelation(agg.output,
                Seq(InternalRow.fromSeq(vs.map(_.get)))))
            case _ => None
          }
        else {
          // hybrid: one scan aggregate + one local partial per
          // NON-count output (a shared count pair first; an avg
          // occupies TWO partial slots — double sum + non-null
          // count; a variance occupies THREE — exact Σx, Σx², n),
          // merged by an outer aggregate of each shape's own
          // kind. DECIMAL avg partials merge too (round 20): the
          // scan side sums the decimal child exactly at the buffer
          // dtype and the widened union total is bound back by
          // Spark's own CheckOverflowInSum below. Variance
          // moments (kind 7) merge EXACTLY (round 20 — the r19
          // verdict's task 5): the scan side aggregates Σx and Σx² as
          // DECIMAL(38,0) integers — never a float partial that would
          // re-introduce the order-dependence the stamps eliminate —
          // but ONLY when every degraded file still CARRIES its sq:
          // stamp (present-but-unusable: DV'd files, windowed
          // straddlers). The stamp's per-row try_multiply gate proves
          // every scanned |x| ≤ ~3.04e9, so each x² ≤ 9.3e18 and the
          // Decimal(38,0) partials stay exact short of 10¹⁹ scanned
          // rows. A file MISSING the stamp (overflowing row, pre-sq
          // write, opted-out session) proves nothing and refuses
          // whole — degraded-never-wrong.
          locally {
            val momAttrs = shapes.zipWithIndex.collect {
              case (Some((7, a, _)), _) => a
            }
            if (momAttrs.nonEmpty && scan.exists(f => momAttrs.exists(
                a => !m.colStats.contains((f.path,
                  Snapshot.SqPfx + Snapshot.physicalName(m, a.name))))))
              return None
          }
          // avg hybrids (round 20 — the r19 ADVICE low (b) lifted):
          // DOUBLE buffers merge as running double sums; DECIMAL
          // buffers merge as exact decimal sums whose widened union
          // total is bound back to the buffer dtype by Spark's OWN
          // CheckOverflowInSum (mode-matched at the output arm below:
          // legacy null / ANSI raise — the same contract the scan's
          // final sum evaluation applies). Any other buffer dtype
          // refuses.
          if (shapes.zipWithIndex.exists {
                case (Some((5, _, _)), ei) =>
                  val bt = avgFns(ei).aggBufferAttributes.head.dataType
                  bt != org.apache.spark.sql.types.DoubleType &&
                    !bt.isInstanceOf[DecimalType]
                case _ => false
              }) return None
          val cnt = Alias(AggregateExpression(
            Count(Seq(Literal(1L))), Complete, isDistinct = false),
            "gm_part_cnt")()
          val perShape = shapes.zipWithIndex.collect {
            case (Some((k, a, dt)), i) if k != 3 && k != 8 =>
              (k, a, dt, i)
          }
          // slot layout over the partial columns
          val slotOf: Map[Int, Int] = {
            var off = 0
            perShape.map { case (k, _, _, i) =>
              val s = i -> off
              off += (if (k == 5) 2 else if (k == 7) 3 else 1); s
            }.toMap
          }
          val scanAggs = perShape.flatMap { case (k, a, dt, i) =>
            if (k == 5) {
              // mirror Average's own buffer: a running DOUBLE sum for
              // integral children (never a Long that could raise
              // where avg would not), the exact DECIMAL(p+10, s) sum
              // for decimal children (Sum's own resultType IS the
              // buffer dtype), plus the non-null count
              val sumChild: Expression =
                if (avgFns(i).aggBufferAttributes.head.dataType ==
                    org.apache.spark.sql.types.DoubleType)
                  Cast(a, org.apache.spark.sql.types.DoubleType)
                else a
              Seq(
                Alias(AggregateExpression(Sum(sumChild), Complete,
                  isDistinct = false), "gm_part")(),
                Alias(AggregateExpression(Count(Seq(a)), Complete,
                  isDistinct = false), "gm_partc")())
            } else if (k == 7) {
              // exact integer moments: Σx and Σx² as DECIMAL(38,0)
              // (each x² ≤ 9.3e18 under the sq:-stamp guard above, so
              // both sums stay exact) plus the non-null count — never
              // a float partial
              val dx = Cast(a, DecimalType(38, 0))
              Seq(
                Alias(AggregateExpression(Sum(dx), Complete,
                  isDistinct = false), "gm_part")(),
                Alias(AggregateExpression(Sum(Multiply(dx, dx)),
                  Complete, isDistinct = false), "gm_partq")(),
                Alias(AggregateExpression(Count(Seq(a)), Complete,
                  isDistinct = false), "gm_partc")())
            } else {
              // min/max of a widened output must aggregate the widened
              // child so the union sides agree on dtype (sum result
              // dtypes already match the codec's; counts are Longs)
              val child: Expression =
                if (k == 1 || k == 2) {
                  if (a.dataType != dt) Cast(a, dt) else a
                } else a
              val fn = k match {
                case 0 => Sum(child); case 1 => Min(child)
                case 2 => Max(child); case _ => Count(Seq(child))
              }
              Seq(Alias(AggregateExpression(fn, Complete,
                isDistinct = false), "gm_part")())
            }
          }
          val newChild = agg.child.transformUp {
            case l: LogicalRelation if l eq lr =>
              l.copy(relation = gr.restrictedTo(scan.map(_.path).toSet))
          }
          val scanAgg = Aggregate(Nil, cnt +: scanAggs, newChild)
          val localOut =
            AttributeReference("gm_n", LongType, nullable = false)() +:
              perShape.flatMap { case (k, _, dt, i) =>
                if (k == 5)
                  Seq(AttributeReference(s"gm_p$i",
                      avgFns(i).aggBufferAttributes.head.dataType)(),
                    AttributeReference(s"gm_p${i}c", LongType,
                      nullable = false)())
                else if (k == 7)
                  Seq(AttributeReference(s"gm_p$i", DecimalType(38, 0))(),
                    AttributeReference(s"gm_p${i}q", DecimalType(38, 0))(),
                    AttributeReference(s"gm_p${i}c", LongType,
                      nullable = false)())
                else Seq(AttributeReference(s"gm_p$i", dt)())
              }
          val localVals: Seq[Any] = (stampedRows: Any) +:
            perShape.flatMap { case (k, a, _, i) =>
              if (k == 5) {
                val (sv, c) = avgPartOf(a, i).get // clean by the guard
                Seq(sv, c: Any)
              } else if (k == 7) {
                val (sx, sq, c) = momPartOf(a)
                Seq(sx, sq, c: Any)
              } else Seq(partialsClean(i).get)
            }
          val local = LocalRelation(localOut,
            Seq(InternalRow.fromSeq(localVals)))
          val un = Union(Seq(scanAgg, local))
          val uc = un.output.head
          def colOf(i: Int): Attribute = un.output(1 + slotOf(i))
          def colOf2(i: Int): Attribute = un.output(2 + slotOf(i))
          def colOf3(i: Int): Attribute = un.output(3 + slotOf(i))
          val outs = agg.aggregateExpressions.zip(shapes).zipWithIndex
            .map {
              case ((e, Some((3, _, _))), i) =>
                Alias(finishExpr(i, Coalesce(Seq(AggregateExpression(
                  Sum(uc), Complete, isDistinct = false), Literal(0L)))),
                  e.name)(exprId = e.exprId)
              case ((e, Some((0, _, dt))), i) =>
                // the union-merge Sum widens (decimal +10 precision);
                // cast back — exact unless the original sum itself
                // would have overflowed, where the session's own
                // overflow contract takes over
                Alias(finishExpr(i, Cast(AggregateExpression(
                  Sum(colOf(i)), Complete, isDistinct = false), dt)),
                  e.name)(exprId = e.exprId)
              case ((e, Some((6, _, _))), i) =>
                // count partials add like count-star cells
                Alias(finishExpr(i, Coalesce(Seq(AggregateExpression(
                  Sum(colOf(i)), Complete, isDistinct = false),
                  Literal(0L)))), e.name)(exprId = e.exprId)
              case ((e, Some((8, _, _))), i) =>
                Alias(litVals(i), e.name)(exprId = e.exprId)
              case ((e, Some((5, _, _))), i) =>
                // Average's OWN final-value tree over the merged
                // (sum, count) — division typing and rounding are
                // Spark's code, not a re-implementation
                val fn = avgFns(i)
                val buf = fn.aggBufferAttributes
                val rawSum: Expression = AggregateExpression(
                  Sum(colOf(i)), Complete, isDistinct = false)
                val sumAgg: Expression = buf(0).dataType match {
                  case dt: DecimalType =>
                    // bind the widened union total back to the buffer
                    // dtype with the scan's own overflow contract —
                    // Spark's CheckOverflowInSum, mode-matched
                    org.apache.spark.sql.catalyst.expressions
                      .CheckOverflowInSum(rawSum, dt,
                        !session.sessionState.conf.ansiEnabled, null)
                  case _ => rawSum
                }
                val cntAgg: Expression = Coalesce(Seq(
                  AggregateExpression(Sum(colOf2(i)), Complete,
                    isDistinct = false), Literal(0L)))
                val ev = (fn: DeclarativeAggregate).evaluateExpression
                  .transform {
                    case r: AttributeReference
                        if r.exprId == buf(0).exprId => sumAgg
                    case r: AttributeReference
                        if r.exprId == buf(1).exprId => cntAgg
                  }
                Alias(finishExpr(i, ev), e.name)(exprId = e.exprId)
              case ((e, Some((7, _, _))), i) =>
                // the merged exact moments run the SAME deterministic
                // chain as the full-metadata driver fold: BigInt
                // difference, ONE double conversion, and the
                // aggregate's OWN evaluation divides once
                // ([[graft.expressions.MomentM2]] — byte-identical to
                // metaMomentEval by construction)
                val fn = momFns(i)
                val buf = fn.aggBufferAttributes
                val zeroD = Literal.create(
                  org.apache.spark.sql.types.Decimal(0L, 38, 0),
                  DecimalType(38, 0))
                val sxAgg: Expression = Coalesce(Seq(AggregateExpression(
                  Sum(colOf(i)), Complete, isDistinct = false), zeroD))
                val sqAgg: Expression = Coalesce(Seq(AggregateExpression(
                  Sum(colOf2(i)), Complete, isDistinct = false), zeroD))
                val cntAgg: Expression = Coalesce(Seq(AggregateExpression(
                  Sum(colOf3(i)), Complete, isDistinct = false),
                  Literal(0L)))
                val nD = Cast(cntAgg, DoubleType)
                val avgE = If(EqualTo(cntAgg, Literal(0L)),
                  Literal(0.0), Divide(Cast(sxAgg, DoubleType), nD))
                val m2E = graft.expressions.MomentM2(cntAgg, sxAgg, sqAgg)
                val ev = (fn: DeclarativeAggregate).evaluateExpression
                  .transform {
                    case r: AttributeReference
                        if r.exprId == buf(0).exprId => nD
                    case r: AttributeReference
                        if r.exprId == buf(1).exprId => avgE
                    case r: AttributeReference
                        if r.exprId == buf(2).exprId => m2E
                  }
                Alias(finishExpr(i, ev), e.name)(exprId = e.exprId)
              case ((e, Some((k, _, _))), i) =>
                val fn: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction =
                  if (k == 1) Min(colOf(i)) else Max(colOf(i))
                Alias(finishExpr(i, AggregateExpression(fn, Complete,
                  isDistinct = false)), e.name)(exprId = e.exprId)
              case ((_, None), _) => return None // unreachable
            }
          Some(Aggregate(Nil, outs, un))
        }
      }
    }
  }

  /** Is `e` an unfiltered `approx_count_distinct(col)` of a bare
    * relation attribute? Returns the attribute and the query's
    * requested relativeSD. */
  private def approxHllOf(e: NamedExpression, lr: LogicalRelation)
      : Option[(AttributeReference, Double)] = e match {
    case Alias(ae: AggregateExpression, _)
        if ae.mode == Complete && ae.filter.isEmpty && !ae.isDistinct =>
      ae.aggregateFunction match {
        case h: HyperLogLogPlusPlus => h.child match {
          case a: AttributeReference
              if lr.output.exists(_.exprId == a.exprId) =>
            Some((a, h.relativeSD))
          case _ => None
        }
        case _ => None
      }
    case _ => None
  }

  /** '''Opt-in''': `approx_count_distinct(col)` answered from the HLL
    * register sidecars ([[Snapshot.metaDistinctMeta]]), behind
    * [[MetadataOnlyCountRule.ApproxDistinctSketchKey]] — default OFF,
    * because swapping Spark's HLL++ estimate for the sidecar sketch's
    * CHANGES answers: this is an explicit dashboard opt-in, never a
    * silent rewrite (the q178 verb + fold remain the conf-free
    * spelling). Serves only when the sidecar sketch is at least as
    * TIGHT as the query's requested relativeSD (p=12 ≈ 0.016 vs the
    * 0.05 default) and every file is provably accounted — the q178
    * refusal ladder: DVs, unsketched/rewritten files, corrupt or
    * mixed-precision payloads refuse to the plain scan. Count-star
    * (exact, from the metadata count) and literal outputs mix. */
  private def approxDistinctRewrite(agg: Aggregate): Option[LogicalPlan] = {
    if (!session.conf.get(MetadataOnlyCountRule.ApproxDistinctSketchKey,
        "false").toBoolean) return None
    relationOf(agg.child).flatMap { case (lr, gr) =>
      val m = gr.pinnedManifest
      val lits = scala.collection.mutable.Map.empty[Int, Literal]
      val shapes: Seq[Option[Either[(AttributeReference, Double), Int]]] =
        agg.aggregateExpressions.zipWithIndex.map { case (e, i) =>
          approxHllOf(e, lr).map(Left(_))
            .orElse(if (isCountStar(e)) Some(Right(0)) else None)
            .orElse(litOf(e).map { l => lits(i) = l; Right(1) })
        }
      if (shapes.exists(_.isEmpty) || !shapes.exists(_.exists(_.isLeft)))
        return None
      val rowsOpt = metaCountOf(agg.child)
      if (shapes.exists(_.contains(Right(0))) && rowsOpt.isEmpty)
        return None
      val vals: Seq[Any] = agg.aggregateExpressions.indices.map { i =>
        shapes(i).get match {
          case Left((a, reqRsd)) =>
            Snapshot.metaDistinctMeta(m,
              Snapshot.physicalName(m, a.name)) match {
              case Some((est, rsd)) if rsd <= reqRsd => est: Any
              case _ => return None
            }
          case Right(0) => rowsOpt.get: Any
          case Right(_) => lits(i).value
        }
      }
      Some(LocalRelation(agg.output, Seq(InternalRow.fromSeq(vals))))
    }
  }

  /** The grouped twin — `g, approx_count_distinct(col) GROUP BY g`
    * from [[Snapshot.metaGroupDistinctMeta]]'s per-group register
    * merge: same conf gate and tightness guard, ALL-OR-NOTHING per
    * that merge's contract (a sketch cannot be split across groups —
    * any DV, mixed-valued file, or missing sketch refuses whole).
    * Key and literal outputs mix; the NULL-key group is first-class. */
  private def groupedApproxDistinctRewrite(agg: Aggregate,
      g: AttributeReference): Option[LogicalPlan] = {
    if (!session.conf.get(MetadataOnlyCountRule.ApproxDistinctSketchKey,
        "false").toBoolean) return None
    relationOf(agg.child).flatMap { case (lr, gr) =>
      val m = gr.pinnedManifest
      if (!groupableDtype(g.dataType) ||
          !lr.output.exists(_.exprId == g.exprId)) return None
      val lits = scala.collection.mutable.Map.empty[Int, Literal]
      val shapes: Seq[Option[Either[(AttributeReference, Double), Int]]] =
        agg.aggregateExpressions.zipWithIndex.map { case (e, i) =>
          (if (isKeyOutput(e, g)) Some(Right(2))
           else None: Option[Either[(AttributeReference, Double), Int]])
            .orElse(approxHllOf(e, lr).map(Left(_)))
            .orElse(litOf(e).map { l => lits(i) = l; Right(1) })
        }
      if (shapes.exists(_.isEmpty) || !shapes.exists(_.exists(_.isLeft)))
        return None
      val physG = Snapshot.physicalName(m, g.name)
      val cluster = isClusteringAttr(g, lr, gr)
      val attrs = shapes.flatten.collect { case Left((a, r)) => (a, r) }
      val perCol: Map[Long, Map[Option[Long], Long]] =
        attrs.groupBy(_._1.exprId.id).map { case (id, as) =>
          val minReq = as.map(_._2).min
          Snapshot.metaGroupDistinctMeta(m, physG, cluster,
            Snapshot.physicalName(m, as.head._1.name)) match {
            case Some((ests, rsd)) if rsd <= minReq => id -> ests
            case _ => return None
          }
        }
      // every per-column merge derives its groups from the SAME file
      // verdicts — differing keysets mean an inconsistency: refuse
      val groups = perCol.values.head.keySet
      if (!perCol.values.forall(_.keySet == groups)) return None
      val rows = groups.toSeq.map { grp =>
        InternalRow.fromSeq(agg.aggregateExpressions.indices.map { i =>
          shapes(i).get match {
            case Left((a, _)) => perCol(a.exprId.id)(grp): Any
            case Right(2) => grp.map(typedKey(_, g.dataType)).orNull
            case Right(_) => lits(i).value
          }
        })
      }
      Some(LocalRelation(agg.output, rows))
    }
  }

  /** Is `e` a `count(col)` / `count(DISTINCT col)` of a bare (or
    * widening-cast) relation attribute of a groupable dtype? Returns
    * the attribute and the distinctness. */
  private def countKeyOf(e: NamedExpression, lr: LogicalRelation,
      g: GraftRelation): Option[(AttributeReference, Boolean)] = e match {
    case Alias(ae: AggregateExpression, _)
        if ae.mode == Complete && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case Count(Seq(c)) =>
          keyAttrOf(c)
            .filter(a => lr.output.exists(_.exprId == a.exprId) &&
              groupableDtype(a.dataType))
            .map(a => (a, ae.isDistinct))
        case _ => None
      }
    case _ => None
  }

  /** '''5. Global count(key) / count(DISTINCT key) of the clustering
    * column''' (round 17) — "how many non-null keys" and "how many
    * tenants/days/codes", answered from the same
    * [[Snapshot.metaGroupSplit]] arithmetic as the grouped shape:
    * stamped single-valued files contribute their group sums (NULLs
    * and DV masks accounted exactly as there), degraded files scan
    * restricted and merge — `count(key)` sums the non-NULL-group
    * contributions, `count(DISTINCT key)` counts the merged distinct
    * keys (a value seen in both stamps and the scan collapses).
    * Count-star outputs mix freely. None = guards refuse. */
  private def distinctCountRewrite(agg: Aggregate): Option[LogicalPlan] =
    relationOf(agg.child).flatMap { case (lr, gr) =>
      // per-output shape: Some(None) = count(*) (a Literal rides the
      // same slot as a pass-through constant — stored separately),
      // Some(Some((a, d))) = count([DISTINCT] a) with distinctness d,
      // None = unsupported
      val lits = scala.collection.mutable.Map.empty[Int, Literal]
      val shapes: Seq[Option[Option[(AttributeReference, Boolean)]]] =
        agg.aggregateExpressions.zipWithIndex.map { case (e, ei) =>
          if (isCountStar(e)) Some(None)
          else litOf(e) match {
            case Some(l) => lits(ei) = l; Some(None)
            case None    => countKeyOf(e, lr, gr).map(ad => Some(ad))
          }
        }
      // every keyed count must speak about ONE column — its split is
      // the arithmetic they all share
      val keyed = shapes.flatten.flatten
      if (shapes.exists(_.isEmpty) || keyed.isEmpty ||
          keyed.map(_._1.exprId).distinct.size != 1) None
      else {
        val g = keyed.head._1
        def typed(v: Long): Any = typedKey(v, g.dataType)
        val m = gr.pinnedManifest
        val (sums, scan) = groupSplitOf(gr, g)
        if (scan.nonEmpty) {
          if (scan.size == m.files.size) return None
          // stamped groups + one restricted grouped scan, merged by a
          // global aggregate over the union (same scaffold as the
          // grouped rewrite, global outputs instead of per-group)
          val cnt = Alias(AggregateExpression(
            Count(Seq(Literal(1L))), Complete, isDistinct = false),
            "gm_part_cnt")()
          val newChild = agg.child.transformUp {
            case l: LogicalRelation if l eq lr =>
              l.copy(relation = gr.restrictedTo(scan.map(_.path).toSet))
          }
          val scanAgg = Aggregate(Seq(g), Seq(g, cnt), newChild)
          val localOut = Seq(
            AttributeReference("gm_k", g.dataType)(),
            AttributeReference("gm_c", LongType, nullable = false)())
          val local = LocalRelation(localOut,
            sums.toSeq.map { case (k, n) =>
              InternalRow.fromSeq(Seq(k.map(typed).orNull, n))
            })
          val un = Union(Seq(scanAgg, local))
          val uk = un.output.head
          val uc = un.output(1)
          def sumOf(term: Expression) = Coalesce(Seq(AggregateExpression(
            Sum(term), Complete, isDistinct = false), Literal(0L)))
          val outs = agg.aggregateExpressions.zip(shapes).zipWithIndex
            .map {
            case ((e, Some(None)), ei) if lits.contains(ei) =>
              Alias(lits(ei), e.name)(exprId = e.exprId)
            case ((e, Some(None)), _) => // count(*): every underlying row
              Alias(sumOf(uc), e.name)(exprId = e.exprId)
            case ((e, Some(Some((_, false)))), _) => // count(col)
              Alias(sumOf(org.apache.spark.sql.catalyst.expressions.If(
                IsNotNull(uk), uc, Literal(0L))),
                e.name)(exprId = e.exprId)
            case ((e, Some(Some((_, true)))), _) => // count(DISTINCT)
              Alias(AggregateExpression(Count(Seq(uk)), Complete,
                isDistinct = true), e.name)(exprId = e.exprId)
            case ((e, None), _) => return None // unreachable
          }
          Some(Aggregate(Nil, outs, un))
        } else {
          // every file accounted: one local row of pure arithmetic
          lazy val total = sums.valuesIterator.sum
          lazy val nonNull = sums.iterator
            .collect { case (Some(_), n) => n }.sum
          lazy val distinct = sums.keysIterator.count(_.isDefined).toLong
          val vals = shapes.zipWithIndex.map {
            case (Some(None), ei) if lits.contains(ei) => lits(ei).value
            case (Some(None), _)             => total
            case (Some(Some((_, false))), _) => nonNull
            case (Some(Some((_, true))), _)  => distinct
            case (None, _)                   => return None // unreachable
          }
          Some(LocalRelation(agg.output,
            Seq(InternalRow.fromSeq(vals))))
        }
      }
    }

  /** '''7. GROUP BY g — counts, sums, mins, maxes, and avgs from
    * stamps'''
    * (round 18): the q171/q173 grouped-count discipline extended to
    * `sum(c)` / `min(c)` / `max(c)` outputs via
    * [[Snapshot.metaGroupAggSplitCols]] — a file feeds its group's
    * accumulators when the GROUPING column is provably single-valued
    * there (clustering stamps + kNulls, or sidecar stamps + witness)
    * AND every requested measure is provable (sum stamp / exact
    * [min,max] stamp present, or witnessed all-NULL: contributing
    * nothing with the NULL-ness flag down, so an all-NULL group
    * answers NULL). Files with DVs, g-nulls in valued files, or
    * missing stamps degrade into one restricted grouped scan merged
    * by an outer aggregate of each shape's own kind. Range-filter
    * composition stays count-only (rewrite #2's machinery). None =
    * guards refuse. */
  private def groupedSumRewrite(agg: Aggregate,
      g: AttributeReference): Option[LogicalPlan] = {
    val unfiltered = relationOf(agg.child)
      .map(r => (r, None: Option[(Long, Long)]))
    def filtered = filteredRelationOf(agg.child).flatMap {
      case (fil, lr, gr) =>
        boundsOf(splitConjunctivePredicates(fil.condition), lr, gr)
          .map(b => ((lr, gr), Some(b): Option[(Long, Long)]))
    }
    unfiltered.orElse(filtered).flatMap { case ((lr, gr), bounds) =>
      val m = gr.pinnedManifest
      // per-output: kind 4 = the key, 3 = count-star; 0 sum / 1 min /
      // 2 max / 5 avg / 6 count(col) with their attribute and OUTPUT
      // dtype; avg records its re-rooted Average by output position
      val avgFns = scala.collection.mutable.Map.empty[Int, Average]
      val momFns = scala.collection.mutable.Map.empty[Int, CentralMomentAgg]
      val litVals = scala.collection.mutable.Map.empty[Int, Literal]
      // scalar-wrapped single-aggregate outputs — see sumRewrite
      val wrappers =
        scala.collection.mutable.Map.empty[Int, (Expression,
          AggregateExpression)]
      def shapeOf(e: NamedExpression, ei: Int)
          : Option[(Int, AttributeReference, DataType)] =
        if (isCountStar(e))
          Some((3, null: AttributeReference, LongType))
        else sumKeyOf(e, lr, gr)
          .map(a => (0, a, sumCodecOf(a).get._1))
          .orElse(rangeKeyOf(e, lr, gr).map { case (a, isMin, dt) =>
            (if (isMin) 1 else 2, a, dt)
          })
          .orElse(countColKeyOf(e, lr, gr).map(a => (6, a, LongType)))
          .orElse(avgKeyOf(e, lr, gr).map { case (a, fn) =>
            avgFns(ei) = fn; (5, a, fn.dataType)
          })
          .orElse(momentKeyOf(e, lr, gr).map { case (a, fn) =>
            momFns(ei) = fn
            (7, a, org.apache.spark.sql.types.DoubleType)
          })
      val shapes: Seq[Option[(Int, AttributeReference, DataType)]] =
        agg.aggregateExpressions.zipWithIndex.map { case (e, ei) =>
          if (isKeyOutput(e, g))
            Some((4, null: AttributeReference, g.dataType))
          else shapeOf(e, ei)
            .orElse(litOf(e).map { l =>
              litVals(ei) = l; (8, null: AttributeReference, l.dataType)
            })
            .orElse(e match {
              case Alias(body, _)
                  if !body.isInstanceOf[AggregateExpression] &&
                    body.deterministic =>
                body.collect { case ae: AggregateExpression => ae } match {
                  case Seq(ae)
                      // the wrapper itself may reference NOTHING
                      // beyond its aggregate (a grouping-attribute
                      // reference could neither fold on the driver
                      // nor resolve against the hybrid merge). The
                      // subset check alone is NOT enough: in
                      // `sum(g) + g GROUP BY g` the references
                      // coincide, yet substituting the merged Sum
                      // tree leaves a bare `g` the hybrid Aggregate
                      // cannot resolve — so additionally require the
                      // body reference-free once the aggregate is
                      // removed
                      if body.references.subsetOf(ae.references) &&
                        body.transform {
                          case x: AggregateExpression if x eq ae =>
                            Literal(null, ae.dataType)
                        }.references.isEmpty =>
                    shapeOf(Alias(ae, "gm_w")(), ei).map { sh =>
                      wrappers(ei) = (body, ae); sh
                    }
                  case _ => None
                }
              case _ => None
            })
        }
      def finish(ei: Int, v: Any): Option[Any] = wrappers.get(ei) match {
        case Some((body, ae)) =>
          try Some(body.transform {
            case x: AggregateExpression if x eq ae =>
              Literal(v, ae.dataType)
          }.eval(InternalRow.empty))
          catch { case scala.util.control.NonFatal(_) => None }
        case None => Some(v)
      }
      def finishExpr(ei: Int, m2e: Expression): Expression =
        wrappers.get(ei) match {
          case Some((body, ae)) => body.transform {
            case x: AggregateExpression if x eq ae => m2e
          }
          case None => m2e
        }
      val keyed = shapes.flatten.filter(k => k._1 <= 2 || k._1 == 5 ||
        k._1 == 6 || k._1 == 7)
      if (shapes.exists(_.isEmpty) || keyed.isEmpty ||
          !groupableDtype(g.dataType) ||
          !lr.output.exists(_.exprId == g.exprId) ||
          // a range FILTER composes only when the grouped column IS
          // the clustering column (bounds and grouping must speak
          // about the same stamps — the q171 discipline)
          (bounds.isDefined && !isClusteringAttr(g, lr, gr))) None
      else if (bounds.exists(b => b._1 > b._2))
        // contradictory range: zero rows, hence zero groups
        Some(LocalRelation(agg.output, Nil))
      else {
        def dedup(as: Seq[AttributeReference]) =
          as.foldLeft(Seq.empty[AttributeReference])((acc, a) =>
            if (acc.exists(_.exprId == a.exprId)) acc else acc :+ a)
        val sumAttrs = dedup(keyed
          .filter(k => k._1 == 0 || k._1 == 5 || k._1 == 7).map(_._2))
        val rngAttrs = dedup(keyed.filter(k => k._1 == 1 || k._1 == 2)
          .map(_._2))
        val cntAttrs = dedup(keyed
          .filter(k => k._1 == 6 || k._1 == 5 || k._1 == 7).map(_._2))
        val sqAttrs = dedup(keyed.filter(_._1 == 7).map(_._2))
        val specs: Seq[Snapshot.StampSpec] =
          sumAttrs.map(a => Snapshot.SumSpec(
            Snapshot.physicalName(m, a.name))) ++
            rngAttrs.map(a => Snapshot.RangeSpec(
              Snapshot.physicalName(m, a.name),
              cluster = isClusteringAttr(a, lr, gr))) ++
            cntAttrs.map(a => Snapshot.CountSpec(
              Snapshot.physicalName(m, a.name),
              cluster = isClusteringAttr(a, lr, gr))) ++
            sqAttrs.map(a => Snapshot.SumSpec(
              Snapshot.physicalName(m, a.name), Snapshot.SqPfx))
        def sumIdxOf(a: AttributeReference): Int =
          sumAttrs.indexWhere(_.exprId == a.exprId)
        def cntIdxOf(a: AttributeReference): Int =
          sumAttrs.length + rngAttrs.length +
            cntAttrs.indexWhere(_.exprId == a.exprId)
        def sqIdxOf(a: AttributeReference): Int =
          sumAttrs.length + rngAttrs.length + cntAttrs.length +
            sqAttrs.indexWhere(_.exprId == a.exprId)
        def specIdx(kind: Int, a: AttributeReference): Int =
          if (kind == 0) sumIdxOf(a)
          else if (kind == 6) cntIdxOf(a)
          else sumAttrs.length + rngAttrs.indexWhere(_.exprId == a.exprId)
        val physG = Snapshot.physicalName(m, g.name)
        val (sums, scan) = Snapshot.metaGroupAggSplitCols(m, physG,
          isClusteringAttr(g, lr, gr), specs, bounds)
        def typed(v: Long): Any = typedKey(v, g.dataType)
        // the raw stamped (sum-buffer, non-null count) pair for an avg
        // OUTPUT within one group's accumulators (hybrid merges these
        // undivided)
        def avgPartOf(cs: Seq[Snapshot.StampAcc], a: AttributeReference,
            ei: Int): Option[(Any, Long)] =
          (cs(sumIdxOf(a)), cs(cntIdxOf(a))) match {
            case (Snapshot.SumAcc(st, any), Snapshot.SumAcc(cnt, _)) =>
              avgSumBuffer(avgFns(ei), a, st, any).map(sv => (sv, cnt))
            case _ => None
          }
        // raw per-group stamped (Σx, Σx², n) triple for a variance
        // OUTPUT — exact integers the hybrid merges undivided
        def momPartOf(cs: Seq[Snapshot.StampAcc], a: AttributeReference)
            : Option[(Any, Any, Long)] =
          (cs(sumIdxOf(a)), cs(cntIdxOf(a)), cs(sqIdxOf(a))) match {
            case (Snapshot.SumAcc(sx, anyX), Snapshot.SumAcc(cnt, _),
                Snapshot.SumAcc(sq, anyQ)) =>
              Some((if (anyX) org.apache.spark.sql.types.Decimal(
                  scala.math.BigDecimal(sx), 38, 0) else null,
                if (anyQ) org.apache.spark.sql.types.Decimal(
                  scala.math.BigDecimal(sq), 38, 0) else null,
                cnt))
            case _ => None
          }
        // decode every group's stamped measures up front — one
        // corrupted stamp refuses the whole rewrite
        def decode(cs: Seq[Snapshot.StampAcc], kind: Int,
            a: AttributeReference, dt: DataType, ei: Int): Option[Any] =
          kind match {
            case 5 => avgPartOf(cs, a, ei).flatMap { case (sv, c) =>
              metaAvgEval(avgFns(ei), sv, c)
            }
            case 7 =>
              (cs(sumIdxOf(a)), cs(cntIdxOf(a)), cs(sqIdxOf(a))) match {
                case (Snapshot.SumAcc(sx, _), Snapshot.SumAcc(cnt, _),
                    Snapshot.SumAcc(sq, _)) =>
                  metaMomentEval(momFns(ei), cnt, sx, sq)
                case _ => None
              }
            case _ => cs(specIdx(kind, a)) match {
              case Snapshot.SumAcc(t, _) if kind == 6 => Some(t: Any)
              case Snapshot.SumAcc(t, any) =>
                if (any) sumCodecOf(a).get._2(t) else Some(null: Any)
              case Snapshot.RangeAcc(mn, mx, any) =>
                if (!any) Some(null: Any)
                else rangeValue(if (kind == 1) mn else mx, dt)
            }
          }
        // RAW per-group cells (wrappers apply at the serving arms: the
        // full arm pushes values through them, the hybrid substitutes
        // the merged trees — locals must stay raw partials)
        val decoded = sums.map { case (k, (n, cs)) =>
          k -> (n, shapes.zipWithIndex.map {
            case (Some((4, _, _)), _) => Some(null: Any) // key: below
            case (Some((3, _, _)), _) => Some(n: Any)
            case (Some((8, _, _)), ei) => Some(litVals(ei).value)
            case (Some((kk, a, dt)), ei) => decode(cs, kk, a, dt, ei)
            case (None, _) => None
          }, shapes.zipWithIndex.collect {
            case (Some((5, a, _)), ei) => ei -> avgPartOf(cs, a, ei)
          }.toMap, shapes.zipWithIndex.collect {
            case (Some((7, a, _)), ei) => ei -> momPartOf(cs, a)
          }.toMap)
        }
        if (decoded.valuesIterator.exists(t => t._2.exists(_.isEmpty) ||
            t._3.valuesIterator.exists(_.isEmpty) ||
            t._4.valuesIterator.exists(_.isEmpty))) None
        else if (scan.size == m.files.size) None
        else if (scan.isEmpty) {
          val rows = decoded.toSeq.map { case (k, (_, vs, _, _)) =>
            shapes.zip(vs).zipWithIndex.map {
              case ((Some((4, _, _)), _), _) =>
                Some(k.map(typed).orNull: Any)
              case ((Some((8, _, _)), Some(v)), _) => Some(v)
              case ((_, Some(v)), ei) => finish(ei, v)
              case _ => return None // unreachable by the guard
            } match {
              case cells if cells.forall(_.isDefined) =>
                InternalRow.fromSeq(cells.map(_.get))
              case _ => return None // a wrapper refused to fold
            }
          }
          Some(LocalRelation(agg.output, rows))
        } else {
          // DECIMAL avg partials merge exactly, and GROUPED variance
          // moments merge exactly too — see sumRewrite's identical
          // notes (round 20): exact DECIMAL(38,0) per-group scan
          // partials under the sq:-stamp-present guard. Wrapped
          // shapes ride the union as RAW partials and the merge
          // substitutes each merged tree into its wrapper.
          locally {
            val momAttrs = shapes.zipWithIndex.collect {
              case (Some((7, a, _)), _) => a
            }
            if (momAttrs.nonEmpty && scan.exists(f => momAttrs.exists(
                a => !m.colStats.contains((f.path,
                  Snapshot.SqPfx + Snapshot.physicalName(m, a.name))))))
              return None
          }
          // avg hybrids (round 20 — the r19 ADVICE low (b) lifted):
          // DOUBLE buffers merge as running double sums; DECIMAL
          // buffers merge as exact decimal sums whose widened union
          // total is bound back to the buffer dtype by Spark's OWN
          // CheckOverflowInSum (mode-matched at the output arm below:
          // legacy null / ANSI raise — the same contract the scan's
          // final sum evaluation applies). Any other buffer dtype
          // refuses.
          if (shapes.zipWithIndex.exists {
                case (Some((5, _, _)), ei) =>
                  val bt = avgFns(ei).aggBufferAttributes.head.dataType
                  bt != org.apache.spark.sql.types.DoubleType &&
                    !bt.isInstanceOf[DecimalType]
                case _ => false
              }) return None
          val cnt = Alias(AggregateExpression(
            Count(Seq(Literal(1L))), Complete, isDistinct = false),
            "gm_part_cnt")()
          val perShape = shapes.zipWithIndex.collect {
            case (Some((k, a, dt)), i)
                if k <= 2 || k == 5 || k == 6 || k == 7 =>
              (k, a, dt, i)
          }
          // slot layout over the partial columns (avg takes two,
          // variance three)
          val slotOf: Map[Int, Int] = {
            var off = 0
            perShape.map { case (k, _, _, i) =>
              val s = i -> off
              off += (if (k == 5) 2 else if (k == 7) 3 else 1); s
            }.toMap
          }
          val scanAggs = perShape.flatMap { case (k, a, dt, i) =>
            if (k == 5) {
              // buffer-typed running sum: DOUBLE for integral
              // children, the exact DECIMAL(p+10, s) for decimal
              // children — see sumRewrite's identical note (round 20)
              val sumChild: Expression =
                if (avgFns(i).aggBufferAttributes.head.dataType ==
                    org.apache.spark.sql.types.DoubleType)
                  Cast(a, org.apache.spark.sql.types.DoubleType)
                else a
              Seq(
                Alias(AggregateExpression(Sum(sumChild), Complete,
                  isDistinct = false), "gm_part")(),
                Alias(AggregateExpression(Count(Seq(a)), Complete,
                  isDistinct = false), "gm_partc")())
            } else if (k == 7) {
              // exact per-group integer moments — see sumRewrite's
              // identical kind-7 note
              val dx = Cast(a, DecimalType(38, 0))
              Seq(
                Alias(AggregateExpression(Sum(dx), Complete,
                  isDistinct = false), "gm_part")(),
                Alias(AggregateExpression(Sum(Multiply(dx, dx)),
                  Complete, isDistinct = false), "gm_partq")(),
                Alias(AggregateExpression(Count(Seq(a)), Complete,
                  isDistinct = false), "gm_partc")())
            } else {
              val child: Expression =
                if ((k == 1 || k == 2) && a.dataType != dt) Cast(a, dt)
                else a
              val fn = k match {
                case 0 => Sum(child); case 1 => Min(child)
                case 2 => Max(child); case _ => Count(Seq(child))
              }
              Seq(Alias(AggregateExpression(fn, Complete,
                isDistinct = false), "gm_part")())
            }
          }
          val newChild = agg.child.transformUp {
            case l: LogicalRelation if l eq lr =>
              l.copy(relation = gr.restrictedTo(scan.map(_.path).toSet))
          }
          val scanAgg = Aggregate(Seq(g), g +: cnt +: scanAggs, newChild)
          val localOut =
            AttributeReference("gm_k", g.dataType)() +:
              AttributeReference("gm_c", LongType, nullable = false)() +:
              perShape.flatMap { case (k, _, dt, i) =>
                if (k == 5)
                  Seq(AttributeReference(s"gm_p$i",
                      avgFns(i).aggBufferAttributes.head.dataType)(),
                    AttributeReference(s"gm_p${i}c", LongType,
                      nullable = false)())
                else if (k == 7)
                  Seq(AttributeReference(s"gm_p$i", DecimalType(38, 0))(),
                    AttributeReference(s"gm_p${i}q", DecimalType(38, 0))(),
                    AttributeReference(s"gm_p${i}c", LongType,
                      nullable = false)())
                else Seq(AttributeReference(s"gm_p$i", dt)())
              }
          val local = LocalRelation(localOut,
            decoded.toSeq.map { case (k, (n, vs, ps, ms)) =>
              InternalRow.fromSeq(
                k.map(typed).orNull +: (n: Any) +:
                  perShape.flatMap { case (kk, _, _, i) =>
                    if (kk == 5) {
                      val (sv, c) = ps(i).get // clean by the guard
                      Seq(sv, c: Any)
                    } else if (kk == 7) {
                      val (sx, sq, c) = ms(i).get // clean by the guard
                      Seq(sx, sq, c: Any)
                    } else Seq(vs(i).get)
                  })
            })
          val un = Union(Seq(scanAgg, local))
          val uk = un.output.head
          val uc = un.output(1)
          def colOf(i: Int): Attribute = un.output(2 + slotOf(i))
          def colOf2(i: Int): Attribute = un.output(3 + slotOf(i))
          def colOf3(i: Int): Attribute = un.output(4 + slotOf(i))
          val outs = agg.aggregateExpressions.zip(shapes).zipWithIndex
            .map {
              case ((e, Some((4, _, _))), _) =>
                Alias(uk, e.name)(exprId = e.exprId)
              case ((e, Some((3, _, _))), i) =>
                Alias(finishExpr(i, Coalesce(Seq(AggregateExpression(
                  Sum(uc), Complete, isDistinct = false), Literal(0L)))),
                  e.name)(exprId = e.exprId)
              case ((e, Some((0, _, dt))), i) =>
                // cast the widened union-merge Sum back — see
                // sumRewrite's identical note
                Alias(finishExpr(i, Cast(AggregateExpression(
                  Sum(colOf(i)), Complete, isDistinct = false), dt)),
                  e.name)(exprId = e.exprId)
              case ((e, Some((6, _, _))), i) =>
                Alias(finishExpr(i, Coalesce(Seq(AggregateExpression(
                  Sum(colOf(i)), Complete, isDistinct = false),
                  Literal(0L)))), e.name)(exprId = e.exprId)
              case ((e, Some((8, _, _))), i) =>
                Alias(litVals(i), e.name)(exprId = e.exprId)
              case ((e, Some((5, _, _))), i) =>
                // Average's OWN final-value tree over the merged
                // per-group (sum, count) — see sumRewrite
                val fn = avgFns(i)
                val buf = fn.aggBufferAttributes
                val rawSum: Expression = AggregateExpression(
                  Sum(colOf(i)), Complete, isDistinct = false)
                val sumAgg: Expression = buf(0).dataType match {
                  case dt: DecimalType =>
                    // bind the widened union total back to the buffer
                    // dtype with the scan's own overflow contract —
                    // Spark's CheckOverflowInSum, mode-matched
                    org.apache.spark.sql.catalyst.expressions
                      .CheckOverflowInSum(rawSum, dt,
                        !session.sessionState.conf.ansiEnabled, null)
                  case _ => rawSum
                }
                val cntAgg: Expression = Coalesce(Seq(
                  AggregateExpression(Sum(colOf2(i)), Complete,
                    isDistinct = false), Literal(0L)))
                val ev = (fn: DeclarativeAggregate).evaluateExpression
                  .transform {
                    case r: AttributeReference
                        if r.exprId == buf(0).exprId => sumAgg
                    case r: AttributeReference
                        if r.exprId == buf(1).exprId => cntAgg
                  }
                Alias(finishExpr(i, ev), e.name)(exprId = e.exprId)
              case ((e, Some((7, _, _))), i) =>
                // per-group merged exact moments through the SAME
                // deterministic chain — see sumRewrite's kind-7 arm
                val fn = momFns(i)
                val buf = fn.aggBufferAttributes
                val zeroD = Literal.create(
                  org.apache.spark.sql.types.Decimal(0L, 38, 0),
                  DecimalType(38, 0))
                val sxAgg: Expression = Coalesce(Seq(AggregateExpression(
                  Sum(colOf(i)), Complete, isDistinct = false), zeroD))
                val sqAgg: Expression = Coalesce(Seq(AggregateExpression(
                  Sum(colOf2(i)), Complete, isDistinct = false), zeroD))
                val cntAgg: Expression = Coalesce(Seq(AggregateExpression(
                  Sum(colOf3(i)), Complete, isDistinct = false),
                  Literal(0L)))
                val nD = Cast(cntAgg, DoubleType)
                val avgE = If(EqualTo(cntAgg, Literal(0L)),
                  Literal(0.0), Divide(Cast(sxAgg, DoubleType), nD))
                val m2E = graft.expressions.MomentM2(cntAgg, sxAgg, sqAgg)
                val ev2 = (fn: DeclarativeAggregate).evaluateExpression
                  .transform {
                    case r: AttributeReference
                        if r.exprId == buf(0).exprId => nD
                    case r: AttributeReference
                        if r.exprId == buf(1).exprId => avgE
                    case r: AttributeReference
                        if r.exprId == buf(2).exprId => m2E
                  }
                Alias(finishExpr(i, ev2), e.name)(exprId = e.exprId)
              case ((e, Some((k, _, _))), i) =>
                val fn: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction =
                  if (k == 1) Min(colOf(i)) else Max(colOf(i))
                Alias(finishExpr(i, AggregateExpression(fn, Complete,
                  isDistinct = false)), e.name)(exprId = e.exprId)
              case ((_, None), _) => return None // unreachable
            }
          Some(Aggregate(Seq(uk), outs, un))
        }
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, exprs, child, _) if exprs.nonEmpty &&
        exprs.forall(e => isCountStar(e) || litOf(e).isDefined) &&
        exprs.exists(isCountStar) =>
      metaCountOf(child) match {
        case Some(n) => countRows(agg.aggregateExpressions, agg.output, n)
        case None    => filteredCountRewrite(agg).getOrElse(agg)
      }
    case agg @ Aggregate(Nil, exprs, _, _) if exprs.nonEmpty =>
      minMaxRewrite(agg).orElse(distinctCountRewrite(agg))
        .orElse(approxDistinctRewrite(agg))
        .orElse(sumRewrite(agg)).getOrElse(agg)
    case agg @ Aggregate(Seq(g: AttributeReference), exprs, _, _)
        if exprs.nonEmpty &&
          exprs.forall(e => isKeyOutput(e, g) || isCountStar(e) ||
            litOf(e).isDefined) =>
      groupedCountRewrite(agg, g).getOrElse(agg)
    case agg @ Aggregate(Seq(g: AttributeReference), exprs, _, _)
        if exprs.nonEmpty =>
      groupedApproxDistinctRewrite(agg, g)
        .orElse(groupedSumRewrite(agg, g)).getOrElse(agg)
  }
}

object MetadataOnlyCountRule {
  /** Opt-in gate for the approx-distinct sidecar rewrite: serve
    * `approx_count_distinct(col)` over a fully-sketched graft
    * relation from the HLL sidecar merge. DEFAULT OFF — the sidecar
    * estimate differs from Spark's HLL++ estimate, so the swap must
    * be an explicit per-session choice, never silent. */
  val ApproxDistinctSketchKey = "spark.graft.rewrite.approxDistinctSketch"
}
