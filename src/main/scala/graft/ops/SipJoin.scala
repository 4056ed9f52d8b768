package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{broadcast, col, lit, max, min}
import org.apache.spark.sql.types.DataType

import graft.sources.SourcePruning

/** Sideways information passing (SIP) for fact ⋈ small-dim joins:
  * dynamic FILE pruning on the snapshot source.
  *
  * The 100 TB problem: `fact JOIN dim ON fact.k = dim.k WHERE dim.x = …`
  * broadcasts the filtered dim, but the FACT side still scans every
  * file — Spark's static pushdown sees no literal predicate on `fact.k`
  * (the keys live in the dim's rows, not the query text), and its
  * runtime bloom filters (`InjectRuntimeFilter`) prune ROWS after the
  * scan, never files. Classic sideways information passing (the
  * semi-join reduction of Bernstein & Chiu 1981; Trino's dynamic
  * filtering, Databricks' dynamic file pruning) closes the gap: run the
  * small side first, hand its key summary to the big side's scan as an
  * ordinary predicate, and let the existing metadata machinery skip
  * files at PLANNING time.
  *
  * This verb is that pass made explicit, composed entirely from
  * machinery the engine already has:
  *
  *  1. one dim-sized job summarizes the dim's join keys ([[dimKeys]]):
  *     up to `maxKeys` distinct values verbatim (the IN-list), else
  *     their [min,max] envelope (the range fallback);
  *  2. the summary becomes a REDUNDANT predicate on the fact's key
  *     column — `k IN (…)` or `k BETWEEN lo AND hi` — that Spark pushes
  *     into the graft relation, where IN-lists prune by range candidacy
  *     AND per-file Bloom sidecars ([[SourcePruning.candidates]]: a file
  *     whose key range overlaps but whose sketch holds none of the keys
  *     is skipped), and ranges prune by the write-path min/max stamps;
  *  3. the join itself runs unchanged on the pruned scan, dim side
  *     broadcast.
  *
  * Soundness: the predicate only ever removes fact rows whose key is
  * ABSENT from the dim, which an inner/semi equi-join drops anyway
  * (and a NULL fact key, which never equi-matches) — so the rewrite is
  * semantics-preserving for `inner` and `left_semi` joins and REFUSED
  * for every other join type (an outer join must keep non-matching
  * fact rows). An empty dim short-circuits to `lit(false)`, which
  * Catalyst folds to an empty LocalRelation: zero files planned, zero
  * tasks run.
  *
  * Cost discipline: the driver-side collect is bounded by `maxKeys + 1`
  * rows — the same keys a broadcast join is about to ship to every
  * executor, so the pass costs what the broadcast build already costs.
  * Above `maxKeys` distinct keys, one extra dim-sized min/max aggregate
  * replaces the verbatim list; candidacy work on the driver is then one
  * range intersection per file instead of up-to-`maxKeys` Bloom probes.
  * At 100 TB the win is the fact side: a dim slice touching 0.1% of the
  * key space opens ~0.1% of a range-clustered fact table's files instead
  * of all of them.
  *
  * The reference has no distributed-join notion at all (every join runs
  * inside single-node PostgreSQL, patient_claims_plus_postgres.py —
  * SURVEY §1); this is the piece a 1000-executor deployment of the same
  * star-schema workload needs first.
  */
object SipJoin {

  /** A dim side's join-key summary — what gets passed sideways. */
  sealed trait DimKeys {
    /** Distinct non-null key count this summary witnessed (exact for
      * [[KeyList]]/[[EmptyDim]]; a lower bound `maxKeys + 1` when the
      * list overflowed into [[KeyRange]]). */
    def nSeen: Long
  }
  /** No non-null keys: the join is provably empty, no scan needed. */
  case object EmptyDim extends DimKeys { def nSeen = 0L }
  /** ≤ maxKeys distinct keys, verbatim — prunes by range AND Bloom. */
  final case class KeyList(keys: Seq[Any]) extends DimKeys {
    def nSeen: Long = keys.length.toLong
  }
  /** The overflow envelope — prunes by range candidacy only. */
  final case class KeyRange(lo: Any, hi: Any, nSeen: Long) extends DimKeys

  /** Summarize `dim`'s join keys, cast to the fact key's `keyType` so
    * the derived predicate pushes down without an analyzer cast on the
    * fact column (a cast-wrapped column is not a translatable source
    * filter — the scan would read everything). NULL keys drop here:
    * they never equi-match. One dim-sized job (the bounded distinct
    * collect); a second (min/max) only on overflow. */
  def dimKeys(dim: DataFrame, dimKey: String, keyType: DataType,
              maxKeys: Int = 1024): DimKeys = {
    require(maxKeys > 0, s"maxKeys must be positive, got $maxKeys")
    val ks = dim.select(col(dimKey).cast(keyType).as("k"))
      .where(col("k").isNotNull)
    val sample = ks.distinct().limit(maxKeys + 1).collect()
    if (sample.isEmpty) EmptyDim
    else if (sample.length <= maxKeys)
      KeyList(sample.map(_.get(0)).toSeq)
    else {
      val r = ks.agg(min(col("k")).as("lo"), max(col("k")).as("hi")).head()
      KeyRange(r.get(0), r.get(1), maxKeys + 1L)
    }
  }

  /** The sideways predicate over the fact's key column. Redundant with
    * the join condition by construction — it can prune, never change
    * an answer. */
  def predicate(factKey: Column, keys: DimKeys): Column = keys match {
    case EmptyDim             => lit(false)
    case KeyList(vs)          => factKey.isin(vs: _*)
    case KeyRange(lo, hi, _)  => factKey >= lit(lo) && factKey <= lit(hi)
  }

  /** The file set a graft scan under this summary's predicate plans —
    * the SPEC/QUERY witness, computed by the same candidacy code the
    * relation's own `buildScan` runs ([[SourcePruning.candidates]]),
    * so pinning this pins the executed scan's file set. */
  def plannedFiles(m: Snapshot.Manifest, factKey: String,
                   keys: DimKeys): Seq[Snapshot.FileEntry] = keys match {
    case EmptyDim => Seq.empty
    case KeyList(vs) =>
      SourcePruning.candidates(m,
        Seq(org.apache.spark.sql.sources.In(factKey, vs.toArray)))
    case KeyRange(lo, hi, _) =>
      SourcePruning.candidates(m,
        Seq(org.apache.spark.sql.sources.GreaterThanOrEqual(factKey, lo),
          org.apache.spark.sql.sources.LessThanOrEqual(factKey, hi)))
  }

  /** The SIP join with a precomputed key summary (reuse one summary
    * across several facts, or pair with [[plannedFiles]] for the
    * witness without a second dim job). Inner/left_semi only — the
    * pruning predicate is unsound for join types that keep
    * non-matching fact rows. */
  def sipJoinWith(fact: DataFrame, dim: DataFrame,
                  factKey: String, dimKey: String,
                  keys: DimKeys, joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replaceAll("[_ ]", "")
    require(jt == "inner" || jt == "semi" || jt == "leftsemi",
      s"SIP pruning is sound for inner/left_semi joins only, got $joinType" +
        " (an outer join must keep fact rows the predicate would drop)")
    val pruned = fact.filter(predicate(fact(factKey), keys))
    pruned.join(broadcast(dim), pruned(factKey) === dim(dimKey), joinType)
  }

  /** The one-call form: summarize `dim(dimKey)`, prune `fact`'s scan
    * sideways, broadcast-join. Key columns are matched by exact name;
    * dim keys cast to the fact key's type (see [[dimKeys]]). */
  def sipJoin(fact: DataFrame, dim: DataFrame,
              factKey: String, dimKey: String,
              maxKeys: Int = 1024, joinType: String = "inner"): DataFrame =
    sipJoinWith(fact, dim, factKey, dimKey,
      dimKeys(dim, dimKey, fact.schema(factKey).dataType, maxKeys), joinType)
}
