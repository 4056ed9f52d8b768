package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Fns => F, QueryModule, Tables => T}

/** Corpus-level curation statistics and selection (q86-q89, q91-q92):
  * benchmark decontamination, deterministic stratified sampling,
  * length-distribution profiling, TF-IDF term scoring, sequence packing,
  * and the data-mixture report — the corpus-wide counterparts of the
  * per-document ops in [[TextOps]] and the dedup chain in [[Dedup]].
  *
  * Mandated extension surface (SURVEY.md §2-B "text analysis" /
  * "training-data pipeline"); the reference has no corpus ops — its TEXT
  * columns (/root/reference/dags/patient_claims_plus_postgres.py:85-93) are
  * the kind of data these operators curate.
  *
  * Scale notes per query are inline; the common discipline: the corpus side
  * is only ever scanned (stateless projections + generators), small derived
  * sides (eval-set n-grams, document-frequency table, language count) are
  * broadcast, and every shuffle carries fixed-width keys/counts with
  * map-side combine — never document bodies. All oracled outputs follow
  * §7.5: exact integer micro-units, no transcendentals, no round(double).
  */
object Corpus extends QueryModule {

  /** Tokens column `toks` -> distinct n-gram strings; empty (typed) array
    * when the document is shorter than one gram. The `when` guard matters:
    * `sequence(0, size-n)` with size<n would produce a DESCENDING sequence
    * (sequence picks step -1 when start>stop), not an empty one. */
  private def distinctGrams(toksCol: String, n: Int) =
    when(size(col(toksCol)) >= n, expr(
      s"array_distinct(transform(sequence(0, size($toksCol) - $n), " +
        s"i -> concat_ws(' ', slice($toksCol, i + 1, $n))))"))
      .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))

  /** Benchmark decontamination: flag training documents whose token-level
    * n-gram overlap with a held-out eval set reaches τ = `tauNum/tauDen` —
    * the standard eval-leak pass an LLM training pipeline runs before
    * training. `docs` needs (doc_id, text); `evalDocs` needs (text) and is
    * expected to be benchmark-sized.
    *
    * 100 TB shape: the eval side is tiny (benchmarks are MBs, corpora are
    * TBs) -> broadcast its distinct grams; the corpus side explodes grams
    * and probes the broadcast map-side (left join carries a hit flag so
    * zero-hit docs survive; explode_outer so gram-free docs survive). The
    * ONLY shuffle is the per-doc count agg, whose rows are (doc_id,
    * n_grams, partial count) — fixed width, map-side combined, never gram
    * text (CorpusSpec pins that on the executed plan). No corpus-sized
    * join-back. τ as an exact integer ratio keeps the verdict engine-exact
    * (§7.5: no float compare). */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, gramN: Int = 5,
                    tauNum: Int = 1, tauDen: Int = 2): DataFrame = {
    val grams = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("grams", distinctGrams("toks", gramN))
    val evalGrams = evalDocs
      .withColumn("toks", split(col("text"), " "))
      .select(explode(distinctGrams("toks", gramN)).as("gram")).distinct()
      .withColumn("hit", lit(1))
    grams
      .select(col("doc_id"), size(col("grams")).cast(LongType).as("n_grams"),
        explode_outer(col("grams")).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(count(col("hit")).as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        expr("CAST(n_hit * 1000000 DIV nullif(n_grams, 0) AS BIGINT)")
          .as("contam_micro"),
        (col("n_hit") * tauDen >= col("n_grams") * tauNum && col("n_grams") > 0)
          .as("contaminated"))
  }

  /** Deterministic stratified sampling: exactly `n` rows per stratum,
    * chosen by md5(doc_id) hash order — replayable on any engine, no RNG
    * state, insertion-order-free. The companion `in_p10` flag is the
    * Bernoulli variant (first 16 hash bits < 0.1 · 2^16): a stateless
    * per-row filter, which is the 100 TB path — exact-N-per-stratum needs
    * a per-stratum rank (bounded strata only: languages, sources, shards),
    * while hash-threshold sampling costs one scan at any scale and
    * composes with pushdown. */
  def stratifiedSample(docs: DataFrame, strataCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("hk").asc, col("doc_id").asc)
    docs
      .select(col("doc_id"), col(strataCol),
        md5(col("doc_id").cast(StringType)).as("hk"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= n)
      .select(col("doc_id"), col(strataCol), col("rk"), col("hk"),
        (expr("CAST(conv(substr(hk, 1, 4), 16, 10) AS BIGINT)") < 6554)
          .as("in_p10"))
  }

  /** Per-stratum length-distribution profile: nearest-rank percentiles
    * (p = value at row ceil(p·n) of the per-stratum sort — integer-exact
    * in both engines, unlike interpolated quantiles whose float formula is
    * engine-private), plus exact micro-unit mean. The per-stratum window
    * is bounded (languages), never a global sort. At 100 TB the same
    * profile runs on `approx_percentile` (KLL/GK sketch, one pass,
    * mergeable across partitions) — CorpusSpec pins the sketch within 5%
    * of these exact ranks, q28-style. */
  def lengthProfile(docs: DataFrame, strataCol: String = "lang"): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    def atRank(pct: Int) = max(when(
      col("rk") === expr(s"(n * $pct + 99) DIV 100"), col("n_chars")))
    docs
      .select(col(strataCol), col("n_chars"), col("doc_id"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(strataCol)))
        .cast(LongType))
      .groupBy(col(strataCol))
      .agg(
        max(col("n")).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        expr("CAST(sum(n_chars) * 1000000 DIV count(1) AS BIGINT)")
          .as("mean_micro"),
        atRank(50).as("p50"), atRank(90).as("p90"), atRank(99).as("p99"))
  }

  /** Sequence packing: stream documents in doc_id order into fixed
    * `binTokens`-token training bins (a doc belongs to the bin where it
    * STARTS — the contiguous-fill discipline a sequence-packing loader
    * uses).
    *
    * 100 TB shape: packing does NOT need a global order — training wants
    * locality, not total order — so docs pack within hash shards of
    * BOUNDED size (doc_id DIV `shardDocs`, i.e. ≤shardDocs docs per (lang,
    * shard) window partition by construction). The window never sees a
    * corpus-sized partition no matter how big one language is; a global
    * per-lang cumsum would funnel 90% of a real corpus (lang=en) through
    * one task. Output key (lang, shard, pack_no) is unique and replayable
    * on any engine. */
  def packSequences(docs: DataFrame, binTokens: Int = 512,
                    shardDocs: Int = 100): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), col("lang"),
        (col("doc_id") / shardDocs).cast(LongType).as("shard"),
        F.nTokens(col("text")).as("n_toks"))
      .withColumn("tok_before", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .withColumn("pack_no", expr(s"tok_before DIV $binTokens"))
      .groupBy(col("lang"), col("shard"), col("pack_no"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("tok_count"),
        min(col("doc_id")).as("doc_lo"), max(col("doc_id")).as("doc_hi"))
  }

  /** Per-DOCUMENT packing manifest (q118) — the artifact a dataloader
    * actually consumes: [[packSequences]] summarizes each pack; training
    * needs the inverse map, doc → (pack, in-pack offset), so sample
    * boundaries and attention masks can be rebuilt at read time without
    * re-tokenizing. Same greedy boundary rule and window machinery as
    * q91 (cumulative tokens over (lang, shard) in doc order), one extra
    * stateless projection: offset = tok_before − pack_no·binTokens.
    * All-integer arithmetic, so the oracle reproduces every row exactly;
    * CorpusSpec pins manifest↔summary consistency (per-pack doc counts
    * and token sums agree with q91, offsets tile each pack gaplessly).
    * 100 TB shape: identical to q91 — the window partitions are bounded
    * at `shardDocs` documents BY CONSTRUCTION, never corpus-sized. */
  def packManifest(docs: DataFrame, binTokens: Int = 512,
                   shardDocs: Int = 100): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), col("lang"),
        (col("doc_id") / shardDocs).cast(LongType).as("shard"),
        F.nTokens(col("text")).as("n_toks"))
      .withColumn("tok_before", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .withColumn("pack_no", expr(s"tok_before DIV $binTokens"))
      .withColumn("offset",
        col("tok_before") - col("pack_no") * lit(binTokens.toLong))
      .select(col("lang"), col("shard"), col("pack_no"), col("doc_id"),
        col("n_toks"), col("offset"))
  }

  /** Data-mixture report: per (source, lang) document/token/char counts
    * plus each cell's exact micro-unit share of the corpus token budget —
    * the mixture table every pretraining run is configured from.
    *
    * 100 TB shape: one agg whose shuffle is bounded by sources × langs
    * (map-side combined); the corpus-total denominator is a 1-row
    * broadcast cross join, not a global window over the corpus. */
  def mixReport(docs: DataFrame): DataFrame = {
    val cell = docs
      .select(col("source"), col("lang"),
        F.nTokens(col("text")).as("n_toks"),
        col("n_chars"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("tok_sum"),
        sum(col("n_chars")).as("char_sum"))
    val total = cell.agg(sum(col("tok_sum")).as("tok_total"))
    cell.crossJoin(broadcast(total))
      .select(col("source"), col("lang"), col("n_docs"), col("tok_sum"),
        col("char_sum"),
        expr("CAST(tok_sum * 1000000 DIV tok_total AS BIGINT)")
          .as("share_micro"))
  }

  /** Mixture rebalancing: deterministically downsample each source toward
    * an equal share of the corpus token budget — the knob a pretraining
    * run turns after reading [[mixReport]]. Over-represented sources get
    * an acceptance ratio = target/actual (exact micro-unit integers,
    * floor-divided); each document then keeps or drops by the same
    * md5-threshold rule as [[stratifiedSample]]'s Bernoulli flag, so the
    * sample is replayable on any engine and composes with pushdown.
    *
    * 100 TB shape: cell stats are a strata-bounded agg broadcast back onto
    * the corpus; the keep decision is a stateless per-row filter; the
    * final report is a second strata-bounded agg. The corpus is scanned,
    * never shuffled. */
  def rebalanceMix(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      F.nTokens(col("text")).as("n_toks"))
    val cell = toks.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("tok_sum"))
    val tot = cell.agg(sum(col("tok_sum")).as("tok_total"),
      count(lit(1)).as("n_sources"))
    val thresh = cell.crossJoin(broadcast(tot))
      .withColumn("share_micro",
        expr("CAST(tok_sum * 1000000 DIV tok_total AS BIGINT)"))
      .withColumn("accept_micro", least(lit(1000000L),
        expr("CAST(1000000000000 DIV nullif(n_sources * share_micro, 0) AS BIGINT)")))
      .withColumn("thresh16",
        expr("CAST(accept_micro * 65536 DIV 1000000 AS BIGINT)"))
      .select(col("source"), col("n_docs"), col("tok_sum"),
        col("share_micro"), col("accept_micro"), col("thresh16"))
    val kept = toks.join(broadcast(thresh), Seq("source"))
      .withColumn("hk16", expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT)"))
      .withColumn("keep", col("hk16") < col("thresh16"))
      .groupBy(col("source"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_toks")).otherwise(0L)).as("kept_toks"))
    val keptTot = kept.agg(sum(col("kept_toks")).as("kept_total"))
    thresh.join(kept, Seq("source"), "left")
      .crossJoin(broadcast(keptTot))
      .select(col("source"), col("n_docs"), col("tok_sum"), col("share_micro"),
        col("accept_micro"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_toks"), lit(0L)).as("kept_toks"),
        expr("CAST(coalesce(kept_toks, 0) * 1000000 DIV nullif(kept_total, 0) AS BIGINT)")
          .as("kept_share_micro"))
  }

  /** Temperature-tempered mixture sampling (q115) — the multilingual
    * rebalancing every LLM data recipe runs: sample stratum s with
    * probability ∝ (mass_s)^α / mass_s, α = 0.5, so low-resource strata
    * keep everything and high-resource strata downsample toward the
    * tempered target (w_s = √tok_s normalized). [[rebalanceMix]] is the
    * α = 0 limit of the same idea (equal shares); tempering is what
    * production mixtures actually use — α = 0 starves big strata, α = 1
    * changes nothing.
    *
    * §7.5 reproducibility: √ is NOT a transcendental — IEEE 754 requires
    * sqrt correctly rounded, so both engines produce the identical
    * double. Every other float step is a per-stratum scalar expression
    * spelled identically in both engines over exact integer inputs; the
    * two cross-stratum reductions are an ORDERED fold for Σ√ (sort_array
    * + aggregate ≍ list(… ORDER BY lang) + list_reduce — never an
    * unordered float SUM, q101's discipline) and a max (order-free).
    * Rates quantize to micro, thresholds to 16 bits, acceptance =
    * md5-hash-key < threshold (q87/q98/q100's deterministic sampler).
    * The most under-represented stratum gets ratio_max ⇒ rate 1.0 ⇒
    * keeps everything: downsample-only tempering, no upsampling.
    *
    * 100 TB shape: stratum stats are vocabulary-bounded aggregates with
    * map-side combine; the Σ√/max/total frames are tiny broadcasts; the
    * accept filter is one stateless scan (each doc hashes its own id) —
    * no corpus-sized shuffle anywhere. */
  /** The registered q115 frame per (session, fixture dir): the `rated`
    * checkpoint inside [[mixTemperature]] pins a (tiny, strata-bounded)
    * RDD per construction; the fixture is immutable, so the constructed
    * frame is memoized like Similarity's probe-cell/codebook caches —
    * one pinned block set per (session, dir), weak keys unpin stopped
    * sessions. Direct [[mixTemperature]] callers (tests, ad-hoc frames)
    * are unaffected. */
  private val mixTempCache =
    new scala.collection.mutable.WeakHashMap[org.apache.spark.sql.SparkSession,
      scala.collection.mutable.Map[String, DataFrame]]
  private[graft] def mixTemperatureCached(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    synchronized {
      mixTempCache.getOrElseUpdate(s, scala.collection.mutable.Map.empty)
        .getOrElseUpdate(d, mixTemperature(T.documents(s, d)))
    }

  def mixTemperature(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast(LongType).as("n_toks"))
    val cell = t.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("tok_sum"))
    val tokTotal = cell.agg(sum(col("tok_sum")).as("tok_total"))
    val w = cell.withColumn("w", sqrt(col("tok_sum").cast(DoubleType)))
    val wTotal = w.agg(
      expr("aggregate(sort_array(collect_list(struct(lang, w))), " +
        "CAST(0.0 AS DOUBLE), (a, x) -> a + x.w)").as("w_total"))
    val sh = w.crossJoin(broadcast(wTotal)).crossJoin(broadcast(tokTotal))
      .withColumn("ratio",
        (col("w") / col("w_total")) /
          (col("tok_sum").cast(DoubleType) / col("tok_total").cast(DoubleType)))
    val rmax = sh.agg(max(col("ratio")).as("ratio_max"))
    // the stats chain (cell → w/totals → ratio → rate) is consumed by
    // BOTH the gate join and the final report, and Spark reuses none of
    // it: the un-checkpointed plan re-derived the stratum stats 13
    // parquet-scans deep (round-9 Plans audit). The frame is
    // strata-bounded (≤ #langs rows), so materializing it once is the
    // same call the probe-cell/codebook caches make — one tiny job at
    // construction, every arm reads the checkpoint.
    val rated = sh.crossJoin(broadcast(rmax))
      .withColumn("rate_micro",
        floor(col("ratio") / col("ratio_max") * lit(1000000.0)).cast(LongType))
      .withColumn("thresh16",
        expr("CAST(rate_micro * 65536 DIV 1000000 AS BIGINT)"))
      .localCheckpoint(true)
    val kept = t
      .join(broadcast(rated.select(col("lang"), col("thresh16"))), Seq("lang"))
      .withColumn("hk16", expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT)"))
      .filter(col("hk16") < col("thresh16"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_toks")).as("kept_toks"))
    rated.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("tok_sum"), col("rate_micro"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_toks"), lit(0L)).as("kept_toks"))
  }

  /** TF-IDF term scoring per stratum: tf = term count within the stratum,
    * df = number of strata containing the term, idf as the EXACT
    * micro-scaled inverse ratio n_strata·10⁶ DIV df (linear damping —
    * §7.5 bans transcendentals in oracled outputs; ln-idf is a one-line
    * swap where cross-engine bit-equality isn't contracted). Top-`k` terms
    * per stratum by (score desc, term asc).
    *
    * 100 TB shape: tf shuffles (lang, term, partial) — bounded by strata ×
    * vocabulary with map-side combine, never the corpus; df aggregates tf
    * (vocabulary-bounded) and joins BACK to tf broadcast; the stratum
    * count is a 1-row broadcast cross join; final rank is a per-stratum
    * window (bounded strata). */
  def tfidfTopK(docs: DataFrame, k: Int = 10): DataFrame = {
    val tf = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nl = docs.agg(countDistinct(col("lang")).as("n_strata"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(nl))
      .withColumn("idf_micro",
        expr("CAST(n_strata * 1000000 DIV df AS BIGINT)"))
      .withColumn("score", col("tf") * col("idf_micro"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk"), col("term"), col("tf"), col("df"),
        col("idf_micro"), col("score"))
  }

  /** BM25 retrieval scoring (Robertson/Spärck Jones; k1 = 1.2, b = 0.75,
    * Lucene's log-idf form): score every document against a deterministic
    * query — the `nTerms` globally-most-frequent tokens (count desc,
    * token asc) — and emit the top `k` docs per language stratum. §7.5
    * reproducibility:
    *  - idf IS the standard ln(1 + (N − df + 0.5)/(df + 0.5)) — but
    *    computed by [[lnDet]], a DETERMINISTIC ln, not libm's (whose
    *    last-ulp behavior is implementation-specific and would break the
    *    cross-engine score hash). The identity ln(1 + (N−df+½)/(df+½)) =
    *    ln(2N+2) − ln(2df+1) turns both arguments into exact INTEGERS,
    *    and lnDet needs only bit-length, one exact power-of-two division
    *    and a fixed-order atanh polynomial — all IEEE-defined ops spelled
    *    identically in both engines, so the doubles match bit for bit
    *    while sitting within 7e-9 of true ln (atanh tail bound; the
    *    round-9 "non-log-idf variant" caveat is CLOSED — multi-term
    *    ranking is standard BM25's);
    *  - every float expression is spelled identically in both engines
    *    over exact integer inputs (tf, dl, df, N), so the doubles match
    *    bit for bit;
    *  - the per-doc sum over matched query terms folds in TOKEN order
    *    (sort_array + aggregate HOF ≍ DuckDB list(… ORDER BY tok) +
    *    list_reduce) — never an unordered float SUM, whose grouping order
    *    is engine- and partition-dependent.
    * 100 TB shape: the doc×term tf aggregate is the only corpus-sized
    * shuffle (fixed-width rows, map-side combined); term stats are
    * vocabulary-bounded and the 5-term query + 1-row corpus stats
    * BROADCAST; the per-lang top-k is a rank-≤-k window that plans
    * map-side WindowGroupLimit pruning (q31's shape — CorpusSpec pins
    * it), so no task ever holds more than k rows per lang. */
  /** Deterministic natural log of a positive INTEGER column expression,
    * appended as column `out` — no libm. m = 2^k · t with k = bitlength−1
    * and t ∈ [1,2): the 2^k division is exact, ln(t) = 2·atanh(z) with
    * z = (t−1)/(t+1) ∈ [0,⅓) truncated at z¹³ (tail ≤ 7e-9 — far inside
    * double noise for any ranking use), ln2 a fixed double literal. Every
    * step is integer arithmetic or a single correctly-rounded IEEE op in
    * a fixed order, so any engine spelling this identically produces the
    * identical bits — the property the q101 score hash rides on. */
  private[graft] def lnDet(dfIn: DataFrame, mExpr: String,
                           out: String): DataFrame =
    dfIn
      .withColumn("__m", expr(mExpr))
      .withColumn("__k", expr("length(bin(__m)) - 1"))
      .withColumn("__t", expr("CAST(__m AS DOUBLE) / " +
        "CAST(shiftleft(CAST(1 AS BIGINT), CAST(__k AS INT)) AS DOUBLE)"))
      .withColumn("__z",
        expr("(__t - CAST(1 AS DOUBLE)) / (__t + CAST(1 AS DOUBLE))"))
      .withColumn("__zz", expr("__z * __z"))
      .withColumn(out, expr(
        "CAST(__k AS DOUBLE) * CAST(0.6931471805599453 AS DOUBLE) + " +
          "__z * (CAST(2 AS DOUBLE) + __zz*(CAST(2 AS DOUBLE)/CAST(3 AS DOUBLE) + " +
          "__zz*(CAST(2 AS DOUBLE)/CAST(5 AS DOUBLE) + " +
          "__zz*(CAST(2 AS DOUBLE)/CAST(7 AS DOUBLE) + " +
          "__zz*(CAST(2 AS DOUBLE)/CAST(9 AS DOUBLE) + " +
          "__zz*(CAST(2 AS DOUBLE)/CAST(11 AS DOUBLE) + " +
          "__zz*(CAST(2 AS DOUBLE)/CAST(13 AS DOUBLE))))))))"))
      .drop("__m", "__k", "__t", "__z", "__zz")

  def bm25TopK(docs: DataFrame, nTerms: Int = 5, k: Int = 20): DataFrame = {
    val dt = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("dl", size(col("toks")).cast(LongType))
      .select(col("doc_id"), col("lang"), col("dl"),
              explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("lang"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val qterms = dt.groupBy(col("tok"))
      .agg(sum(col("tf")).as("total"), count(lit(1)).as("df"))
      .orderBy(col("total").desc, col("tok").asc).limit(nTerms)
      .select(col("tok"), col("df"))
    val g = docs
      .select(size(split(col("text"), " ")).cast(LongType).as("dl"))
      .agg(count(lit(1)).as("n"),
           (sum(col("dl")).cast(DoubleType) / count(lit(1))).as("avgdl"))
    // idf precomputed on the nTerms-row broadcast side: the deterministic
    // ln runs nTerms×2 times total, never per corpus row
    val qidf = lnDet(lnDet(qterms.crossJoin(g),
        "2 * n + 2", "__ln_n"), "2 * df + 1", "__ln_df")
      .withColumn("idf", col("__ln_n") - col("__ln_df"))
      .select(col("tok"), col("df"), col("n"), col("avgdl"), col("idf"))
    val c = dt.join(broadcast(qidf), Seq("tok"))
      .select(col("doc_id"), col("lang"), col("tok"),
        (col("idf") *
         ((col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl"))))))
          .as("contrib"))
    val sc = c.groupBy(col("doc_id"), col("lang"))
      .agg(sort_array(collect_list(struct(col("tok"), col("contrib"))))
        .as("cs"))
      .select(col("doc_id"), col("lang"),
        expr("aggregate(cs, CAST(0.0 AS DOUBLE), (a, x) -> a + x.contrib)")
          .as("score"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc, col("doc_id").asc)
    sc.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk"), col("doc_id"), col("score"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // eval set: every 20th doc, deterministically — benchmark stand-in
    "q86_text_decontaminate" -> ((s, d) => {
      val docs = T.documents(s, d)
      decontaminate(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0))
        .orderBy(col("doc_id"))
    }),

    "q87_sample_stratified" -> ((s, d) =>
      stratifiedSample(T.documents(s, d), "lang", 20)
        .orderBy(col("lang"), col("rk"))),

    "q100_shuffle_shard" -> ((s, d) => {
      // Deterministic corpus shuffle + shard assignment — the LAST step of
      // a training-data pipeline: training order must decorrelate from
      // ingest order, yet be replayable. Shuffle key = md5('shuf:'||id)
      // (engine-identical, seedable via the prefix); shard = first key
      // nibble mod 8; within-shard position = rank in key order. A doc's
      // (shard, pos) is a pure function of its id — resumable, and
      // verifiable by either engine.
      // 100 TB shape: shard count is the knob — shards ≈ output files,
      // sized to ~file-size rows, so the per-shard rank window is bounded
      // BY CONSTRUCTION (corpus/N_shards), never a corpus-sized
      // partition; the plan is one hash exchange on shard + per-shard
      // sort — exactly the write path of a sharded dataset
      // (repartition(shard).sortWithinPartitions(key)). CorpusSpec pins
      // shard balance and that training order decorrelates from doc_id
      // (|corr| ≈ 0 via q39's exact-moment formula).
      val hk = md5(concat(lit("shuf:"), col("doc_id").cast(StringType)))
      T.documents(s, d)
        .select(col("doc_id"), hk.as("hk"))
        .withColumn("shard",
          expr("CAST(conv(substr(hk, 1, 1), 16, 10) AS BIGINT) % 8"))
        .withColumn("pos", row_number()
          .over(Window.partitionBy(col("shard"))
            .orderBy(col("hk").asc, col("doc_id").asc))
          .cast(LongType))
        .orderBy(col("shard"), col("pos"))
    }),

    "q88_stats_profile" -> ((s, d) =>
      lengthProfile(T.documents(s, d)).orderBy(col("lang"))),

    "q91_pack_sequences" -> ((s, d) =>
      packSequences(T.documents(s, d))
        .orderBy(col("lang"), col("shard"), col("pack_no"))),

    "q92_mix_report" -> ((s, d) =>
      mixReport(T.documents(s, d)).orderBy(col("source"), col("lang"))),

    "q98_mix_rebalance" -> ((s, d) =>
      rebalanceMix(T.documents(s, d)).orderBy(col("source"))),

    "q115_mix_temperature" -> ((s, d) =>
      mixTemperatureCached(s, d).orderBy(col("lang"))),

    "q118_pack_manifest" -> ((s, d) =>
      packManifest(T.documents(s, d))
        .orderBy(col("lang"), col("shard"), col("pack_no"), col("doc_id"))),

    "q89_text_tfidf" -> ((s, d) =>
      tfidfTopK(T.documents(s, d)).orderBy(col("lang"), col("rk"))),

    "q101_text_bm25" -> ((s, d) =>
      bm25TopK(T.documents(s, d)).orderBy(col("lang"), col("rk")))
  )

  def oracleSql: Map[String, String] = Map(
    "q86_text_decontaminate" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(toks) >= 5 THEN list_distinct(list_transform(
        |               range(len(toks) - 4),
        |               i -> array_to_string(toks[i+1:i+5], ' ')))
        |             ELSE CAST([] AS VARCHAR[]) END AS grams
        |      FROM d),
        |e AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 20 = 0),
        |c AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
        |      FROM g WHERE doc_id % 20 <> 0),
        |h AS (SELECT c.doc_id, count(e.gram) AS n_hit
        |      FROM c LEFT JOIN e USING (gram) GROUP BY c.doc_id)
        |SELECT g.doc_id, CAST(len(g.grams) AS BIGINT) AS n_grams,
        |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
        |  CAST(coalesce(h.n_hit, 0) * 1000000 // nullif(len(g.grams), 0) AS BIGINT)
        |    AS contam_micro,
        |  (coalesce(h.n_hit, 0) * 2 >= len(g.grams) AND len(g.grams) > 0)
        |    AS contaminated
        |FROM g LEFT JOIN h USING (doc_id) WHERE g.doc_id % 20 <> 0
        |ORDER BY g.doc_id""".stripMargin,

    "q101_text_bm25" ->
      """WITH tk AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
        |dt AS (
        |  SELECT doc_id, lang, CAST(len(t) AS BIGINT) AS dl, tok,
        |         count(*) AS tf
        |  FROM tk, UNNEST(t) AS u(tok) GROUP BY doc_id, lang, dl, tok),
        |q AS (
        |  SELECT tok, df FROM (
        |    SELECT tok, sum(tf) AS total, count(*) AS df FROM dt GROUP BY tok)
        |  ORDER BY total DESC, tok ASC LIMIT 5),
        |g AS (
        |  SELECT count(*) AS n,
        |         CAST(sum(len(t)) AS DOUBLE) / count(*) AS avgdl FROM tk),
        |-- standard log-idf via the DETERMINISTIC ln (no libm): the
        |-- identity ln(1 + (N-df+1/2)/(df+1/2)) = ln(2N+2) - ln(2df+1)
        |-- makes both arguments integers; each ln = k*ln2 + atanh series
        |-- on the [1,2) mantissa — bit-identical to the Spark spelling
        |qm AS (
        |  SELECT q.tok, q.df, g.n, g.avgdl,
        |         CAST(2 * g.n + 2 AS BIGINT) AS mn,
        |         CAST(2 * q.df + 1 AS BIGINT) AS md
        |  FROM q, g),
        |qk AS (
        |  SELECT *, (length(bin(mn)) - 1) AS kn, (length(bin(md)) - 1) AS kd
        |  FROM qm),
        |qt AS (
        |  SELECT *,
        |    CAST(mn AS DOUBLE) / CAST((1::BIGINT << kn) AS DOUBLE) AS tn,
        |    CAST(md AS DOUBLE) / CAST((1::BIGINT << kd) AS DOUBLE) AS td
        |  FROM qk),
        |qz AS (
        |  SELECT *,
        |    (tn - CAST(1 AS DOUBLE)) / (tn + CAST(1 AS DOUBLE)) AS zn,
        |    (td - CAST(1 AS DOUBLE)) / (td + CAST(1 AS DOUBLE)) AS zd
        |  FROM qt),
        |qi AS (
        |  SELECT tok, df, n, avgdl,
        |    (CAST(kn AS DOUBLE) * CAST(0.6931471805599453 AS DOUBLE) +
        |     zn * (CAST(2 AS DOUBLE) + (zn*zn)*(CAST(2 AS DOUBLE)/CAST(3 AS DOUBLE) +
        |       (zn*zn)*(CAST(2 AS DOUBLE)/CAST(5 AS DOUBLE) +
        |       (zn*zn)*(CAST(2 AS DOUBLE)/CAST(7 AS DOUBLE) +
        |       (zn*zn)*(CAST(2 AS DOUBLE)/CAST(9 AS DOUBLE) +
        |       (zn*zn)*(CAST(2 AS DOUBLE)/CAST(11 AS DOUBLE) +
        |       (zn*zn)*(CAST(2 AS DOUBLE)/CAST(13 AS DOUBLE)))))))))
        |    -
        |    (CAST(kd AS DOUBLE) * CAST(0.6931471805599453 AS DOUBLE) +
        |     zd * (CAST(2 AS DOUBLE) + (zd*zd)*(CAST(2 AS DOUBLE)/CAST(3 AS DOUBLE) +
        |       (zd*zd)*(CAST(2 AS DOUBLE)/CAST(5 AS DOUBLE) +
        |       (zd*zd)*(CAST(2 AS DOUBLE)/CAST(7 AS DOUBLE) +
        |       (zd*zd)*(CAST(2 AS DOUBLE)/CAST(9 AS DOUBLE) +
        |       (zd*zd)*(CAST(2 AS DOUBLE)/CAST(11 AS DOUBLE) +
        |       (zd*zd)*(CAST(2 AS DOUBLE)/CAST(13 AS DOUBLE)))))))))
        |    AS idf
        |  FROM qz),
        |c AS (
        |  -- every constant CAST to DOUBLE: DuckDB parses bare 2.2/0.5 as
        |  -- DECIMAL and would run exact decimal arithmetic where Spark
        |  -- runs IEEE double — a last-ulp divergence the hash catches
        |  SELECT dt.doc_id, dt.lang, dt.tok,
        |    qi.idf *
        |    ((dt.tf * CAST(2.2 AS DOUBLE)) /
        |     (dt.tf + CAST(1.2 AS DOUBLE) *
        |      (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (dt.dl / qi.avgdl))))
        |    AS contrib
        |  FROM dt JOIN qi USING (tok)),
        |s AS (
        |  SELECT doc_id, lang,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |                list(contrib ORDER BY tok ASC)),
        |                (a, b) -> a + b) AS score
        |  FROM c GROUP BY doc_id, lang)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, score FROM (
        |  SELECT lang, doc_id, score,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY score DESC, doc_id ASC) AS rk
        |  FROM s) WHERE rk <= 20
        |ORDER BY lang, rk""".stripMargin,

    "q100_shuffle_shard" ->
      """WITH r AS (
        |  SELECT doc_id, md5('shuf:' || CAST(doc_id AS VARCHAR)) AS hk
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, hk,
        |    CAST((strpos('0123456789abcdef', substr(hk, 1, 1)) - 1) % 8
        |         AS BIGINT) AS shard
        |  FROM r)
        |SELECT doc_id, hk, shard,
        |  CAST(row_number() OVER (PARTITION BY shard
        |       ORDER BY hk ASC, doc_id ASC) AS BIGINT) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,

    "q87_sample_stratified" ->
      """WITH r AS (
        |  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hk,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
        |  FROM documents)
        |SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk, hk,
        |  ((strpos('0123456789abcdef', substr(hk, 1, 1)) - 1) * 4096 +
        |   (strpos('0123456789abcdef', substr(hk, 2, 1)) - 1) * 256 +
        |   (strpos('0123456789abcdef', substr(hk, 3, 1)) - 1) * 16 +
        |   (strpos('0123456789abcdef', substr(hk, 4, 1)) - 1)) < 6554 AS in_p10
        |FROM r WHERE rk <= 20 ORDER BY lang, rk""".stripMargin,

    "q88_stats_profile" ->
      """WITH r AS (
        |  SELECT lang, n_chars, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars ASC, doc_id ASC) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  CAST(sum(n_chars) * 1000000 // count(*) AS BIGINT) AS mean_micro,
        |  max(CASE WHEN rk = (n * 50 + 99) // 100 THEN n_chars END) AS p50,
        |  max(CASE WHEN rk = (n * 90 + 99) // 100 THEN n_chars END) AS p90,
        |  max(CASE WHEN rk = (n * 99 + 99) // 100 THEN n_chars END) AS p99
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,

    "q91_pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id, lang, doc_id // 100 AS shard,
        |    len(string_split(text, ' ')) AS n_toks
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, shard, n_toks,
        |    coalesce(sum(n_toks) OVER (PARTITION BY lang, shard
        |      ORDER BY doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
        |  FROM d)
        |SELECT lang, shard, CAST(tok_before // 512 AS BIGINT) AS pack_no,
        |  count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS tok_count,
        |  min(doc_id) AS doc_lo, max(doc_id) AS doc_hi
        |FROM r GROUP BY lang, shard, tok_before // 512
        |ORDER BY lang, shard, pack_no""".stripMargin,

    // q91's window machinery, inverted to the per-doc manifest — all
    // integer arithmetic, reproduced exactly
    "q118_pack_manifest" ->
      """WITH d AS (
        |  SELECT doc_id, lang, doc_id // 100 AS shard,
        |    len(string_split(text, ' ')) AS n_toks
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, shard, n_toks,
        |    coalesce(sum(n_toks) OVER (PARTITION BY lang, shard
        |      ORDER BY doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
        |  FROM d)
        |SELECT lang, shard, CAST(tok_before // 512 AS BIGINT) AS pack_no,
        |  doc_id, CAST(n_toks AS BIGINT) AS n_toks,
        |  CAST(tok_before - (tok_before // 512) * 512 AS BIGINT) AS offset
        |FROM r ORDER BY lang, shard, pack_no, doc_id""".stripMargin,

    "q92_mix_report" ->
      """WITH cell AS (
        |  SELECT source, lang, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok_sum,
        |    CAST(sum(n_chars) AS BIGINT) AS char_sum
        |  FROM documents GROUP BY source, lang),
        |tot AS (SELECT sum(tok_sum) AS tok_total FROM cell)
        |SELECT source, lang, n_docs, tok_sum, char_sum,
        |  CAST(tok_sum * 1000000 // tok_total AS BIGINT) AS share_micro
        |FROM cell CROSS JOIN tot
        |ORDER BY source, lang""".stripMargin,

    "q98_mix_rebalance" ->
      """WITH t AS (SELECT doc_id, source,
        |            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |          FROM documents),
        |cell AS (SELECT source, count(*) AS n_docs,
        |           CAST(sum(n_toks) AS BIGINT) AS tok_sum
        |         FROM t GROUP BY source),
        |tot AS (SELECT CAST(sum(tok_sum) AS BIGINT) AS tok_total,
        |          count(*) AS n_sources FROM cell),
        |th AS (
        |  SELECT source, n_docs, tok_sum,
        |    CAST(tok_sum * 1000000 // tok_total AS BIGINT) AS share_micro,
        |    least(1000000, CAST(CAST(1000000000000 AS BIGINT) //
        |      nullif(n_sources * CAST(tok_sum * 1000000 // tok_total AS BIGINT), 0)
        |      AS BIGINT)) AS accept_micro
        |  FROM cell CROSS JOIN tot),
        |th2 AS (SELECT *, CAST(accept_micro * 65536 // 1000000 AS BIGINT) AS thresh16
        |        FROM th),
        |h AS (SELECT source, n_toks,
        |        ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096 +
        |         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256 +
        |         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16 +
        |         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) AS hk16
        |      FROM t),
        |k AS (
        |  SELECT h.source,
        |    CAST(sum(CASE WHEN h.hk16 < th2.thresh16 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |    CAST(sum(CASE WHEN h.hk16 < th2.thresh16 THEN h.n_toks ELSE 0 END) AS BIGINT) AS kept_toks
        |  FROM h JOIN th2 USING (source) GROUP BY h.source),
        |kt AS (SELECT CAST(sum(kept_toks) AS BIGINT) AS kept_total FROM k)
        |SELECT th2.source, th2.n_docs, th2.tok_sum, th2.share_micro,
        |  th2.accept_micro,
        |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(coalesce(k.kept_toks, 0) AS BIGINT) AS kept_toks,
        |  CAST(coalesce(k.kept_toks, 0) * 1000000 // nullif(kt.kept_total, 0) AS BIGINT)
        |    AS kept_share_micro
        |FROM th2 LEFT JOIN k USING (source) CROSS JOIN kt
        |ORDER BY source""".stripMargin,

    // every float step spelled identically to the Spark side: IEEE sqrt
    // (correctly rounded by the standard), ordered fold for the sqrt
    // total, order-free max, micro quantization before any comparison
    "q115_mix_temperature" ->
      """WITH t AS (SELECT doc_id, lang,
        |            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |          FROM documents),
        |cell AS (SELECT lang, count(*) AS n_docs,
        |           CAST(sum(n_toks) AS BIGINT) AS tok_sum
        |         FROM t GROUP BY lang),
        |tot AS (SELECT CAST(sum(tok_sum) AS BIGINT) AS tok_total FROM cell),
        |w AS (SELECT lang, n_docs, tok_sum,
        |        sqrt(CAST(tok_sum AS DOUBLE)) AS w FROM cell),
        |wt AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |                list(w ORDER BY lang ASC)), (a, x) -> a + x) AS w_total
        |       FROM w),
        |sh AS (SELECT w.lang, w.n_docs, w.tok_sum,
        |         (w.w / wt.w_total)
        |         / (CAST(w.tok_sum AS DOUBLE) / CAST(tot.tok_total AS DOUBLE))
        |           AS ratio
        |       FROM w CROSS JOIN wt CROSS JOIN tot),
        |rm AS (SELECT max(ratio) AS ratio_max FROM sh),
        |rated AS (SELECT lang, n_docs, tok_sum,
        |            CAST(floor(ratio / rm.ratio_max
        |                       * CAST(1000000.0 AS DOUBLE)) AS BIGINT)
        |              AS rate_micro
        |          FROM sh CROSS JOIN rm),
        |r2 AS (SELECT *, CAST(rate_micro * 65536 // 1000000 AS BIGINT)
        |         AS thresh16 FROM rated),
        |h AS (SELECT lang, n_toks,
        |        ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096 +
        |         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256 +
        |         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16 +
        |         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) AS hk16
        |      FROM t),
        |k AS (SELECT h.lang,
        |        CAST(count(*) AS BIGINT) AS n_kept,
        |        CAST(sum(h.n_toks) AS BIGINT) AS kept_toks
        |      FROM h JOIN r2 USING (lang)
        |      WHERE h.hk16 < r2.thresh16 GROUP BY h.lang)
        |SELECT r2.lang, r2.n_docs, r2.tok_sum, r2.rate_micro,
        |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(coalesce(k.kept_toks, 0) AS BIGINT) AS kept_toks
        |FROM r2 LEFT JOIN k USING (lang)
        |ORDER BY lang""".stripMargin,

    "q89_text_tfidf" ->
      """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS term
        |           FROM documents),
        |tf AS (SELECT lang, term, count(*) AS tf FROM t GROUP BY lang, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |nl AS (SELECT count(DISTINCT lang) AS n_strata FROM documents),
        |sc AS (SELECT tf.lang, tf.term, tf.tf, df.df,
        |         CAST(nl.n_strata * 1000000 // df.df AS BIGINT) AS idf_micro,
        |         tf.tf * CAST(nl.n_strata * 1000000 // df.df AS BIGINT) AS score
        |       FROM tf JOIN df USING (term) CROSS JOIN nl),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |        ORDER BY score DESC, term ASC) AS rk FROM sc)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, term, tf, df, idf_micro, score
        |FROM r WHERE rk <= 10 ORDER BY lang, rk""".stripMargin
  )
}
