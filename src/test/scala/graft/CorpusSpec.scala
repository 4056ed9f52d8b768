package graft

import org.apache.spark.sql.functions._

/** Corpus curation ops (q86-q90): the sketch-vs-exact percentile pin
  * promised at ops/Corpus.scala (q88), plan-shape proof that
  * decontamination never shuffles gram text, sampling determinism +
  * Bernoulli rate, and TF-IDF ranking invariants. */
class CorpusSpec extends SparkSpec {

  test("q88 exact nearest-rank percentiles within 5% of approx_percentile") {
    // The 100 TB path is the one-pass mergeable sketch; pin it against the
    // exact ranks the oracled query computes (same contract as q28's ±5%).
    val exact = SparkEntry.queries("q88_stats_profile")(spark, sf)
      .select("lang", "p50", "p90", "p99").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val approx = graft.Tables.documents(spark, sf)
      .groupBy(col("lang"))
      .agg(percentile_approx(col("n_chars"), array(lit(0.5), lit(0.9), lit(0.99)),
        lit(10000)).as("ps"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((lang, (p50, p90, p99)) <- exact) {
      val Seq(a50, a90, a99) = approx(lang)
      def close(e: Long, a: Long) = math.abs(e - a) <= math.max(1L, e / 20)
      assert(close(p50, a50) && close(p90, a90) && close(p99, a99),
        s"$lang: exact ($p50,$p90,$p99) vs sketch ($a50,$a90,$a99)")
    }
  }

  test("q86 decontamination probes a broadcast; no Exchange carries gram text") {
    val plan = SparkEntry.queries("q86_text_decontaminate")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "eval-set grams must broadcast, not shuffle-join")
    // The eval-set SUBTREE (under BroadcastExchange) may shuffle grams —
    // it is bounded by the benchmark, not the corpus. Outside that
    // subtree, no Exchange may reference gram or document text: the
    // corpus side must reach its per-doc count agg on fixed-width rows.
    val lines = plan.linesIterator.toVector
    def depth(l: String) = l.segmentLength(c => " :+-".contains(c))
    val bIdx = lines.indexWhere(_.contains("BroadcastExchange"))
    assert(bIdx >= 0)
    val bSubtree = lines.drop(bIdx + 1).takeWhile(depth(_) > depth(lines(bIdx)))
    val corpusSide = (lines.take(bIdx + 1) ++ lines.drop(bIdx + 1 + bSubtree.length))
      .filter(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
    val gramAttr = """(?<![A-Za-z0-9_])gram#\d+""".r
    val textAttr = """(?<![A-Za-z0-9_])text#\d+""".r
    assert(corpusSide.nonEmpty && !corpusSide.exists(l =>
      gramAttr.findFirstIn(l).isDefined || textAttr.findFirstIn(l).isDefined),
      s"only (doc_id, n_grams, partial-count) rows may shuffle; got:\n${corpusSide.mkString("\n")}")
  }

  test("q86 flags exactly the docs with >=50% eval-gram overlap") {
    val out = SparkEntry.queries("q86_text_decontaminate")(spark, sf).collect()
    assert(out.nonEmpty)
    // fixture texts draw from a ~30-word vocabulary: overlap must exist
    assert(out.exists(_.getAs[Long]("n_hit") > 0), "eval overlap expected in fixture")
    out.foreach { r =>
      val (ng, nh) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"))
      assert(nh <= ng, s"hits cannot exceed grams: $r")
      assert(r.getAs[Boolean]("contaminated") == (nh * 2 >= ng && ng > 0), s"$r")
      assert(r.getAs[Long]("doc_id") % 20 != 0, "eval docs must be excluded")
    }
  }

  test("q87 sampling is deterministic and the Bernoulli flag hits ~10%") {
    val a = SparkEntry.queries("q87_sample_stratified")(spark, sf).collect()
    val b = SparkEntry.queries("q87_sample_stratified")(spark, sf).collect()
    assert(a.nonEmpty && a.sameElements(b), "hash-order sampling must be replayable")
    val perLang = a.groupBy(_.getAs[String]("lang"))
    perLang.foreach { case (lang, rows) =>
      val rks = rows.map(_.getAs[Long]("rk")).sorted
      assert(rks.length <= 20 && rks.toSeq == (1L to rks.length).toSeq,
        s"$lang ranks must be contiguous 1..n<=20")
    }
    // rate of the stateless Bernoulli variant over the WHOLE table (q87's
    // output is only the top-20 ranks, too small to measure a rate)
    val docs = graft.Tables.documents(spark, sf)
      .select((expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT)") < 6554)
        .as("in_p10"))
    val n = docs.count().toDouble
    val hit = docs.filter(col("in_p10")).count().toDouble
    assert(hit / n > 0.05 && hit / n < 0.15,
      s"p10 hash-threshold rate ${hit / n} out of band")
  }

  test("q100 shuffle: exactly-once cover, balanced shards, order decorrelates") {
    val out = SparkEntry.queries("q100_shuffle_shard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val nDocs = Tables.documents(spark, sf).count()
    // every doc appears exactly once, positions are 1..size per shard
    assert(out.length == nDocs && out.map(_._1).distinct.length == nDocs)
    val byShard = out.groupBy(_._2)
    for ((_, rows) <- byShard)
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length))
    // md5 nibbles are uniform: no shard dominates (≤ 3× the smallest is
    // generous at fixture size; the bound exists to catch a broken key)
    val sizes = byShard.values.map(_.length).toSeq
    assert(sizes.max <= 3 * sizes.min, s"shard sizes: $sizes")
    // training order decorrelates from ingest order: within each shard,
    // |corr(pos, doc_id)| stays near zero (exact-moment formula, q39's
    // discipline — all sums over Longs are exact in double up to 2^53)
    for ((shardId, rows) <- byShard) {
      val n = rows.length.toDouble
      val xs = rows.map(_._3.toDouble); val ys = rows.map(_._1.toDouble)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val corr = (sxy - sx * sy / n) /
        math.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
      // a true random permutation has corr ~ N(0, 1/√(n-1)); allow 3σ so
      // the bound adapts to shard size (fixture shards are tiny)
      assert(math.abs(corr) < 3.0 / math.sqrt(n - 1),
        s"shard $shardId (n=$n): shuffled order correlates with ingest order: $corr")
    }
  }

  test("q101 BM25 top-k prunes map-side; scores rank sanely") {
    val df = SparkEntry.queries("q101_text_bm25")(spark, sf)
    // the per-lang rank-≤-k window must plan map-side WindowGroupLimit
    // pruning (q31's shape) — no task holds more than k rows per lang
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-lang top-k must plan WindowGroupLimit pruning:\n$plan")
    val rows = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // within a lang: rk contiguous from 1, scores non-increasing, all > 0
    for ((_, g) <- rows.groupBy(_._1)) {
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1L to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4; case _ => true })
      assert(sorted.forall(_._4 > 0.0))
    }
  }

  test("q101's deterministic ln agrees with libm to the atanh tail bound") {
    // lnDet exists to replace math.log, not to approximate it loosely:
    // over integer arguments spanning the full bit-length range the gate
    // uses (2df+1 .. 2N+2), the fixed-order series must sit within its
    // analytic tail bound of true ln — so standard-BM25 ranking claims
    // rest on a log that IS ln for every practical purpose, while staying
    // bit-identical across engines.
    import spark.implicits._
    val ms = Seq(1L, 2L, 3L, 5L, 7L, 11L, 101L, 4999L, 65537L,
      1000001L, 123456789L, (1L << 40) + 17L)
    val got = graft.ops.Corpus.lnDet(ms.toDF("m"), "m", "lnm")
      .select(col("m"), col("lnm")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (m <- ms)
      assert(math.abs(got(m) - math.log(m.toDouble)) < 1e-8,
        s"lnDet($m) = ${got(m)} vs libm ${math.log(m.toDouble)}")
  }

  test("q91 packing covers every document once, packs never overlap") {
    val packs = SparkEntry.queries("q91_pack_sequences")(spark, sf).collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(packs.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "every document lands in exactly one pack")
    packs.foreach { r =>
      assert(r.getAs[Long]("tok_count") > 0 &&
        r.getAs[Long]("doc_lo") <= r.getAs[Long]("doc_hi"))
    }
    // within a (lang, shard) stream, packs partition the doc_id order:
    // consecutive packs carry disjoint, increasing doc ranges
    packs.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard")))
      .foreach { case (_, rows) =>
        rows.sortBy(_.getAs[Long]("pack_no")).sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getAs[Long]("doc_hi") < b.getAs[Long]("doc_lo"),
              s"packs overlap: $a / $b")
          case _ =>
        }
      }
  }

  test("q92 mixture shares are exact micro-units that sum to the corpus") {
    val mix = SparkEntry.queries("q92_mix_report")(spark, sf).collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(mix.map(_.getAs[Long]("n_docs")).sum == nDocs)
    val shareSum = mix.map(_.getAs[Long]("share_micro")).sum
    // floor-division shares: within #cells micro-units of exactly 1.0
    assert(shareSum <= 1000000L && shareSum > 1000000L - mix.length,
      s"share sum $shareSum out of band for ${mix.length} cells")
  }

  test("q98 rebalance keeps under-represented sources whole, never upsamples") {
    val out = SparkEntry.queries("q98_mix_rebalance")(spark, sf).collect()
    assert(out.nonEmpty)
    val target = 1000000L / out.length
    out.foreach { r =>
      val (acc, nd, nk) = (r.getAs[Long]("accept_micro"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))
      assert(acc <= 1000000L, s"$r")
      assert(nk <= nd && r.getAs[Long]("kept_toks") <= r.getAs[Long]("tok_sum"), s"$r")
      // a source at or under its target share is never downsampled:
      // accept hits the 1.0 cap and the 16-bit threshold keeps every doc
      if (r.getAs[Long]("share_micro") <= target)
        assert(acc == 1000000L && nk == nd, s"under-target source was cut: $r")
    }
    assert(out.map(_.getAs[Long]("kept_share_micro")).sum <= 1000000L)
    // hash-order determinism: a rerun is bit-identical
    val again = SparkEntry.queries("q98_mix_rebalance")(spark, sf).collect()
    assert(out.sameElements(again))
  }

  test("q118 manifest tiles packs gaplessly and agrees with q91 summaries") {
    val man = SparkEntry.queries("q118_pack_manifest")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(man.nonEmpty)
    // offsets live inside the bin
    assert(man.forall { case (_, _, _, _, _, off) => off >= 0 && off < 512 })
    // global tiling identity per (lang, shard): pack_no*512 + offset is
    // EXACTLY the running token sum over preceding docs — no gaps, no
    // overlaps, under the same greedy boundary rule as q91
    man.groupBy(m => (m._1, m._2)).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._4).foreach { case (_, _, pack, _, nt, off) =>
        assert(pack * 512 + off == cum, s"manifest must tile: $rows")
        cum += nt
      }
    }
    // per-pack doc counts and token sums agree with the q91 summaries
    val sums = SparkEntry.queries("q91_pack_sequences")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    val byPack = man.groupBy(m => (m._1, m._2, m._3))
    assert(byPack.keySet == sums.keySet)
    byPack.foreach { case (k, rows) =>
      val (nd, tk) = sums(k)
      assert(rows.length == nd && rows.map(_._5).sum == tk,
        s"manifest and summary disagree for pack $k")
    }
  }

  test("q115 tempering: rates fall with stratum mass, lightest keeps all") {
    val out = SparkEntry.queries("q115_mix_temperature")(spark, sf).collect()
    assert(out.length >= 2, "tempering needs at least two strata to mean anything")
    // ratio ∝ (√m/Σ√)/(m/M) ∝ 1/√m — rate is strictly non-increasing in
    // stratum mass, the α=0.5 signature (α=0 would equalize, α=1 keep all)
    val byMass = out.sortBy(_.getAs[Long]("tok_sum"))
    val rates = byMass.map(_.getAs[Long]("rate_micro"))
    assert(rates.zip(rates.tail).forall { case (a, b) => a >= b },
      s"rates must fall as mass grows: ${byMass.mkString(", ")}")
    // the lightest stratum holds ratio_max ⇒ rate exactly 1.0 ⇒ keeps all
    assert(rates.head == 1000000L, s"lightest stratum must keep everything")
    assert(byMass.head.getAs[Long]("n_kept") == byMass.head.getAs[Long]("n_docs"))
    // downsample-only: nothing upsamples, kept ≤ present everywhere
    out.foreach { r =>
      assert(r.getAs[Long]("rate_micro") <= 1000000L)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("kept_toks") <= r.getAs[Long]("tok_sum"))
    }
    // deterministic: a rerun is bit-identical (md5-keyed sampler)
    assert(out.sameElements(
      SparkEntry.queries("q115_mix_temperature")(spark, sf).collect()))
  }

  test("q89 emits top-10 per stratum, ordered, with df bounded by strata") {
    val out = SparkEntry.queries("q89_text_tfidf")(spark, sf).collect()
    assert(out.nonEmpty)
    val nStrata = graft.Tables.documents(spark, sf)
      .select(countDistinct(col("lang"))).head().getLong(0)
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.length <= 10)
      // rank order is (score desc, term asc)
      val pairs = sorted.map(r => (r.getAs[Long]("score"), r.getAs[String]("term")))
      pairs.sliding(2).foreach {
        case Array((s1, t1), (s2, t2)) =>
          assert(s1 > s2 || (s1 == s2 && t1 < t2), s"$lang rank order broken")
        case _ =>
      }
      rows.foreach { r =>
        val df = r.getAs[Long]("df")
        assert(df >= 1 && df <= nStrata, s"df out of range: $r")
      }
    }
  }

  test("q119 gate: approx twin tracks the exact nearest-rank gate; auto ranks exact at fixture scale") {
    def kept(mode: String): Set[Long] =
      graft.ops.TextOps.qualityGate(spark, sf, mode)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = kept("exact")
    val approx = kept("approx")
    // auto must pick the exact path while strata fit the rank bound —
    // byte-identical gate, oracle unchanged
    assert(kept("auto") == exact)
    // the approx threshold is a real data value within the sketch's rank
    // error, so the two gates may disagree only near the cutoff: bounded
    // symmetric difference, kept fraction still ~half
    val n = Tables.documents(spark, sf).count()
    val sym = (exact diff approx).size + (approx diff exact).size
    assert(sym <= math.max(1L, n / 50), s"symmetric difference $sym of $n")
    assert(approx.size >= n * 2 / 5 && approx.size <= n * 3 / 5,
      s"approx gate kept ${approx.size} of $n")
    assert(exact.nonEmpty && approx.nonEmpty)
  }
}
