package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryModule, Tables => T}

/** Deduplication over `documents` (q60 exact, q61 near-dup by shingle
  * Jaccard) — SURVEY.md §2-B mandated extension surface.
  *
  * Scale notes:
  *  - q60 is `groupBy(text).agg(min)` — a deterministic-survivor
  *    `dropDuplicates` that shuffles once on the dedup key with map-side
  *    combine; at 100 TB one would pre-hash the text to a 128-bit
  *    fingerprint so the shuffle carries 16-byte keys, not document bodies
  *    (same plan shape).
  *  - q61 is the EXACT pair path: shingle-explode + self-join on shingle +
  *    Jaccard filter. Its cost is bounded by the hottest shingle's document
  *    frequency squared, which is why it is reserved for oracle/fixture
  *    scale — the 100 TB path is q65's MinHash-LSH banding (Similarity),
  *    which buckets candidates first and runs this same exact verification
  *    only within buckets.
  */
object Dedup extends QueryModule {

  /** doc_id + distinct 3-token shingles, one row per (doc, shingle). */
  private[ops] def shingles(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, size(toks)-3), " +
          "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))")).as("sh"))

  /** Exact Jaccard >= tau pairs from a (doc_id, sh) shingle table. */
  private[ops] def jaccardPairs(sh: DataFrame, tau: Double): DataFrame = {
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val inter = sh.select(col("doc_id").as("i"), col("sh"))
      .join(sh.select(col("doc_id").as("j"), col("sh")), Seq("sh"))
      .filter(col("i") < col("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("inter"))
    inter
      .join(sz.select(col("doc_id").as("i"), col("nsh").as("ni")), Seq("i"))
      .join(sz.select(col("doc_id").as("j"), col("nsh").as("nj")), Seq("j"))
      .withColumn("uni", col("ni") + col("nj") - col("inter"))
      .withColumn("jac", col("inter").cast(DoubleType) / col("uni").cast(DoubleType))
      .filter(col("jac") >= tau)
      .select(col("i"), col("j"), col("inter"), col("uni"), col("jac"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_dedup_exact" -> ((s, d) =>
      // Deterministic-survivor exact dedup (SURVEY §2-B): survivor =
      // min(doc_id) per text, never the arbitrary-row dropDuplicates.
      T.documents(s, d)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("survivor"), count(lit(1)).as("n_copies"))
        .select(col("survivor"), col("n_copies"),
                length(col("text")).cast(LongType).as("text_len"))
        .orderBy(col("survivor"))),

    "q61_dedup_near" -> ((s, d) =>
      jaccardPairs(shingles(s, d), 0.5).orderBy(col("i"), col("j")))
  )

  def oracleSql: Map[String, String] = Map(
    "q60_dedup_exact" ->
      """SELECT min(doc_id) AS survivor, count(*) AS n_copies,
        |  CAST(length(text) AS BIGINT) AS text_len
        |FROM documents GROUP BY text ORDER BY survivor""".stripMargin,

    "q61_dedup_near" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks) - 2),
        |         k -> toks[k+1] || ' ' || toks[k+2] || ' ' || toks[k+3]))) AS sh
        |       FROM d WHERE len(toks) >= 3),
        |sz AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
        |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |      GROUP BY a.doc_id, b.doc_id)
        |SELECT i, j, inter, sa.nsh + sb.nsh - inter AS uni,
        |  CAST(inter AS DOUBLE) / CAST(sa.nsh + sb.nsh - inter AS DOUBLE) AS jac
        |FROM p JOIN sz sa ON p.i = sa.doc_id JOIN sz sb ON p.j = sb.doc_id
        |WHERE CAST(inter AS DOUBLE) / CAST(sa.nsh + sb.nsh - inter AS DOUBLE) >= 0.5
        |ORDER BY i, j""".stripMargin
  )
}
