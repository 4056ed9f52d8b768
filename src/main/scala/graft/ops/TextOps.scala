package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryModule, Tables => T}

/** Text analysis over `documents` (q57, q62, q63): tokenize/generator
  * surface, token frequencies, per-language n-grams.
  *
  * Mandated extension surface (SURVEY.md §2-B "text analysis") — the
  * reference has no text ops, but its ICD-code TEXT columns
  * (/root/reference/dags/patient_claims_plus_postgres.py:85-93) are the
  * kind of free-text data these operators serve.
  *
  * Scale notes: tokenization is a per-row generator (`explode` = Catalyst
  * Generate, pipelined inside whole-stage codegen, no shuffle); the
  * frequency counts are partial+final hash aggregates shuffling only the
  * (token|bigram, count) pairs — at 100 TB the map-side combine collapses
  * each partition to its vocabulary first, so shuffle volume is bounded by
  * vocabulary size, not corpus size. Top-N per group uses a window
  * partitioned by language (bounded partitions), never a global window.
  */
object TextOps extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_explode_udtf" -> ((s, d) =>
      // Generator/UDTF surface: one output row per token with its position.
      T.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
                col("col").as("token"))
        .orderBy(col("doc_id"), col("pos"))),

    "q62_text_tokens" -> ((s, d) =>
      T.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(50)),

    "q63_text_ngrams" -> ((s, d) => {
      val bigrams = T.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(col("lang"), explode(expr(
          "transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))"))
          .as("bigram"))
      val counts = bigrams.groupBy(col("lang"), col("bigram"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n").desc, col("bigram").asc)
      counts.withColumn("rn", row_number().over(w).cast(LongType))
        .filter(col("rn") <= 10)
        .select(col("lang"), col("rn"), col("bigram"), col("n"))
        .orderBy(col("lang"), col("rn"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q57_explode_udtf" ->
      """SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |     unnest(generate_series(1, len(toks))) AS t(i)
        |ORDER BY doc_id, pos""".stripMargin,

    "q62_text_tokens" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 50""".stripMargin,

    "q63_text_ngrams" ->
      """WITH d AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
        |b AS (SELECT lang, unnest(list_transform(range(len(toks) - 1),
        |        i -> toks[i+1] || ' ' || toks[i+2])) AS bigram
        |      FROM d WHERE len(toks) >= 2),
        |g AS (SELECT lang, bigram, count(*) AS n FROM b GROUP BY lang, bigram),
        |r AS (SELECT lang, bigram, n,
        |        row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram ASC) AS rn
        |      FROM g)
        |SELECT lang, rn, bigram, n FROM r WHERE rn <= 10
        |ORDER BY lang, rn""".stripMargin
  )
}
