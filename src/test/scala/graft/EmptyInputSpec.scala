package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Empty-input robustness: at 100 TB a pipeline routinely runs per-shard,
  * and shards CAN be empty (a fresh partition, a filtered-out day, a new
  * tenant). Every operator must degrade to an empty result — not throw on
  * a driver-side head(), divide by zero, or produce a phantom row. This
  * spec runs the full documents/embeddings/events query families against
  * a zero-row fixture with the production schemas. */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_empty").toString
    val s = spark
    def write(name: String, schema: StructType): Unit =
      s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    write("documents", StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType))))
    write("embeddings", StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))))
    // ts is epoch NANOS as BIGINT — the shape every graft session reads
    // events.parquet into (spark.sql.legacy.parquet.nanosAsLong=true)
    write("events", StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType))))
    write("part", StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType))))
    write("orders", StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType))))
    dir
  }

  // The batch families over the three extension tables. Streaming drains
  // are excluded (the file-stream source needs at least one input file to
  // list; empty-STREAM semantics are covered by StreamSpec's MemoryStream
  // batches). IVF (q67) is excluded: an index build over an empty corpus
  // is a deploy-time error, not a query-time input.
  private val families = Seq(
    "q60_dedup_exact", "q81_dedup_fingerprint", "q79_dedup_resolve",
    "q83_curate_corpus", "q64_sim_topk", "q59_sim_embed_nn",
    "q75_sim_srp_join", "q97_embed_resolve",
    "q57_explode_udtf", "q62_text_tokens", "q63_text_ngrams",
    "q68_text_lang_id", "q69_text_quality", "q76_text_rollhash",
    "q77_text_bpe_tokens", "q82_text_bpe_merge", "q85_text_bpe_native",
    "q93_text_redact", "q94_text_repetition",
    "q86_text_decontaminate", "q87_sample_stratified", "q88_stats_profile",
    "q89_text_tfidf", "q91_pack_sequences", "q92_mix_report",
    "q98_mix_rebalance",
    "q70_stream_tumbling", "q71_stream_sliding", "q72_stream_session",
    "q109_stream_session_dynamic",
    "q18_resample_gapfill",
    // round-8 additions: interval join (empty events), CDC merge + SCD2
    // (empty orders => empty base AND empty change batch), quantization
    "q19_join_interval", "q42_merge_upsert", "q43_scd2_history",
    "q96_embed_quantize", "q29_agg_heavy_hitters",
    // round-8 additions: span dedup, shuffle-shard, BM25 (empty corpus),
    // incremental view maintenance (empty base and batch)
    "q99_dedup_spans", "q100_shuffle_shard", "q101_text_bm25",
    "q38_agg_incremental", "q104_multimodal_chunks", "q103_dedup_fuzzy",
    "q106_dedup_prefix", "q107_json_variant", "q108_xml_roundtrip",
    // round-9 additions: containment, kNN ranking, incremental gate,
    // streaming fingerprint index, tempered mixture
    "q111_dedup_containment", "q112_sim_knn_rank", "q113_dedup_incremental",
    "q114_stream_dedup_index", "q115_mix_temperature", "q116_sim_ivf_batch",
    "q117_assemble_sessions", "q118_pack_manifest", "q119_quality_gate")

  for (name <- families)
    test(s"$name returns an empty result on a zero-row shard") {
      val rows = SparkEntry.queries(name)(spark, emptyDir).collect()
      assert(rows.isEmpty, s"$name produced ${rows.length} phantom rows")
    }
}
