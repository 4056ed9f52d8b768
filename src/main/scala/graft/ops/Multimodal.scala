package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryModule, Tables => T}

/** Multimodal binary-column surface (q58): image/audio/video payloads are
  * opaque `binary` columns with typed metadata; the engine's job is the
  * plumbing — schema, per-row feature extraction, fingerprinting, frame
  * sampling — not the codec. The fixture set has no media files, so the
  * payload here is the document's UTF-8 bytes standing in for an opaque
  * blob; every operation below (byte length, header sniff, content
  * fingerprint, stride sampling, decode round-trip) is byte-level and
  * codec-agnostic, which is exactly the part Spark executes at scale.
  *
  * The codec boundary is `decodeImageStub`: a clearly-marked deterministic
  * fake where a real pipeline would put its vectorized decode UDF (the
  * image/audio libraries are not in this environment). Swapping the stub
  * for a real decoder changes none of the Spark-side plumbing.
  *
  * Scale notes: stateless per-row projection over one scan — no shuffle,
  * columnar-pruned, linear in corpus size. Binary payloads stay inside the
  * executors; nothing is collected.
  */
object Multimodal extends QueryModule {

  /** STUB — stands in for a real image decoder (not available in this
    * container). Deterministic fake: derives a (width, height, channels)
    * triple from the payload's first bytes. A production build replaces
    * this body with the actual codec call; the signature, null handling,
    * and the plumbing in q58 stay the same. */
  private[graft] val decodeImageStub: Array[Byte] => (Int, Int, Int) =
    bytes =>
      if (bytes == null || bytes.isEmpty) (0, 0, 0)
      else ((bytes(0) & 0xff) + 1, (bytes(bytes.length - 1) & 0xff) + 1, 3)

  /** Batch-decode plumbing — the Scala analog of a vectorized decode UDF:
    * mapPartitions hands the (stubbed) codec whole partitions, so a real
    * decoder amortizes model/codec init once per partition instead of per
    * row (the per-row UDF trap). Input: (id, payload); output: typed
    * (id, width, height, channels) metadata. The partitioning, schema, and
    * batch shape are real; only the codec call is the stub. */
  def decodeBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init of the (stubbed) codec happens HERE, once
        val decode = decodeImageStub
        rows.map { case (id, payload) =>
          val (w, h, c) = decode(payload)
          (id, w, h, c)
        }
      }
      .toDF("doc_id", "width", "height", "channels")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q58_multimodal_binary" -> ((s, d) => {
      val payloads = T.documents(s, d)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("hexs", hex(col("payload")))
        .withColumn("nb", length(col("payload")).cast(LongType))
      // the mapPartitions decode path feeds typed metadata back into the
      // relational flow — and because the stub's fake features are
      // deterministic byte arithmetic, the oracle recomputes them, so this
      // whole batched-UDF plumbing is hash-checked, not just unit-tested
      val meta = decodeBatch(s, payloads)
        .select(col("doc_id"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("channels").cast(LongType).as("channels"))
      payloads.join(meta, Seq("doc_id"))
        .select(
          col("doc_id"),
          lit("text/plain").as("mime"),
          col("nb").as("n_bytes"),
          substring(col("hexs"), 1, 16).as("header_hex"),
          md5(col("payload")).as("fingerprint"),
          // 4-point stride sample (frame-sampling analog): byte at
          // 1 + k*(n DIV 4) for k = 0..3, read from the hex rendering
          expr("concat_ws('', transform(sequence(0, 3), " +
            "k -> substr(hexs, 2 * k * CAST(nb DIV 4 AS INT) + 1, 2)))")
            .as("frame_hex"),
          (decode(col("payload"), "UTF-8") === col("text")).as("decoded_ok"),
          expr("CAST((instr('0123456789ABCDEF', substr(hexs, 1, 1)) - 1) * 16 " +
            "+ instr('0123456789ABCDEF', substr(hexs, 2, 1)) - 1 AS BIGINT)")
            .as("first_byte"),
          col("width"), col("height"), col("channels"))
        .orderBy(col("doc_id"))
    }),

    "q104_multimodal_chunks" -> ((s, d) =>
      // Chunk GENERATOR — the media op q58/q84 don't cover: split every
      // payload into fixed 64-byte segments and emit one ROW per chunk
      // (video→frames, audio→segments, the shape that lets a downstream
      // decode stage parallelize WITHIN a large object instead of being
      // bound by the largest file). Pipelined posexplode (no
      // materialization of the chunk array), stateless, no shuffle; each
      // chunk carries its index, byte count and fingerprint so a decode
      // stage can retry/route per chunk. MultimodalSpec pins lossless
      // reassembly (concat of chunk hex == payload hex, in index order).
      T.documents(s, d)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("hexs", hex(col("payload")))
        .withColumn("nb", length(col("payload")).cast(LongType))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, greatest(CAST(ceil(nb / 64.0) AS INT), 1) - 1), " +
            "k -> substr(hexs, k * 128 + 1, 128))"))
          .as(Seq("chunk_idx", "chunk_hex")))
        .select(col("doc_id"),
          col("chunk_idx").cast(LongType).as("chunk_idx"),
          expr("CAST(length(chunk_hex) DIV 2 AS BIGINT)").as("chunk_bytes"),
          md5(col("chunk_hex")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))),

    "q84_multimodal_resize" -> ((s, d) =>
      // Resize analog (the mandate's fourth media op, next to q58's
      // decode/feature-extract/frame-sample): downsample every payload to
      // a fixed 16-point stride "thumbnail" — the byte-level plumbing of a
      // media resize (pick every (n/16)-th sample), codec-agnostic like
      // the rest of the binary surface, plus the thumbnail's own
      // fingerprint and an exact integer compression ratio. Stateless
      // per-row projection, columnar-pruned, no shuffle — the shape a real
      // thumbnailing pass has at 100 TB (the codec call would slot into
      // decodeBatch's per-partition init, changing none of this plan).
      T.documents(s, d)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("hexs", hex(col("payload")))
        .withColumn("nb", length(col("payload")).cast(LongType))
        .withColumn("stride", greatest(expr("nb DIV 16"), lit(1L)))
        .withColumn("thumb_hex", expr(
          "concat_ws('', transform(sequence(0, 15), " +
            "k -> substr(hexs, 2 * CAST(k * stride AS INT) + 1, 2)))"))
        .select(
          col("doc_id"),
          col("nb").as("n_bytes"),
          col("thumb_hex"),
          (length(col("thumb_hex")) / 2).cast(LongType).as("thumb_bytes"),
          md5(col("thumb_hex")).as("thumb_md5"),
          // nullif guard: Spark's DIV 0 is NULL but DuckDB's // 0 raises —
          // NULL ratio for a zero-byte payload is the cross-engine answer
          expr("CAST(CAST(length(thumb_hex) DIV 2 AS BIGINT) * 1000000 DIV nullif(nb, 0) AS BIGINT)")
            .as("ratio_micro"))
        .orderBy(col("doc_id")))
  )

  def oracleSql: Map[String, String] = Map(
    "q104_multimodal_chunks" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hexs,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS nb
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, CAST(u.k AS BIGINT) AS chunk_idx,
        |         substr(hexs, CAST(u.k * 128 AS INT) + 1, 128) AS chunk_hex
        |  FROM b, UNNEST(range(GREATEST(CAST(ceil(nb / 64.0) AS BIGINT), 1)))
        |       AS u(k))
        |SELECT doc_id, chunk_idx,
        |  CAST(length(chunk_hex) // 2 AS BIGINT) AS chunk_bytes,
        |  md5(chunk_hex) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q84_multimodal_resize" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hexs,
        |             CAST(octet_length(encode(text)) AS BIGINT) AS nb
        |           FROM documents),
        |t AS (SELECT doc_id, nb,
        |        list_aggregate(list_transform(range(16),
        |          k -> substr(hexs, 2 * CAST(k * greatest(nb // 16, 1) AS INT) + 1, 2)),
        |          'string_agg', '') AS thumb_hex
        |      FROM b)
        |SELECT doc_id, nb AS n_bytes, thumb_hex,
        |  CAST(length(thumb_hex) // 2 AS BIGINT) AS thumb_bytes,
        |  md5(thumb_hex) AS thumb_md5,
        |  CAST(CAST(length(thumb_hex) // 2 AS BIGINT) * 1000000 // nullif(nb, 0) AS BIGINT) AS ratio_micro
        |FROM t ORDER BY doc_id""".stripMargin,

    "q58_multimodal_binary" ->
      """WITH b AS (SELECT doc_id, text, encode(text) AS payload,
        |             hex(encode(text)) AS hexs,
        |             CAST(octet_length(encode(text)) AS BIGINT) AS nb
        |           FROM documents)
        |SELECT doc_id, 'text/plain' AS mime, nb AS n_bytes,
        |  substr(hexs, 1, 16) AS header_hex,
        |  md5(text) AS fingerprint,
        |  list_aggregate(list_transform(range(4),
        |    k -> substr(hexs, 2 * k * CAST(nb // 4 AS INT) + 1, 2)),
        |    'string_agg', '') AS frame_hex,
        |  decode(payload) = text AS decoded_ok,
        |  CAST((strpos('0123456789ABCDEF', substr(hexs, 1, 1)) - 1) * 16
        |    + strpos('0123456789ABCDEF', substr(hexs, 2, 1)) - 1 AS BIGINT) AS first_byte,
        |  CAST((strpos('0123456789ABCDEF', substr(hexs, 1, 1)) - 1) * 16
        |    + strpos('0123456789ABCDEF', substr(hexs, 2, 1)) - 1 + 1 AS BIGINT) AS width,
        |  CAST((strpos('0123456789ABCDEF', substr(hexs, 2*nb-1, 1)) - 1) * 16
        |    + strpos('0123456789ABCDEF', substr(hexs, 2*nb, 1)) - 1 + 1 AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels
        |FROM b ORDER BY doc_id""".stripMargin
  )
}
