package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Binary-column plumbing the oracle can't see: the decode-stub contract
  * and payload/metadata integrity. */
class MultimodalSpec extends SparkSpec {

  test("decodeImageStub: deterministic, total on null/empty") {
    assert(Multimodal.decodeImageStub(null) == (0, 0, 0))
    assert(Multimodal.decodeImageStub(Array.emptyByteArray) == (0, 0, 0))
    val b = Array[Byte](0x10, 0x7f, -1)
    assert(Multimodal.decodeImageStub(b) == Multimodal.decodeImageStub(b))
    assert(Multimodal.decodeImageStub(b) == (0x11, 0x100, 3))
  }

  test("decodeBatch: partition-batched decode emits typed metadata for every row") {
    val payloads = Tables.documents(spark, sf)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val meta = ops.Multimodal.decodeBatch(spark, payloads)
    assert(meta.count() == payloads.count())
    assert(meta.columns.toSeq == Seq("doc_id", "width", "height", "channels"))
    // stub contract: channels always 3, dims derived from payload bytes
    assert(meta.filter(col("channels") =!= 3).count() == 0)
    assert(meta.filter(col("width") < 1 || col("width") > 256).count() == 0)
  }

  test("q58: decode round-trip holds and header is a prefix of the payload") {
    val r = SparkEntry.queries("q58_multimodal_binary")(spark, sf)
    assert(r.filter(col("decoded_ok") === false).count() == 0)
    // first frame sample == first header byte == first_byte rendered in hex
    val bad = r.filter(
      substring(col("frame_hex"), 1, 2) =!= substring(col("header_hex"), 1, 2))
    assert(bad.count() == 0)
  }
}
