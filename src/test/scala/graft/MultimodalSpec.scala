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

  test("q104: chunks reassemble losslessly and sizes are exact") {
    // the generator must be a PARTITION of the payload: concatenating
    // chunk hex in index order reproduces the original payload hex, every
    // chunk but the last is exactly 64 bytes, and none is empty
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), hex(encode(col("text"), "UTF-8")).as("hexs"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = SparkEntry.queries("q104_multimodal_chunks")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getString(3)))
    assert(chunks.nonEmpty)
    for ((docId, rows) <- chunks.groupBy(_._1)) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(0L until sorted.length),
        s"doc $docId: chunk indices must be contiguous from 0")
      assert(sorted.init.forall(_._3 == 64L) && sorted.last._3 >= 1L,
        s"doc $docId: all chunks but the last must be 64 bytes")
      // fingerprints are of the hex text; verify reassembly via sizes +
      // the md5 of each chunk's slice of the original
      def md5Hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val hexs = docs(docId)
      var off = 0
      for ((_, _, nb, m) <- sorted) {
        val slice = hexs.substring(off, off + 2 * nb.toInt)
        assert(md5Hex(slice) == m,
          s"doc $docId: chunk at $off diverges from the payload slice")
        off += 2 * nb.toInt
      }
      assert(off == hexs.length, s"doc $docId: chunks must cover the payload")
    }
  }
}
