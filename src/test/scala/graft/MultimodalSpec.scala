package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, ""))
    .toDF("doc_id", "text")

  test("withPayload attaches UTF-8 bytes and consistent metadata") {
    val got = Multimodal.withPayload(docs, "doc_id", "text")
      .select(col("doc_id"), col("payload"), col("media_meta.n_bytes"),
        col("media_meta.format"))
      .as[(Long, Array[Byte], Long, String)].collect().sortBy(_._1)
    assert(got(0)._2.toSeq == "abcdefghij".getBytes("UTF-8").toSeq)
    assert(got.map(_._3).toSeq == Seq(10L, 2L, 0L))
    assert(got.forall(_._4 == "bin/v1"))
  }

  test("decodeStub: deterministic, normalized byte-histogram moments") {
    val f = Multimodal.decodeStub("abcd".getBytes("UTF-8"))
    assert(f.length == 8)
    assert(math.abs(f.sum - 1.0f) < 1e-6)
    assert(f.toSeq == Multimodal.decodeStub("abcd".getBytes("UTF-8")).toSeq)
    assert(Multimodal.decodeStub(Array.emptyByteArray).forall(_ == 0f))
  }

  test("resizeStub: nearest-neighbor sampling, clamped when dims exceed bytes") {
    // 2x2 grid "abcd" identity-resized returns itself
    assert(new String(Multimodal.resizeStub("abcd".getBytes, 2, 2, 2, 2)) == "abcd")
    // downsample 4x1 -> 2x1 takes every other byte
    assert(new String(Multimodal.resizeStub("abcd".getBytes, 4, 1, 2, 1)) == "ac")
    // fake dims bigger than the byte count clamp to the last byte
    val clamped = Multimodal.resizeStub("ab".getBytes, 10, 10, 3, 3)
    assert(clamped.length == 9 && clamped.forall(b => b == 'a' || b == 'b'))
    // empty payload stays empty regardless of dims
    assert(Multimodal.resizeStub(Array.emptyByteArray, 5, 5, 2, 2).isEmpty)
  }

  test("extractFeatures preserves every row through batching") {
    val big = (1L to 1000L).map(i => (i, "x" * (i % 37).toInt)).toDF("doc_id", "text")
    val got = Multimodal.extractFeatures(
      Multimodal.withPayload(big, "doc_id", "text"), "doc_id", "payload",
      batchSize = 64)
    assert(got.count() == 1000)
    assert(got.schema.fieldNames.toSeq == Seq("doc_id", "n_bytes", "features"))
  }

  test("frameSample windows the payload with stride; short payloads drop") {
    val got = Multimodal.frameSample(
        Multimodal.withPayload(docs, "doc_id", "text"), "doc_id", "payload",
        frameBytes = 4, stride = 3)
      .select(col("doc_id"), col("frame_idx"), decode(col("frame"), "UTF-8"))
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    // "abcdefghij" (10 bytes): offsets 0,3,6 -> abcd, defg, ghij ("j" tail < 4 never starts)
    assert(got == Seq((1L, 0, "abcd"), (1L, 1, "defg"), (1L, 2, "ghij")))
  }
}
