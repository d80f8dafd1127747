package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("FakeCodec decode is deterministic and shape-correct") {
    val f = Multimodal.FakeCodec.decode(7L, "abcd".getBytes("UTF-8"))
    assert(f.doc_id == 7L && f.n_bytes == 4)
    assert(f.width == 64 + 4 && f.height == 64 + 2)
    assert(f.mean_byte == (97 + 98 + 99 + 100) / 4.0)
    assert(f.head_hex == "61626364")
    assert(f == Multimodal.FakeCodec.decode(7L, "abcd".getBytes("UTF-8")))
  }

  test("media column keeps metadata out of the blob (pruning-friendly)") {
    val docs = Seq((1L, "hello world")).toDF("doc_id", "text")
    val m = Multimodal.withMediaColumn(docs, "doc_id", "text")
    assert(m.columns.toSeq ==
      Seq("doc_id", "media", "media_bytes", "media_format"))
    assert(m.head().getAs[Int]("media_bytes") == 11)
  }

  test("decodeFeatures runs batched per partition end to end") {
    val docs = Seq((1L, "hello"), (2L, "worlds!")).toDF("doc_id", "text")
    val media = Multimodal.withMediaColumn(docs, "doc_id", "text")
    val feats = Multimodal.decodeFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes == 5 && feats(2L).n_bytes == 7)
    assert(feats(1L).head_hex == "68656c6c6f")
  }

  test("resizeDims fits into the box, keeps aspect, never upscales") {
    val feats = Seq(
      (1L, 640, 480),   // landscape, downscale by 1/4 → 160x120
      (2L, 100, 400),   // portrait, height-bound → 30x120
      (3L, 80, 60),     // already inside the box → untouched
      (4L, 10000, 1),   // degenerate thin strip → height clamps to 1
      (5L, 3000, 1000)) // 160/3000 not representable: floor would give 159
      .toDF("doc_id", "width", "height")
    val out = Multimodal.resizeDims(feats, maxW = 160, maxH = 120)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))).toMap
    assert(out == Map(1L -> ((160, 120)), 2L -> ((30, 120)),
      3L -> ((80, 60)), 4L -> ((160, 1)), 5L -> ((160, 53))))
  }

  test("frameSample windows the payload with stride") {
    val docs = Seq((1L, "abcdefghij")).toDF("doc_id", "text")
    val media = Multimodal.withMediaColumn(docs, "doc_id", "text")
    val r = Multimodal.frameSample(media, frameBytes = 4, stride = 2).head()
    assert(r.getAs[Int]("n_frames") == 4)
    val frames = r.getSeq[Array[Byte]](r.fieldIndex("frames"))
      .map(new String(_, "UTF-8"))
    assert(frames == Seq("abcd", "cdef", "efgh", "ghij"))
  }
}
