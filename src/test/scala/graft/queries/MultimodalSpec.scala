package graft.queries

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  test("decode stub is deterministic arithmetic on the payload bytes") {
    val rows = Iterator(
      Multimodal.MediaRow(1L, Array.fill[Byte](640 * 3)(7)),
      Multimodal.MediaRow(2L, Array.fill[Byte](641)(0)))
    val out = Multimodal.decodeStub(rows).toSeq
    assert(out(0) == Multimodal.MediaMeta(1L, 1920, 0, (1920 * 7) % 480, "jpg"))
    assert(out(1) == Multimodal.MediaMeta(2L, 641, 1, (641 * 7) % 480,
      if (641 % 3 == 1) "png" else "webp"))
  }

  test("typed mapPartitions pipeline agrees with the expression query") {
    val viaDataset = Multimodal.decodePipeline(spark, sf())
      .toDF().orderBy("doc_id").collect().toSeq
    val viaExprs = SparkEntry_q45(sf()).collect().toSeq
    assert(viaDataset == viaExprs)
  }

  private def SparkEntry_q45(dir: String) =
    graft.SparkEntry.queries("q45_multimodal_meta")(spark, dir)
      .select("doc_id", "n_bytes", "fake_width", "fake_height", "fake_format")

  test("resize stub preserves aspect and never upscales") {
    val in = Iterator(
      Multimodal.MediaMeta(1L, 0, 1280, 720, "jpg"),
      Multimodal.MediaMeta(2L, 0, 320, 200, "png"))
    val out = Multimodal.resizeStub(in, maxW = 640).toSeq
    assert(out(0) == Multimodal.MediaMeta(1L, 0, 640, 360, "jpg"))
    assert(out(1) == Multimodal.MediaMeta(2L, 0, 320, 200, "png"))
  }

  test("frame sampling emits stride-spaced offsets within the payload") {
    val in = Iterator(Multimodal.MediaRow(1L, new Array[Byte](100)))
    val (_, offs) = Multimodal.frameSampleStub(in, stride = 32).next()
    assert(offs == Seq(0, 32, 64))
    assert(offs.forall(_ + 16 <= 100))
  }
}
