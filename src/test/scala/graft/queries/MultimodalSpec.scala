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
}
