package graft.ner

import org.scalatest.funsuite.AnyFunSuite

/** Pins the batched forward pass ([[BertEncoder.evalBatch]]) to the
  * per-document path: identical logits for every document regardless of how
  * documents are packed into batches (the attention is block-diagonal and
  * the linears are row-independent, so batching may not change a single
  * bit), and the partition-level wrapper preserves order, null semantics,
  * and the truncate guard.
  */
class BertEncoderBatchSpec extends AnyFunSuite {

  private val loaded = SyntheticModel.loaded
  private val m = loaded.model
  private val enc = loaded.encoder

  private val texts = Seq(
    "hello world 42",
    "a",
    "",
    "the quick brown fox jumps over the lazy dog 0123456789",
    ("entity extraction over a considerably longer document body " * 8),
    "z9")

  private def toks(t: String): Array[Int] =
    WordPiece.tokenize(m.vocab, t, m.hparams.nMaxTokens)

  test("evalBatch logits are bit-identical to per-document eval") {
    val docs = texts.map(toks).toArray
    val singles = docs.map(enc.eval)
    for (split <- Seq(1, 2, 3, docs.length)) {
      val batched = docs.grouped(split).flatMap(enc.evalBatch).toArray
      assert(batched.length == singles.length, s"split=$split")
      for (i <- singles.indices)
        assert(java.util.Arrays.equals(batched(i), singles(i)),
          s"split=$split doc=$i diverges")
    }
  }

  test("evalPartition preserves order, null rows, and row results") {
    val rows = Seq[(Long, String)](
      (1L, texts(0)), (2L, null), (3L, texts(3)), (4L, texts(2)),
      (5L, texts(4)))
    val got = Ner.evalPartition(Some(loaded), rows.iterator, truncate = true)
      .toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(got(1)._2 == null) // with a model, NULL maps to NULL
    val viaSingle = rows.map { case (id, t) =>
      id -> Ner.evalWith(Some(loaded), t, truncate = true)
    }
    for (((id, ents), (_, want)) <- got.zip(viaSingle)) {
      if (want == null) assert(ents == null, s"row $id")
      else assert(ents.toSeq == want.toSeq, s"row $id")
    }
  }

  test("evalPartition with no model yields [] for every row, nulls included") {
    val rows = Seq[(Long, String)]((1L, "abc"), (2L, null))
    val got = Ner.evalPartition(None, rows.iterator, truncate = true).toSeq
    assert(got.forall(_._2.isEmpty))
  }

  test("evalPartition enforces the truncate=false guard with the exact message") {
    val long = "a b c " * 200
    val rows = Seq[(Long, String)]((1L, long))
    val e = intercept[IllegalArgumentException] {
      Ner.evalPartition(Some(loaded), rows.iterator, truncate = false)
        .toSeq
    }
    assert(e.getMessage ==
      "Input string exceeds model token limit and truncate=false")
  }

  test("batches split at the token budget, never mid-document") {
    // synthetic model weights fit L2 -> per-document batches (= nMaxTokens)
    val budget = Ner.batchTokenBudget(m.hparams)
    assert(budget >= m.hparams.nMaxTokens)
    // a single oversized stream still evaluates (one doc per batch minimum)
    val many = (1 to 100).map(i => (i.toLong, texts(4)))
    val got = Ner.evalPartition(Some(loaded), many.iterator, truncate = true)
      .toSeq
    assert(got.size == 100 && got.forall(_._2 != null))
  }
}
