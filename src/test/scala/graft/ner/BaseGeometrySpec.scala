package graft.ner

import org.scalatest.funsuite.AnyFunSuite

/** The multi-doc weight-streaming branch of `Ner.evalPartition`'s batch
  * auto-sizing, exercised at the geometry it exists for (round-9 VERDICT
  * #3): bert-base-class hparams put ~28 MB of weights in every layer, so
  * `batchTokenBudget` must take its streaming branch (bounded multi-doc
  * budget, NOT the cache-resident per-document default), and packing
  * several documents into ONE encoder batch must produce exactly the
  * per-document results. `ProfileBase` measures throughput at this
  * geometry; this spec pins its correctness.
  */
class BaseGeometrySpec extends AnyFunSuite {

  test("bert-base geometry takes the streaming budget branch") {
    val hp = SyntheticModel.BaseHparams
    val layerWeightBytes =
      4L * (4L * hp.nEmbd * hp.nEmbd + 2L * hp.nEmbd * hp.nIntermediate)
    assert(layerWeightBytes > (1L << 20),
      "bert-base layers must be beyond L2 residency or this spec tests nothing")
    val budget = Ner.batchTokenBudget(hp)
    // streaming branch: scratch-bounded, at least a full context window
    assert(budget == math.max(hp.nMaxTokens,
      (4 << 20) / (hp.nIntermediate + 8 * hp.nEmbd)))
    // and the scratch bound it encodes stays ~16 MB/thread
    val scratchBytes = 4L * budget * (hp.nIntermediate + 8L * hp.nEmbd)
    assert(scratchBytes < (32L << 20))
  }

  test("multi-doc batch at bert-base geometry matches per-doc eval exactly") {
    val loaded = SyntheticModel.loadedBase
    val docs = Seq("new york", "bob was here", "a duck swims in spark",
      "data graft", "the 42 ducks of 2024")
    val vocab = loaded.model.vocab
    val totalTokens = docs.map(d =>
      WordPiece.tokenize(vocab, d, loaded.model.hparams.nMaxTokens).length).sum
    // all five docs fit ONE encoder batch -> the multi-doc branch runs
    assert(totalTokens <= Ner.batchTokenBudget(loaded.model.hparams))
    val batched = Ner.evalPartition(Some(loaded),
      docs.iterator.map(d => (d, d)), truncate = true).toSeq
    assert(batched.map(_._1) == docs)
    docs.zip(batched).foreach { case (d, (_, ents)) =>
      val single = Ner.evalWith(Some(loaded), d, truncate = true)
      assert(ents.toSeq == single.toSeq, s"batch/per-doc mismatch for '$d'")
    }
  }
}
