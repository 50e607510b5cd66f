package graft.ner

import scala.util.Random

/** Deterministic in-memory demo model (no file, no download): a character-
  * level WordPiece vocab (`a-z0-9` + `##`-subwords + specials) with seeded
  * pseudo-random weights at bert-tiny-ish dimensions. Exists so the
  * with-model inference path — tokenizer, transformer forward pass, BIO
  * merge — can be exercised and benchmarked end-to-end in environments with
  * no real model artifact (the driver's, and CI). The entities it emits are
  * meaningless but fully deterministic.
  *
  * Round 10 adds the BERT-BASE-GEOMETRY twin ([[loadedBase]] and its
  * F16/Q4 variants): same vocab and build rules at the reference's
  * recommended model class (`dslim/bert-base-NER`, ~110 M params —
  * reference TEST.md:26), where a layer's weight panels (~28 MB) can NEVER
  * be cache-resident and every matmul STREAMS weights from DRAM — the
  * regime the F16/Q4 kernels exist for. `ProfileBase` measures the
  * F32/F16/Q4 crossover there; BASELINE.md records it.
  */
object SyntheticModel {

  val Hparams: NerHparams = NerHparams(
    nVocab = 0, // patched below after vocab construction
    nMaxTokens = 128,
    nEmbd = 64,
    nIntermediate = 256,
    nHead = 2,
    nLayer = 2,
    f16 = 0,
    nLabels = 9)

  /** bert-base geometry (hidden 768, 12 layers, 12 heads, FFN 3072,
    * 512-token context): ~85 M encoder parameters over the same synthetic
    * vocab — the weight-streaming regime (28 MB/layer vs ~1 MB L2).
    */
  val BaseHparams: NerHparams = NerHparams(
    nVocab = 0,
    nMaxTokens = 512,
    nEmbd = 768,
    nIntermediate = 3072,
    nHead = 12,
    nLayer = 12,
    f16 = 0,
    nLabels = 9)

  private val chars: Seq[String] =
    ("abcdefghijklmnopqrstuvwxyz0123456789").map(_.toString)

  val VocabTokens: Seq[String] =
    Seq("[PAD]", "[CLS]", "[SEP]") ++ chars ++ chars.map("##" + _)

  private def seeded(name: String, n: Int): Array[Float] = {
    val r = new Random(0xC0FFEE ^ name.hashCode.toLong)
    Array.fill(n)((r.nextFloat() - 0.5f) * 0.2f)
  }

  private def buildModel(hp0: NerHparams): NerModel = {
    val hp = hp0.copy(nVocab = VocabTokens.length)
    val main = Map.newBuilder[String, Int]
    val sub = Map.newBuilder[String, Int]
    val id2 = Map.newBuilder[Int, String]
    VocabTokens.zipWithIndex.foreach { case (t, i) =>
      id2 += i -> t
      if (t.length > 2 && t.startsWith("##")) sub += t.substring(2) -> i
      else main += t -> i
    }
    val t = Map.newBuilder[String, NerTensor]
    def add(name: String, dims: Array[Int]): Unit =
      t += name -> NerTensor(dims, seeded(name, dims.product))
    add("embeddings.word_embeddings.weight", Array(hp.nEmbd, hp.nVocab))
    add("embeddings.token_type_embeddings.weight", Array(hp.nEmbd, 2))
    add("embeddings.position_embeddings.weight", Array(hp.nEmbd, hp.nMaxTokens))
    add("embeddings.LayerNorm.weight", Array(hp.nEmbd))
    add("embeddings.LayerNorm.bias", Array(hp.nEmbd))
    for (i <- 0 until hp.nLayer) {
      val b = s"encoder.layer.$i."
      add(b + "attention.self.query.weight", Array(hp.nEmbd, hp.nEmbd))
      add(b + "attention.self.query.bias", Array(hp.nEmbd))
      add(b + "attention.self.key.weight", Array(hp.nEmbd, hp.nEmbd))
      add(b + "attention.self.key.bias", Array(hp.nEmbd))
      add(b + "attention.self.value.weight", Array(hp.nEmbd, hp.nEmbd))
      add(b + "attention.self.value.bias", Array(hp.nEmbd))
      add(b + "attention.output.dense.weight", Array(hp.nEmbd, hp.nEmbd))
      add(b + "attention.output.dense.bias", Array(hp.nEmbd))
      add(b + "attention.output.LayerNorm.weight", Array(hp.nEmbd))
      add(b + "attention.output.LayerNorm.bias", Array(hp.nEmbd))
      add(b + "intermediate.dense.weight", Array(hp.nEmbd, hp.nIntermediate))
      add(b + "intermediate.dense.bias", Array(hp.nIntermediate))
      add(b + "output.dense.weight", Array(hp.nIntermediate, hp.nEmbd))
      add(b + "output.dense.bias", Array(hp.nEmbd))
      add(b + "output.LayerNorm.weight", Array(hp.nEmbd))
      add(b + "output.LayerNorm.bias", Array(hp.nEmbd))
    }
    add("classifier.weight", Array(hp.nEmbd, hp.nLabels))
    add("classifier.bias", Array(hp.nLabels))
    NerModel(hp, NerVocab(main.result(), sub.result(), id2.result()),
      t.result())
  }

  /** Q4_0-quantized twin: every %32-compatible linear weight re-quantized
    * to raw ggml blocks, so the encoder takes the quantized-native matmul
    * path ([[DotKernel.matmulQ4]]) end-to-end. Entities can differ
    * slightly from the F32 twin's (quantization moves logits) — fine:
    * these variants exist for kernel exercise and profiling; the
    * oracle-facing output stays pinned to the F32 model.
    */
  private def q4Twin(base: NerModel): Ner.Loaded = {
    val tensors = base.tensors.map { case (name, t) =>
      if (ModelFormat.isLinearWeight(name) && t.numel % 32 == 0)
        name -> NerTensor(t.dims, null, ModelFormat.quantizeQ4(t.data))
      else name -> t
    }
    val model = base.copy(tensors = tensors)
    Ner.Loaded(model, new BertEncoder(model))
  }

  /** F16 twin: every linear weight narrowed to raw IEEE 754 halves, so the
    * encoder takes the half-native matmul path ([[DotKernel.matmulF16]],
    * round-8 VERDICT #4) end-to-end. Same logit-movement caveat as
    * [[q4Twin]].
    */
  private def f16Twin(base: NerModel): Ner.Loaded = {
    val tensors = base.tensors.map { case (name, t) =>
      if (ModelFormat.isLinearWeight(name))
        name -> NerTensor(t.dims, null,
          f16raw = t.data.map(v => ModelFormat.floatToF16(v).toShort))
      else name -> t
    }
    val model = base.copy(tensors = tensors)
    Ner.Loaded(model, new BertEncoder(model))
  }

  /** Build the model once per JVM (shared across tasks like a loaded file). */
  lazy val loaded: Ner.Loaded = {
    val model = buildModel(Hparams)
    Ner.Loaded(model, new BertEncoder(model))
  }

  /** Q4_0-quantized twin of [[loaded]] (all shapes here are
    * %32-compatible: embd 64, intermediate 256) — the profile counterpart
    * for the F32 session (numbers in BASELINE.md).
    */
  lazy val loadedQ4: Ner.Loaded = q4Twin(loaded.model)

  /** F16 twin of [[loaded]] — the third point of the F32/F16/Q4
    * weight-precision profile (numbers in BASELINE.md).
    */
  lazy val loadedF16: Ner.Loaded = f16Twin(loaded.model)

  /** bert-base-geometry F32 model (~340 MB of weights, built once per
    * JVM, a few seconds of seeded generation). */
  lazy val loadedBase: Ner.Loaded = {
    val model = buildModel(BaseHparams)
    Ner.Loaded(model, new BertEncoder(model))
  }

  /** bert-base-geometry Q4_0 twin (embd 768, FFN 3072 — %32-compatible). */
  lazy val loadedBaseQ4: Ner.Loaded = q4Twin(loadedBase.model)

  /** bert-base-geometry F16 twin. */
  lazy val loadedBaseF16: Ner.Loaded = f16Twin(loadedBase.model)
}
