package graft.ner

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class ModelFormatSpec extends AnyFunSuite {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft-mf").resolve(name).toString

  test("valid tiny model loads: hparams, vocab split, tensors") {
    val p = tmp("valid.bin")
    TestModels.writeValid(p, weightGen = TestModels.seeded(42))
    val m = ModelFormat.loadFile(p).get
    assert(m.hparams == NerHparams(TestModels.DefaultVocab.length, 16, 8, 16, 2, 1, 0, 9))
    // "##db" and "##s" land in the subword map keyed WITHOUT the prefix
    assert(m.vocab.sub("db") == 4)
    assert(m.vocab.sub("s") == 12)
    assert(!m.vocab.main.contains("##db"))
    assert(m.vocab.main("duck") == 3)
    // id->token returns the original spelling
    assert(m.vocab.tokenOf(4) == "##db")
    assert(m.vocab.tokenOf(3) == "duck")
    assert(m.vocab.tokenOf(9999) == "[UNK]")
    assert(m.tensors.contains("classifier.bias"))
    assert(m.tensors("embeddings.word_embeddings.weight").numel ==
      8L * TestModels.DefaultVocab.length)
  }

  test("bad magic (the shipped placeholder semantics) yields None") {
    val p = tmp("badmagic.bin")
    TestModels.writeBadMagic(p)
    assert(ModelFormat.loadFile(p).isEmpty)
  }

  test("truncated file yields None") {
    val p = tmp("trunc.bin")
    TestModels.writeTruncated(p)
    assert(ModelFormat.loadFile(p).isEmpty)
  }

  test("missing file yields None") {
    assert(ModelFormat.loadFile("/tmp/does/not/exist/model.bin").isEmpty)
  }

  test("unknown extra tensors are tolerated") {
    val p = tmp("extra.bin")
    TestModels.writeValid(p, extraTensor = true, weightGen = TestModels.seeded(1))
    val m = ModelFormat.loadFile(p).get
    assert(m.tensors.contains("classifier.bias"))
    // encoder construction ignores the unknown tensor
    val enc = new BertEncoder(m)
    val logits = enc.eval(Array(1, 3, 2))
    assert(logits.length == 3 * 9)
    assert(logits.forall(f => !f.isNaN && !f.isInfinite))
  }

  test("f16 round-trip helper") {
    assert(ModelFormat.f16ToFloat(0x3c00) == 1.0f)
    assert(ModelFormat.f16ToFloat(0xc000) == -2.0f)
    assert(ModelFormat.f16ToFloat(0x0000) == 0.0f)
    assert(math.abs(ModelFormat.f16ToFloat(0x3555) - 0.333252f) < 1e-6)
    assert(ModelFormat.f16ToFloat(0x7c00).isPosInfinity)
    assert(ModelFormat.f16ToFloat(0x0001) == 5.9604645e-8f) // smallest subnormal
  }

  test("encoder is deterministic and shape-correct on a seeded model") {
    val p = tmp("seeded.bin")
    TestModels.writeValid(p, weightGen = TestModels.seeded(123))
    val m = ModelFormat.loadFile(p).get
    val enc = new BertEncoder(m)
    val t = Array(1, 3, 4, 2) // [CLS] duck ##db [SEP]
    val a = enc.eval(t)
    val b = enc.eval(t)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 4 * 9)
    assert(a.exists(_ != 0f))
  }
}
