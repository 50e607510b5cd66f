package graft.tools

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ner.{ModelFormat, TestModels}

/** End-to-end pin for the A8 converter port: materialize a synthetic
  * HF-format model directory (config.json + vocab.txt + model.safetensors
  * — the same artifacts `transformers` writes), convert with
  * [[ConvertHf]], and load the result through the repo's own
  * [[ModelFormat]] loader. Checks the full contract of
  * `convert_ner_to_ggml.py`: header ints, id-ordered vocab, "bert."
  * prefix stripping, position_ids skip, innermost-first dims, and the
  * ftype=1 rule (2-dim .weight → F16, everything else F32).
  */
class ConvertHfSpec extends AnyFunSuite {

  private val V = 7   // vocab
  private val H = 4   // hidden
  private val L = 9   // labels

  private def rng(seed: Int, n: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)((r.nextFloat() - 0.5f) * 2f)
  }

  /** name → (safetensors shape outermost-first, values). Ordered. */
  private def tensors: Seq[(String, Seq[Int], Array[Float])] = Seq(
    ("bert.embeddings.word_embeddings.weight", Seq(V, H), rng(1, V * H)),
    ("bert.embeddings.LayerNorm.weight", Seq(H), rng(2, H)),
    ("bert.embeddings.LayerNorm.bias", Seq(1, H), rng(3, H)), // squeezes
    ("classifier.weight", Seq(L, H), rng(4, L * H)),
    ("classifier.bias", Seq(L), rng(5, L)))

  private def writeSafetensors(path: String): Unit = {
    val withPosIds = tensors.map { case (n, sh, v) => (n, "F32", sh, v) } :+
      (("bert.embeddings.position_ids", "I64", Seq(1, 16),
        Array.tabulate(16)(_.toFloat)))
    var off = 0L
    val entries = withPosIds.map { case (name, dtype, shape, values) =>
      val w = if (dtype == "I64") 8 else 4
      val begin = off
      off += values.length.toLong * w
      (name, dtype, shape, values, begin, off)
    }
    val header = entries.map { case (name, dtype, shape, _, b, e) =>
      s""""$name":{"dtype":"$dtype","shape":[${shape.mkString(",")}],""" +
        s""""data_offsets":[$b,$e]}"""
    }.mkString("{", ",", "}")
    val hb = header.getBytes(StandardCharsets.UTF_8)
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      val len = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(hb.length.toLong).array()
      out.write(len); out.write(hb)
      entries.foreach { case (_, dtype, _, values, _, _) =>
        val bb = ByteBuffer
          .allocate(values.length * (if (dtype == "I64") 8 else 4))
          .order(ByteOrder.LITTLE_ENDIAN)
        if (dtype == "I64") values.foreach(v => bb.putLong(v.toLong))
        else values.foreach(bb.putFloat)
        out.write(bb.array())
      }
    } finally out.close()
  }

  private def materializeHfDir(): java.io.File = {
    val dir = Files.createTempDirectory("hf_model").toFile
    dir.deleteOnExit()
    Files.write(new java.io.File(dir, "config.json").toPath,
      s"""{"model_type":"bert","vocab_size":$V,
         |"max_position_embeddings":16,"hidden_size":$H,
         |"intermediate_size":8,"num_attention_heads":2,
         |"num_hidden_layers":1,
         |"id2label":{${(0 until L).map(i => s""""$i":"L$i"""").mkString(",")}}}
         |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    Files.write(new java.io.File(dir, "vocab.txt").toPath,
      Seq("[PAD]", "[CLS]", "[SEP]", "duck", "##db", "héllo", "x")
        .mkString("\n").getBytes(StandardCharsets.UTF_8))
    writeSafetensors(new java.io.File(dir, "model.safetensors").getPath)
    dir
  }

  test("F16 conversion (ftype=1) round-trips through ModelFormat.load") {
    val dir = materializeHfDir()
    val outF = Files.createTempFile("conv", ".bin").toFile
    outF.deleteOnExit()
    ConvertHf.convert(dir.getPath, outF.getPath, ftype = 1)
    val m = ModelFormat.loadFile(outF.getPath)
      .getOrElse(fail("converted model failed to load"))
    assert(m.hparams == graft.ner.NerHparams(V, 16, H, 8, 2, 1, 1, L))
    // vocab: id order preserved, UTF-8 + subword split intact
    assert(m.vocab.idToToken(3) == "duck")
    assert(m.vocab.idToToken(4) == "##db")
    assert(m.vocab.idToToken(5) == "héllo")
    // position_ids skipped; bert. prefix stripped
    assert(!m.tensors.keySet.exists(_.contains("position_ids")))
    assert(m.tensors.contains("embeddings.word_embeddings.weight"))
    // 2-dim .weight → F16 with the expected half-precision round-trip
    val we = m.tensors("embeddings.word_embeddings.weight")
    assert(we.isF16)
    assert(we.dims.toSeq == Seq(H, V)) // innermost-first
    assert(we.data.toSeq ==
      TestModels.f16Effective(tensors.head._3).toSeq)
    // 1-dim tensors stay exact F32, including the squeezed (1,H) bias
    val lnb = m.tensors("embeddings.LayerNorm.bias")
    assert(!lnb.isF16 && !lnb.isQ4)
    assert(lnb.dims.toSeq == Seq(H))
    assert(lnb.data.toSeq == tensors(2)._3.toSeq)
    assert(m.tensors("classifier.bias").data.toSeq == tensors(4)._3.toSeq)
  }

  test("F32 conversion (ftype=0) preserves every value bit-exactly") {
    val dir = materializeHfDir()
    val outF = Files.createTempFile("conv32", ".bin").toFile
    outF.deleteOnExit()
    ConvertHf.convert(dir.getPath, outF.getPath, ftype = 0)
    val m = ModelFormat.loadFile(outF.getPath)
      .getOrElse(fail("converted model failed to load"))
    assert(m.hparams.f16 == 0)
    tensors.foreach { case (name, _, values) =>
      val clean = name.stripPrefix("bert.")
      val t = m.tensors(clean)
      assert(!t.isF16 && !t.isQ4, s"$clean not F32")
      assert(t.data.toSeq == values.toSeq, s"$clean values drifted")
    }
  }

  test("non-BERT models are rejected like the reference script") {
    val dir = Files.createTempDirectory("hf_bad").toFile
    dir.deleteOnExit()
    Files.write(new java.io.File(dir, "config.json").toPath,
      """{"model_type":"roberta","vocab_size":1}"""
        .getBytes(StandardCharsets.UTF_8))
    val e = intercept[IllegalArgumentException] {
      ConvertHf.convert(dir.getPath, "/tmp/never_written.bin")
    }
    assert(e.getMessage.contains("Only BERT models are supported"))
  }
}
