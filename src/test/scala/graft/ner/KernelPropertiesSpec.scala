package graft.ner

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties over the pure NER kernels — the invariants the
  * reference relies on implicitly but never tests (SURVEY §5 test plan).
  * Raw ScalaCheck runner (the scalatest-plus bridge isn't on the offline
  * classpath).
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private def holds(name: String)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val vocab: NerVocab = {
    val tokens = TestModels.DefaultVocab
    val main = scala.collection.mutable.Map[String, Int]()
    val sub = scala.collection.mutable.Map[String, Int]()
    val id2 = scala.collection.mutable.Map[Int, String]()
    tokens.zipWithIndex.foreach { case (t, i) =>
      id2 += i -> t
      if (t.length > 2 && t.startsWith("##")) sub += t.substring(2) -> i
      else main += t -> i
    }
    NerVocab(main.toMap, sub.toMap, id2.toMap)
  }

  private val genWord: Gen[String] = Gen.oneOf(
    Gen.oneOf(TestModels.DefaultVocab.filterNot(_.startsWith("["))),
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("##", "早stream", "éclair", "duck##db", ""))

  private val genText: Gen[String] =
    Gen.listOf(genWord).map(_.mkString(" "))

  test("tokenizer: output fits nMaxTokens, brackets with CLS/SEP, no [UNK]") {
    holds("tokenize") {
      Prop.forAll(genText, Gen.choose(3, 32)) { (text, maxTok) =>
        val ids = WordPiece.tokenize(vocab, text, maxTok)
        ids.length <= maxTok &&
          ids.head == vocab.main("[CLS]") &&
          ids.last == vocab.main("[SEP]") &&
          ids.forall(vocab.idToToken.contains)
      }
    }
  }

  test("tokenizer is deterministic") {
    holds("determinism") {
      Prop.forAll(genText) { text =>
        WordPiece.tokenize(vocab, text, 16).toSeq ==
          WordPiece.tokenize(vocab, text, 16).toSeq
      }
    }
  }

  test("merge never emits empty or O-labeled entities, bounded by non-O count") {
    holds("merge") {
      Prop.forAll(Gen.listOf(Gen.choose(0, 8))) { labels =>
        val tokens = labels.indices.map(i =>
          vocab.tokenOf(3 + (i % (TestModels.DefaultVocab.length - 3))))
        val ents = BioMerge.merge(tokens.toIndexedSeq, labels.toIndexedSeq)
        ents.forall(e => e.entity.nonEmpty && e.label != "O" &&
          e.label.nonEmpty) && ents.size <= labels.count(_ != 0)
      }
    }
  }

  test("argmax matches the specification (ties to lowest index)") {
    holds("argmax") {
      Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-100f, 100f))) { xs =>
        val arr = xs.toArray
        val got = BioMerge.argmax(arr, 0, arr.length)
        arr(got) == arr.max && got == arr.indexOf(arr.max)
      }
    }
  }

  test("deterministic expf tracks Math.exp within 2 ulp-ish relative error") {
    // ExpF is the encoder's softmax/gelu basis: accuracy must stay in the
    // expf class across the whole clamped domain, and the scalar kernel
    // must agree with itself bitwise on repeated evaluation (determinism
    // is the reason it exists — VectorOperators.EXP changed with JIT state)
    holds("expf") {
      Prop.forAll(Gen.choose(-87f, 88f)) { x =>
        val got = ExpF.expf(x).toDouble
        val want = math.exp(x.toDouble)
        math.abs(got - want) / want <= 2e-7 &&
          ExpF.expf(x) == ExpF.expf(x)
      }
    }
  }

  test("expf clamps instead of overflowing/underflowing") {
    assert(ExpF.expf(1000f).isPosInfinity == false)
    assert(ExpF.expf(1000f) == ExpF.expf(ExpF.MaxX))
    assert(ExpF.expf(-1000f) == ExpF.expf(ExpF.MinX))
    assert(ExpF.expf(-1000f) > 0f)
    assert(ExpF.expf(0f) == 1f)
  }

  test("matmulQ4: every kernel matches the dequantized-F32 definition") {
    // property: for random Q4_0 weights and activations, each kernel's
    // quantized-native output equals the plain dot of the DEQUANTIZED
    // weights within accumulation-order tolerance — scalar and SIMD decode
    // the same blocks, so a nibble/scale/lane bug shows up as a gross
    // mismatch, not a rounding one
    val genCase = for {
      blocks <- Gen.choose(1, 4)
      out <- Gen.choose(1, 7)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (blocks, out, seed)
    holds("matmulQ4 vs dequantized reference")(Prop.forAll(genCase) {
      case (blocks, out, seed) =>
        val in = blocks * 32
        val r = new scala.util.Random(seed)
        val w = Array.fill(out * in)((r.nextFloat() - 0.5f) * 0.4f)
        val wq = ModelFormat.quantizeQ4(w)
        val eff = ModelFormat.dequantQ4(wq, w.length)
        val x = Array.fill(in)((r.nextFloat() - 0.5f) * 2f)
        val b = Array.fill(out)((r.nextFloat() - 0.5f))
        val expect = Array.tabulate(out) { o =>
          var acc = b(o).toDouble
          var i = 0
          while (i < in) { acc += eff(o * in + i).toDouble * x(i); i += 1 }
          acc
        }
        Kernels.all.forall { k =>
          val y = new Array[Float](out)
          k.matmulQ4(x, 0, in, wq, out, b, y, 0)
          (0 until out).forall { o =>
            val tol = 1e-4 * math.max(1.0, math.abs(expect(o)))
            math.abs(y(o) - expect(o)) <= tol
          }
        }
    })
  }

  test("f16 widening is strictly monotone on finite positive halves") {
    holds("f16") {
      Prop.forAll(Gen.choose(0x0000, 0x7bfe)) { bits =>
        ModelFormat.f16ToFloat(bits) < ModelFormat.f16ToFloat(bits + 1)
      }
    }
  }

  test("single-FloatVector-species rule holds structurally in graft.ner") {
    // Round-8 trap, now a build-breaking assertion instead of a comment
    // convention: two different FloatVector species hot in one JVM (e.g. a
    // fixed SPECIES_256 next to SPECIES_PREFERRED=512) pollute the shared
    // FloatVector template call-site profiles until C2 recompiles every
    // SIMD kernel WITHOUT vector intrinsics — a silent 5-10x slowdown for
    // the JVM's lifetime (BASELINE.md r8). Every FloatVector species
    // mention in main sources must be SPECIES_PREFERRED, except the single
    // documented qsp cap in Kernels.scala (SPECIES_512, reachable only when
    // SPECIES_PREFERRED *is* 512-bit, so no second species ever runs).
    // Byte/Short/Int-side species are exempt: only the FloatVector
    // templates carry the hot float kernels.
    val srcRoot = java.nio.file.Paths.get("src/main/scala/graft")
    assert(java.nio.file.Files.isDirectory(srcRoot),
      s"expected to run from the repo root, cwd=${System.getProperty("user.dir")}")
    val speciesRef = """FloatVector\.SPECIES_(\w+)""".r
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    java.nio.file.Files.walk(srcRoot).forEach { p =>
      if (p.toString.endsWith(".scala")) {
        val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        for (m <- speciesRef.findAllMatchIn(text)) {
          val ok = m.group(1) == "PREFERRED" ||
            (m.group(1) == "512" && p.getFileName.toString == "Kernels.scala")
          if (!ok) offenders += s"$p: FloatVector.SPECIES_${m.group(1)}"
        }
      }
    }
    assert(offenders.isEmpty,
      "fixed FloatVector species outside the documented Kernels.scala cap " +
        s"(de-intrinsification trap, BASELINE.md r8):\n${offenders.mkString("\n")}")
    // and the cap itself must still be the guarded equals-preferred form
    val kernels = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/ner/Kernels.scala")), "UTF-8")
    assert(kernels.contains("if (sp.length >= 16) FloatVector.SPECIES_512 else sp"),
      "Kernels.scala qsp cap changed shape — re-review the single-species rule")
  }
}
