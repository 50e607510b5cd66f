package graft.ner

/** Plain-Scala BERT token-classification forward pass over float arrays,
  * computing the same network as the reference's ggml graph
  * (reference: `src/ner_model.cpp:315-425`):
  *
  * embeddings (word + token_type[0] + position) -> LayerNorm -> N x
  * { self-attention (Q,K,V; scores / sqrt(d_head); softmax; out-proj) +
  *   residual + LayerNorm; FFN (GELU intermediate, output) + residual +
  *   LayerNorm } -> linear classifier -> logits [nTokens x nLabels].
  *
  * Bitwise equality with ggml's F16 kernels is explicitly out of scope
  * (SURVEY.md §7 risk 5); the computation graph, constants (LayerNorm eps
  * 1e-5, tanh-approximated GELU as in `ggml_gelu`) and weight orientation
  * (HF `[out,in]` row-major linears: y = Wx + b) match.
  *
  * Weights are pre-extracted into flat arrays at construction; one encoder
  * instance is built per loaded model per executor and reused across rows
  * (mirrors the reference's per-chunk buffer reuse, `ner_extension.cpp:92-95`).
  */
final class BertEncoder(model: NerModel) {
  import model.{hparams => hp}

  /** `expected` is Long so adversarial-but-accepted headers can't overflow
    * Int multiplication at the call sites (the loader's product guards keep
    * legal sizes within Int range; anything outside falls back to empty).
    */
  private def req(name: String, expected: Long): Array[Float] = {
    val t = model.tensors.get(name).map(_.data).getOrElse(Array.emptyFloatArray)
    if (t.length.toLong == expected) t
    else if (expected >= 0 && expected <= Int.MaxValue)
      new Array[Float](expected.toInt) // missing/mismatched stays zero, like ggml's zero-init arena
    else Array.emptyFloatArray
  }

  private val nEmbd = hp.nEmbd
  private val nHead = hp.nHead
  private val dHead = nEmbd / nHead
  private val nInter = hp.nIntermediate
  private val nLabels = hp.nLabels

  private val wordEmb = req("embeddings.word_embeddings.weight", hp.nVocab.toLong * nEmbd)
  private val typeEmb = req("embeddings.token_type_embeddings.weight", 2L * nEmbd)
  private val posEmb = req("embeddings.position_embeddings.weight", hp.nMaxTokens.toLong * nEmbd)
  private val lnEw = req("embeddings.LayerNorm.weight", nEmbd)
  private val lnEb = req("embeddings.LayerNorm.bias", nEmbd)
  private val clsW = req("classifier.weight", nLabels.toLong * nEmbd)
  private val clsB = req("classifier.bias", nLabels)

  // plain class, not case class: it's a weight holder — the synthesized
  // case-class equals on a nested class also trips the unchecked
  // outer-reference warning
  private final class Layer(
      val qw: Array[Float], val qb: Array[Float],
      val kw: Array[Float], val kb: Array[Float],
      val vw: Array[Float], val vb: Array[Float],
      val ow: Array[Float], val ob: Array[Float],
      val lnAw: Array[Float], val lnAb: Array[Float],
      val fiW: Array[Float], val fiB: Array[Float],
      val foW: Array[Float], val foB: Array[Float],
      val lnOw: Array[Float], val lnOb: Array[Float]
  )

  private val layers: Array[Layer] = Array.tabulate(hp.nLayer) { i =>
    val b = s"encoder.layer.$i."
    new Layer(
      qw = req(b + "attention.self.query.weight", nEmbd.toLong * nEmbd),
      qb = req(b + "attention.self.query.bias", nEmbd),
      kw = req(b + "attention.self.key.weight", nEmbd.toLong * nEmbd),
      kb = req(b + "attention.self.key.bias", nEmbd),
      vw = req(b + "attention.self.value.weight", nEmbd.toLong * nEmbd),
      vb = req(b + "attention.self.value.bias", nEmbd),
      ow = req(b + "attention.output.dense.weight", nEmbd.toLong * nEmbd),
      ob = req(b + "attention.output.dense.bias", nEmbd),
      lnAw = req(b + "attention.output.LayerNorm.weight", nEmbd),
      lnAb = req(b + "attention.output.LayerNorm.bias", nEmbd),
      fiW = req(b + "intermediate.dense.weight", nInter.toLong * nEmbd),
      fiB = req(b + "intermediate.dense.bias", nInter),
      foW = req(b + "output.dense.weight", nEmbd.toLong * nInter),
      foB = req(b + "output.dense.bias", nEmbd),
      lnOw = req(b + "output.LayerNorm.weight", nEmbd),
      lnOb = req(b + "output.LayerNorm.bias", nEmbd)
    )
  }

  /** y[n x out] = x[n x in] * W^T[out x in] + b, into a caller-provided
    * buffer. The dot goes through [[Kernels.best]] — Vector-API SIMD when
    * available, 4-way-unrolled f32 scalar otherwise (either way f32
    * accumulation, like ggml's `ggml_vec_dot_f32`).
    */
  private def linear(x: Array[Float], n: Int, in: Int, out: Int,
      w: Array[Float], b: Array[Float], y: Array[Float]): Array[Float] = {
    val kern = Kernels.best
    var r = 0
    while (r < n) {
      val xo = r * in
      var o = 0
      while (o < out) {
        y(r * out + o) = kern.dot(x, xo, w, o * in, in) + b(o)
        o += 1
      }
      r += 1
    }
    y
  }

  /** In-place LayerNorm per row, ggml_norm semantics (eps 1e-5) then scale+shift. */
  private def layerNorm(x: Array[Float], n: Int, d: Int,
      w: Array[Float], b: Array[Float]): Unit = {
    val eps = 1e-5
    var r = 0
    while (r < n) {
      val off = r * d
      var mean = 0.0
      var i = 0
      while (i < d) { mean += x(off + i); i += 1 }
      mean /= d
      var variance = 0.0
      i = 0
      while (i < d) { val v = x(off + i) - mean; variance += v * v; i += 1 }
      variance /= d
      val inv = 1.0 / math.sqrt(variance + eps)
      i = 0
      while (i < d) {
        x(off + i) = (((x(off + i) - mean) * inv) * w(i) + b(i)).toFloat
        i += 1
      }
      r += 1
    }
  }

  /** ggml_gelu: tanh approximation, computed in sigmoid form —
    * 0.5x(1+tanh(y)) == x * sigma(2y) — so it costs one `exp` instead of a
    * `tanh` (~2x cheaper on the JVM, same function up to fp rounding).
    */
  @inline private def gelu(x: Float): Float = {
    val y2 = 2.0 * 0.7978845608028654 * (x + 0.044715 * x * x * x)
    (x / (1.0 + math.exp(-y2))).toFloat
  }

  /** Per-thread scratch, sized once for nMaxTokens and reused across rows —
    * the reference's per-chunk buffer reuse (`ner_extension.cpp:92-95`)
    * adapted to shared-encoder / many-task execution (ThreadLocal because
    * one Loaded encoder is shared by every task in the executor JVM).
    *
    * Retention note (round-2 ADVICE): each pooled executor thread holds one
    * Scratch per live encoder (~16 MB/thread at real BERT-base dims), and a
    * replaced encoder's scratch lingers until the encoder itself is GC'd
    * (the ThreadLocal is a field of this encoder, so it is unreachable as
    * soon as the encoder is). Acceptable for the bert-tiny-class models
    * this engine targets; a future large-model path should bucket scratch
    * by actual token count instead of nMaxTokens.
    */
  private final class Scratch {
    val h = new Array[Float](hp.nMaxTokens * nEmbd)
    val q = new Array[Float](hp.nMaxTokens * nEmbd)
    val k = new Array[Float](hp.nMaxTokens * nEmbd)
    val v = new Array[Float](hp.nMaxTokens * nEmbd)
    val att = new Array[Float](hp.nMaxTokens * nEmbd)
    val t1 = new Array[Float](hp.nMaxTokens * nEmbd)
    val inter = new Array[Float](hp.nMaxTokens * nInter)
    val scores = new Array[Double](hp.nMaxTokens)
    val probs = new Array[Float](hp.nMaxTokens)
  }

  private val scratch: ThreadLocal[Scratch] =
    ThreadLocal.withInitial(() => new Scratch)

  /** Run the encoder; returns logits flattened token-major: logit(t, l) =
    * result(t * nLabels + l), same layout the reference memcpy's out
    * (`src/ner_model.cpp:423`).
    */
  def eval(tokens: Array[Int]): Array[Float] = {
    val n = tokens.length
    val s = scratch.get()
    val h = s.h
    var t = 0
    while (t < n) {
      val tok = if (tokens(t) >= 0 && tokens(t) < hp.nVocab) tokens(t) else 0
      val wOff = tok * nEmbd
      val pOff = math.min(t, hp.nMaxTokens - 1) * nEmbd
      val hOff = t * nEmbd
      var i = 0
      while (i < nEmbd) {
        h(hOff + i) = wordEmb(wOff + i) + typeEmb(i) + posEmb(pOff + i)
        i += 1
      }
      t += 1
    }
    layerNorm(h, n, nEmbd, lnEw, lnEb)

    val scale = 1.0 / math.sqrt(dHead.toDouble)
    var li = 0
    while (li < layers.length) {
      val L = layers(li)
      val q = linear(h, n, nEmbd, nEmbd, L.qw, L.qb, s.q)
      val k = linear(h, n, nEmbd, nEmbd, L.kw, L.kb, s.k)
      val v = linear(h, n, nEmbd, nEmbd, L.vw, L.vb, s.v)

      val att = s.att
      val scores = s.scores
      val probs = s.probs
      val kern = Kernels.best
      var head = 0
      while (head < nHead) {
        val hOff = head * dHead
        var qi = 0
        while (qi < n) {
          val qo = qi * nEmbd + hOff
          var kj = 0
          var maxS = Double.NegativeInfinity
          while (kj < n) {
            val sc = kern.dot(q, qo, k, kj * nEmbd + hOff, dHead) * scale
            scores(kj) = sc
            if (sc > maxS) maxS = sc
            kj += 1
          }
          // softmax in double for stability, weights to float for the AV pass
          var sum = 0.0
          kj = 0
          while (kj < n) { val e = math.exp(scores(kj) - maxS); scores(kj) = e; sum += e; kj += 1 }
          val inv = (1.0 / sum).toFloat
          kj = 0
          while (kj < n) { probs(kj) = scores(kj).toFloat * inv; kj += 1 }
          // AV as saxpy over the head slice (unit stride, vectorizable)
          var d = 0
          while (d < dHead) { att(qo + d) = 0f; d += 1 }
          kj = 0
          while (kj < n) {
            kern.axpy(probs(kj), v, kj * nEmbd + hOff, att, qo, dHead)
            kj += 1
          }
          qi += 1
        }
        head += 1
      }

      val attOut = linear(att, n, nEmbd, nEmbd, L.ow, L.ob, s.t1)
      var i = 0
      val nd = n * nEmbd
      while (i < nd) { attOut(i) += h(i); i += 1 }
      layerNorm(attOut, n, nEmbd, L.lnAw, L.lnAb)

      val inter = linear(attOut, n, nEmbd, nInter, L.fiW, L.fiB, s.inter)
      i = 0
      val ni = n * nInter
      while (i < ni) { inter(i) = gelu(inter(i)); i += 1 }
      // FFN output overwrites h (not read again this layer), then residual
      val ffOut = linear(inter, n, nInter, nEmbd, L.foW, L.foB, h)
      i = 0
      while (i < nd) { ffOut(i) += attOut(i); i += 1 }
      layerNorm(ffOut, n, nEmbd, L.lnOw, L.lnOb)

      li += 1
    }

    linear(h, n, nEmbd, nLabels, clsW, clsB, new Array[Float](n * nLabels))
  }
}
