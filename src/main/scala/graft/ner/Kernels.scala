package graft.ner

/** Dot / axpy kernels behind a monomorphic dispatch: the SIMD variant uses
  * the Java 17 Vector API (`jdk.incubator.vector`, public JDK API — the JVM
  * analogue of ggml's hand-vectorized F32 kernels) when the module is on the
  * runtime (`--add-modules jdk.incubator.vector`, set in build.sbt for all
  * forked runs); otherwise the 4-way-unrolled scalar versions. Chosen once
  * at class-init so the JIT devirtualizes the call sites.
  */
private[ner] trait DotKernel {
  /** sum_i x(xo+i) * w(wo+i) */
  def dot(x: Array[Float], xo: Int, w: Array[Float], wo: Int, len: Int): Float
  /** y(yo+i) += a * v(vo+i) */
  def axpy(a: Float, v: Array[Float], vo: Int, y: Array[Float], yo: Int,
      len: Int): Unit
}

private[ner] object ScalarKernel extends DotKernel {
  // Math.fma matches the SIMD path's fused rounding (round-2 ADVICE: mixed
  // fused/unfused kernels gave environment-dependent last-ulp logits).
  // Accumulation *order* still differs from the lane-wise SIMD reduce — only
  // rounded aggregates of encoder outputs are comparable across kernels.
  override def dot(x: Array[Float], xo: Int, w: Array[Float], wo: Int,
      len: Int): Float = {
    val l4 = len - (len & 3)
    var a0 = 0f; var a1 = 0f; var a2 = 0f; var a3 = 0f
    var i = 0
    while (i < l4) {
      a0 = Math.fma(x(xo + i), w(wo + i), a0)
      a1 = Math.fma(x(xo + i + 1), w(wo + i + 1), a1)
      a2 = Math.fma(x(xo + i + 2), w(wo + i + 2), a2)
      a3 = Math.fma(x(xo + i + 3), w(wo + i + 3), a3)
      i += 4
    }
    while (i < len) { a0 = Math.fma(x(xo + i), w(wo + i), a0); i += 1 }
    (a0 + a1) + (a2 + a3)
  }

  override def axpy(a: Float, v: Array[Float], vo: Int, y: Array[Float],
      yo: Int, len: Int): Unit = {
    var i = 0
    while (i < len) { y(yo + i) = Math.fma(a, v(vo + i), y(yo + i)); i += 1 }
  }
}

private[ner] object SimdKernel extends DotKernel {
  import jdk.incubator.vector.{FloatVector, VectorOperators}
  private val sp = FloatVector.SPECIES_PREFERRED

  override def dot(x: Array[Float], xo: Int, w: Array[Float], wo: Int,
      len: Int): Float = {
    var acc = FloatVector.zero(sp)
    val upper = sp.loopBound(len)
    var i = 0
    while (i < upper) {
      acc = FloatVector.fromArray(sp, x, xo + i)
        .fma(FloatVector.fromArray(sp, w, wo + i), acc)
      i += sp.length
    }
    var s = acc.reduceLanes(VectorOperators.ADD)
    while (i < len) { s += x(xo + i) * w(wo + i); i += 1 }
    s
  }

  override def axpy(a: Float, v: Array[Float], vo: Int, y: Array[Float],
      yo: Int, len: Int): Unit = {
    val av = FloatVector.broadcast(sp, a)
    val upper = sp.loopBound(len)
    var i = 0
    while (i < upper) {
      FloatVector.fromArray(sp, v, vo + i)
        .fma(av, FloatVector.fromArray(sp, y, yo + i))
        .intoArray(y, yo + i)
      i += sp.length
    }
    while (i < len) { y(yo + i) += a * v(vo + i); i += 1 }
  }
}

private[ner] object Kernels {
  /** SIMD when the incubator module is present on this runtime. */
  val best: DotKernel =
    try {
      Class.forName("jdk.incubator.vector.FloatVector")
      SimdKernel
    } catch {
      case _: Throwable => ScalarKernel
    }
}
