package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import GroupedTopK.{Buf, Entry, TopK}

/** Pins [[GroupedTopK]]'s invariants against a reference sort-and-take:
  * reduce/merge agree with global ordering under arbitrary split points,
  * ties break deterministically on the key, and the buffer never exceeds k —
  * the local backing for q149's oracle pairing.
  */
class GroupedTopKSpec extends AnyFunSuite {

  /** deterministic pseudo-random entries, duplicated scores included */
  private def stream(n: Int): IndexedSeq[Entry] =
    (0 until n).map { i =>
      val h = (i * 2654435761L) % 97L
      Entry((h % 13L).toDouble, i.toLong) // 13 distinct scores => many ties
    }

  private def reference(xs: Seq[Entry], k: Int): Seq[Entry] =
    xs.sortBy(e => (-e.score, e.key)).take(k)

  test("reduce matches sort-and-take, including ties") {
    for (k <- Seq(1, 3, 8, 50)) {
      val agg = new TopK(k)
      val xs = stream(300)
      val got = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      assert(got == reference(xs, k), s"k=$k")
    }
  }

  test("merge is split-point independent and agrees with the global order") {
    val k = 5
    val agg = new TopK(k)
    val xs = stream(200)
    val want = reference(xs, k)
    for (cut <- Seq(0, 1, 57, 199, 200)) {
      val (a, b) = xs.splitAt(cut)
      val m = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(m) == want, s"cut=$cut")
    }
  }

  test("merge of three partials is associative") {
    val k = 4
    val agg = new TopK(k)
    val xs = stream(150)
    val parts = xs.grouped(50).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    val left = agg.merge(agg.merge(parts(0), parts(1)), parts(2))
    val right = agg.merge(parts(0), agg.merge(parts(1), parts(2)))
    assert(agg.finish(left) == agg.finish(right))
    assert(agg.finish(left) == reference(xs, k))
  }

  test("buffer is always sorted and bounded by k") {
    val k = 3
    val agg = new TopK(k)
    var b: Buf = agg.zero
    stream(100).foreach { e =>
      b = agg.reduce(b, e)
      assert(b.entries.size <= k)
      assert(b.entries == b.entries.sortBy(x => (-x.score, x.key)))
    }
  }

  test("NaN scores keep a total order (rank first, key-tie-broken)") {
    // java.lang.Double.compare orders NaN above +Infinity; the old primitive
    // >/== comparison made NaN neither beat nor lose, corrupting the sorted
    // buffer (round-5 ADVICE). Reference sort uses the same total order.
    val k = 3
    val agg = new TopK(k)
    val xs = Seq(Entry(Double.NaN, 7L), Entry(5.0, 1L),
      Entry(Double.NaN, 2L), Entry(Double.PositiveInfinity, 3L),
      Entry(1.0, 4L))
    val want = xs.sortWith { (a, b) =>
      val c = java.lang.Double.compare(a.score, b.score)
      c > 0 || (c == 0 && a.key < b.key)
    }.take(k)
    assert(want.map(_.key) == Seq(2L, 7L, 3L)) // NaN, NaN, +Inf
    for (perm <- xs.permutations.take(24)) {
      val got = agg.finish(perm.foldLeft(agg.zero)(agg.reduce))
      assert(got == want, s"order-dependent result for $perm")
      assert(got.head.score.isNaN && got.head.key == 2L)
    }
  }

  test("fast-reject path leaves the buffer object untouched") {
    val agg = new TopK(2)
    val warm = agg.reduce(agg.reduce(agg.zero,
      Entry(10.0, 1L)), Entry(9.0, 2L))
    // worse than the current k-th: same Buf instance back, no allocation
    assert(agg.reduce(warm, Entry(1.0, 3L)) eq warm)
  }
}
