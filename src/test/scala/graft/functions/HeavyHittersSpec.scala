package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite {
  import HeavyHitters._

  private def run(capacity: Int, batches: Seq[Seq[String]]): Sketch = {
    val agg = new TopK(capacity)
    // simulate partial aggregation: half the batches per "partition"
    val (l, r) = batches.splitAt(batches.size / 2)
    val a = l.foldLeft(agg.zero)(agg.reduce)
    val b = r.foldLeft(agg.zero)(agg.reduce)
    agg.merge(a, b)
  }

  test("exact when capacity exceeds distinct count") {
    val batches = Seq(Seq("a", "b", "a"), Seq("c", "a", "b"), Seq("a"))
    val s = run(16, batches)
    assert(s.counts == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    assert(s.evicted == 0L)
  }

  test("bounded size and overestimate-only under eviction") {
    val items = (1 to 200).map(i => Seq(s"rare$i")) :+
      Seq.fill(50)("hot") :+ Seq.fill(30)("warm")
    val s = run(8, items)
    assert(s.counts.size <= 8)
    // space-saving never undercounts: the survivors' counts are >= truth
    assert(s.counts.getOrElse("hot", 0L) >= 50L)
    assert(s.counts.getOrElse("warm", 0L) >= 30L)
    // heavy items survive eviction of the rare tail
    assert(s.counts.contains("hot") && s.counts.contains("warm"))
  }

  test("merge is associative on disjoint key sets") {
    val agg = new TopK(16)
    val a = agg.reduce(agg.zero, Seq("x", "x"))
    val b = agg.reduce(agg.zero, Seq("y"))
    val c = agg.reduce(agg.zero, Seq("z", "z", "z"))
    val m1 = agg.merge(agg.merge(a, b), c)
    val m2 = agg.merge(a, agg.merge(b, c))
    assert(m1.counts == m2.counts)
    // finish = (counters, evicted bound); bound is 0 in the exact regime
    assert(agg.finish(m1) == (Map("x" -> 2L, "y" -> 1L, "z" -> 3L), 0L))
  }
}
