package graft.queries

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/** Property pin for the BPE merge fold (q172/q175, `Corpus.bpeMerge`).
  *
  * The production merge is a delimiter-string fold (`aggregate` over
  * '|'-joined symbols) chosen because Spark's `aggregate` and DuckDB's
  * `list_reduce` evaluate it element-wise identically — but the oracle hash
  * only proves that identity FOR THIS CORPUS. This spec pins the fold's
  * semantics against corpus drift: over random word histograms and ≥3 merge
  * rounds, the fold must equal an independent plain-Scala greedy-leftmost
  * merge (the textbook BPE step, Sennrich et al.) applied with the same
  * top pair, and the top-pair selection must equal independent weighted
  * pair counting. Anything the fold could get wrong — the `endswith`
  * last-symbol test firing on a symbol SUFFIX rather than the whole symbol,
  * chain overlaps ("a a a" must give "aa a"), merged symbols participating
  * in later rounds, a no-pairs-left round leaving state untouched — is a
  * histogram this generator can produce.
  */
class BpeSpec extends SparkTestBase {

  /** Textbook greedy-leftmost non-overlapping merge of (a,b) in one word. */
  private def refMerge(syms: List[String], a: String, b: String)
      : List[String] = syms match {
    case x :: y :: rest if x == a && y == b => (a + b) :: refMerge(rest, a, b)
    case x :: rest => x :: refMerge(rest, a, b)
    case Nil => Nil
  }

  /** Independent top-1: weighted pair counts, ties broken like the SQL
    * ORDER BY pair_count DESC, a, b. */
  private def refTop1(hist: Map[List[String], Long])
      : Option[(String, String, Long)] = {
    val counts = hist.toSeq.flatMap { case (syms, wc) =>
      syms.zip(syms.drop(1)).map(p => (p, wc))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    if (counts.isEmpty) None
    else {
      val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
      Some((a, b, c))
    }
  }

  private def enc(syms: List[String]): String = syms.map("|" + _).mkString
  private def dec(syms: String): List[String] =
    syms.split("\\|").toList.drop(1)

  // words over a tiny alphabet so pair collisions (and chains like "aaa")
  // are dense; lengths include 1 so zero-pair words exercise the filter
  private val genWord: Gen[String] = for {
    n <- Gen.chooseNum(1, 8)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val genHist: Gen[Map[String, Long]] = for {
    words <- Gen.nonEmptyListOf(genWord)
    counts <- Gen.listOfN(words.size, Gen.chooseNum(1L, 5L))
  } yield words.zip(counts).groupBy(_._1).view
    .mapValues(_.map(_._2).sum).toMap

  test("3 production merge rounds equal the plain-Scala greedy reference " +
    "over random histograms") {
    import spark.implicits._
    val prop = Prop.forAll(genHist) { hist0 =>
      var df = hist0.toSeq.map { case (w, wc) =>
        (wc, enc(w.toList.map(_.toString)))
      }.toDF("wc", "syms")
      var ref: Map[List[String], Long] =
        hist0.map { case (w, wc) => (w.toList.map(_.toString), wc) }
      var ok = true
      for (_ <- 1 to 3 if ok) {
        val top = Corpus.bpeTop1(df)
        val topRow = top.collect()
        val expTop = refTop1(ref)
        ok = (topRow.toList, expTop) match {
          case (Nil, None) => true
          case (r :: Nil, Some((a, b, c))) =>
            r.getString(0) == a && r.getString(1) == b && r.getLong(2) == c
          case _ => false
        }
        if (ok) {
          df = Corpus.bpeMerge(df, top)
          ref = expTop match {
            case Some((a, b, _)) =>
              ref.groupBy { case (k, _) => refMerge(k, a, b) }.view
                .mapValues(_.values.sum).toMap
            case None => ref
          }
          val got = df.collect()
            .map(r => (dec(r.getString(1)), r.getLong(0))).toMap
          ok = got == ref
        }
      }
      ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, s"bpe fold property: ${res.status}")
  }

  /** Textbook encode: apply the frozen rules sequentially in rank order
    * (one full greedy-leftmost pass per rule) — the reference semantics
    * for [[Corpus.bpeEncode]]. */
  private def refEncode(w: String, merges: Seq[(String, String)])
      : List[String] =
    merges.foldLeft(w.toList.map(_.toString)) { case (syms, (a, b)) =>
      refMerge(syms, a, b)
    }

  test("q227's frozen-table encode matches the textbook sequential merge " +
    "(symbol boundaries respected)") {
    import spark.implicits._
    // the round-9 ADVICE counterexamples: a boundary-blind string replace
    // encodes 'other' as [o, ther] and 'then' as one token; true BPE gives
    // [o, the, r] and [the, n]
    val words = Seq("other", "then", "and", "another", "inin", "ttthhh",
      "sten", "a", "thethe")
    val df = words.map(w => (1L, enc(w.toList.map(_.toString))))
      .toDF("wc", "syms")
    val got = Corpus.bpeEncode(df, Corpus.BpeMerges).collect()
      .map(r => dec(r.getString(1)))
    val exp = words.map(refEncode(_, Corpus.BpeMerges))
    assert(got.toSet == exp.toSet)
    assert(refEncode("other", Corpus.BpeMerges) == List("o", "the", "r"))
    assert(refEncode("then", Corpus.BpeMerges) == List("the", "n"))
  }

  test("frozen-table encode matches the textbook reference over random " +
    "words and the real merge table") {
    import spark.implicits._
    val genW: Gen[String] = for {
      n <- Gen.chooseNum(1, 12)
      cs <- Gen.listOfN(n, Gen.oneOf("tandheroins".toSeq))
    } yield cs.mkString
    val prop = Prop.forAll(Gen.nonEmptyListOf(genW)) { ws =>
      val df = ws.map(w => (1L, enc(w.toList.map(_.toString))))
        .toDF("wc", "syms")
      val got = Corpus.bpeEncode(df, Corpus.BpeMerges).collect()
        .map(r => dec(r.getString(1))).toSet
      got == ws.map(refEncode(_, Corpus.BpeMerges)).toSet
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, s"bpe encode property: ${res.status}")
  }

  test("a round with no pairs left leaves the histogram unchanged") {
    import spark.implicits._
    // all single-char words -> bpePairs empty -> top1 empty -> LEFT join
    // null pair -> fold appends every symbol verbatim
    val df = Seq((3L, "|a"), (2L, "|b")).toDF("wc", "syms")
    val merged = Corpus.bpeMerge(df, Corpus.bpeTop1(df))
    assert(merged.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((3L, "|a"), (2L, "|b")))
  }
}
