package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Algorithmic guarantees of the dedup tier that the DuckDB oracle can't
  * express directly: q120's prefix filter finds EVERY pair above threshold
  * (zero false negatives — the property that distinguishes it from the
  * probabilistic MinHash screen), checked against driver-side brute force
  * on the sf0.001 corpus.
  */
class DedupSpec extends SparkTestBase {

  test("q120 prefix filtering finds exactly the brute-force Jaccard pairs") {
    val tau = 0.6
    // brute-force truth: all-pairs Jaccard over 15-char shingle sets
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq.sortBy(_._1)
    val sets = docs.map { case (id, t) =>
      id -> (0 to t.length - 15).map(i => t.substring(i, i + 15)).toSet
    }
    val brute = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      jac = inter.toDouble / (sa.size + sb.size - inter)
      if jac >= tau
    } yield (a, b, sa.size.toLong, sb.size.toLong, inter.toLong,
      BigDecimal(jac).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy { case (a, b, _, _, _, j) => (-j, a, b) }
      .take(15)

    val got = SparkEntry.queries("q120_prefix_filter_join")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq

    assert(got == brute,
      s"prefix filter diverged from brute force:\n got=$got\n want=$brute")
  }

  test("q141's first-occurrence key survives documents with >= 1000 segments") {
    // round-5 VERDICT #2: the old arithmetic key (doc_id*1000 + seg_idx)
    // collided across documents once seg_idx reached 1000. Build a 1002-
    // segment document whose LAST segment also opens a later document: the
    // true first occurrence is (doc 1, seg 1001); the broken key ranked
    // (doc 2, seg 0) = 2000 below (doc 1, seg 1001) = 2001 and kept the
    // wrong copy. The struct key must keep all of doc 1 and dedup doc 2.
    import spark.implicits._
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val doc1 = ((1 to 10010).map(i => s"a$i").mkString(" ")) + " " + shared
    val doc2 = shared + " " + (1 to 10).map(i => s"b$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_q141").toString
    Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q141_segment_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (1002L, 1002L),
      s"doc 1 (1002 segments, all first occurrences) must keep everything: $got")
    assert(got(2L) == (2L, 1L),
      s"doc 2's copy of the shared segment must be dropped: $got")
    // the rewrite (q173) must agree with the ledger: doc 2's cleaned text
    // is exactly its unique second segment, doc 1 survives verbatim
    val clean = SparkEntry.queries("q173_segment_rewrite")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(clean(1L) == doc1)
    assert(clean(2L) == (1 to 10).map(i => s"b$i").mkString(" "))
  }

  test("q171 minimizer sampling co-selects a shared span across documents") {
    // the content-defined-selection guarantee: two documents sharing a
    // region much longer than SpanLen + 2w must co-select at least one
    // identical span (selection depends only on local content, not on
    // position or the surrounding document), so the shared region is
    // visible from the ~1/w sample with n_docs = 2
    import spark.implicits._
    val shared = "the exact same one hundred character run of text that both " +
      "documents carry verbatim in different places!!"
    assert(shared.length >= 100)
    val doc1 = ("left context alpha beta gamma delta " * 3) + shared +
      (" right context one two three" * 2)
    val doc2 = ("entirely different opening words here " * 2) + shared +
      (" and an unrelated tail closes this document" * 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_q171").toString
    Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q171_minimizer_spans")(spark, dir).collect()
    assert(got.nonEmpty, "no co-selected span found in the shared region")
    assert(got.forall(_.getLong(1) == 2L)) // every reported span spans both
    // each reported span really is a substring of the shared region
    got.foreach(r => assert(shared.contains(r.getString(0)) ||
      doc1.contains(r.getString(0)) && doc2.contains(r.getString(0)),
      s"span not shared: ${r.getString(0)}"))
  }

  test("neither q120 filter can drop a qualifying pair (pigeonhole + length)") {
    // the completeness argument, checked over EVERY brute-force pair >= tau
    // (28 at sf0.001, more than the query's top-15 output shows): the two
    // docs must (a) pass the length filter and (b) share a token within
    // their (df, token)-ordered prefixes — the two pruning steps candidate
    // generation applies. If both hold for all qualifying pairs, no filter
    // configuration bug (prefix length off-by-one, wrong sort order) can
    // lose a result, independent of the final limit.
    val tau = 0.6
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    val sets = docs.map { case (id, t) =>
      id -> (0 to t.length - 15).map(i => t.substring(i, i + 15)).toSet
    }.toMap
    val df = sets.values.toSeq.flatten.groupBy(identity)
      .map { case (tok, xs) => tok -> xs.size }
    def prefix(id: Long): Set[String] = {
      val ordered = sets(id).toSeq.sortBy(t => (df(t), t))
      ordered.take((0.4 * ordered.size).floor.toInt + 1).toSet
    }
    val qualifying = for {
      (a, sa) <- sets.toSeq.sortBy(_._1); (b, sb) <- sets.toSeq.sortBy(_._1)
      if a < b
      inter = (sa & sb).size
      if inter.toDouble / (sa.size + sb.size - inter) >= tau
    } yield (a, b)
    assert(qualifying.nonEmpty, "corpus premise: some qualifying pairs exist")
    qualifying.foreach { case (a, b) =>
      val (na, nb) = (sets(a).size, sets(b).size)
      assert(nb >= math.ceil(tau * na) && nb <= math.floor(na / tau),
        s"($a,$b) would be dropped by the length filter")
      assert((prefix(a) & prefix(b)).nonEmpty,
        s"($a,$b) shares no prefix token — pigeonhole violated")
    }
  }
}
