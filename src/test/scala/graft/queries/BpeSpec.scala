package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Pins q172's BPE semantics where the oracle can't distinguish a wrong
  * algorithm that happens to agree on the real corpus: greedy-LEFTMOST
  * merging inside repeated-symbol chains ("aaaa" with pair (a,a) becomes
  * "aa aa", never "a aa a"), weighted pair counting, and the emptying
  * tail (a round with no pairs left reports nothing rather than failing).
  */
class BpeSpec extends SparkTestBase {

  test("greedy leftmost chain merging and weighted counts on a crafted corpus") {
    import spark.implicits._
    // "aaaa" x2: round 1 must count (a,a) 3 times per word (6 weighted) and
    // fold each word to [aa, aa]; round 2 merges (aa, aa) into "aaaa";
    // round 3 has no adjacent pair anywhere (all words single-symbol) and
    // must simply produce no row
    val dir = java.nio.file.Files.createTempDirectory("graft_q172").toString
    Seq((1L, "aaaa aaaa b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q172_bpe_merges")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1, "a", "a", "aa", 6L),
      (2, "aa", "aa", "aaaa", 2L)))
  }

  test("compression curve: round 0 = character count, each merge shrinks by pair_count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q175").toString
    Seq((1L, "aaaa aaaa b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val curve = SparkEntry.queries("q175_bpe_compression")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // 9 symbols total (a x8 + b). Applied merges per round are the GREEDY
    // ones, not the pair COUNT: "aaaa" has 3 (a,a) pairs but only 2 merge
    // (leftmost, non-overlapping), so round 1 removes 2 x 2 = 4 symbols.
    assert(curve(0) == 9L)
    assert(curve(1) == 5L) // aaaa -> [aa, aa] per word
    assert(curve(2) == 3L) // [aa, aa] -> [aaaa] per word
    // round 3 has no pairs anywhere: the state must carry over UNCHANGED
    // (an empty top-1 must not wipe the corpus — left-join semantics)
    assert(curve(3) == 3L)
  }

  test("merged symbols compete as units in later rounds") {
    import spark.implicits._
    // after (a,b) merges, the pair ("ab", "c") must be counted as a unit —
    // a wrong implementation that re-splits to characters would report
    // (b, c) instead
    val dir = java.nio.file.Files.createTempDirectory("graft_q172b").toString
    Seq((1L, "abc abc abc ab ab")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q172_bpe_merges")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .toSeq
    assert(got.head == (1, "a", "b")) // (a,b): 5 vs (b,c): 3
    assert(got(1) == (2, "ab", "c")) // the merged unit pairs with c
  }
}
