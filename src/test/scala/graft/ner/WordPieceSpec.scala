package graft.ner

import org.scalatest.funsuite.AnyFunSuite

class WordPieceSpec extends AnyFunSuite {

  private def vocab(tokens: String*): NerVocab = {
    val main = Map.newBuilder[String, Int]
    val sub = Map.newBuilder[String, Int]
    val id2 = Map.newBuilder[Int, String]
    tokens.zipWithIndex.foreach { case (t, i) =>
      id2 += i -> t
      if (t.length > 2 && t.startsWith("##")) sub += t.substring(2) -> i
      else main += t -> i
    }
    NerVocab(main.result(), sub.result(), id2.result())
  }

  private val v = vocab(
    "[PAD]", "[CLS]", "[SEP]", "duck", "##db", "is", "great", "new", "york",
    "duckdb", "d", "##u", "##c", "##k")

  private def ids(text: String, max: Int = 64): Seq[Int] =
    WordPiece.tokenize(v, text, max).toSeq

  private def toks(text: String, max: Int = 64): Seq[String] =
    ids(text, max).map(v.tokenOf)

  test("CLS/SEP wrap and simple words") {
    assert(toks("new york") == Seq("[CLS]", "new", "york", "[SEP]"))
  }

  test("greedy longest-prefix match prefers the longest full token") {
    // "duckdb" is itself in the vocab and must win over duck + ##db
    assert(toks("duckdb") == Seq("[CLS]", "duckdb", "[SEP]"))
  }

  test("subword continuation uses the ## vocab") {
    // "duckdbdb": longest prefix "duckdb", then remaining "db" matches ##db
    assert(toks("duckdbdb") == Seq("[CLS]", "duckdb", "##db", "[SEP]"))
  }

  test("permanent switch to subword vocab within a word") {
    // After matching "d", the matcher may only use the ## vocab for the rest
    // of the word: "dduck" -> "d" then "duck" is NOT matchable (main vocab),
    // and each of u,c,k resolves via ##u/##c/##k after skipping 'd'.
    assert(toks("dduck") == Seq("[CLS]", "d", "##u", "##c", "##k", "[SEP]"))
  }

  test("unknown leading bytes are skipped one at a time, no [UNK]") {
    // 'x' never matches; skipping it switches to the subword vocab, so
    // "xduck" tokenizes as ##u/##c/##k after both x and d fail to match.
    assert(toks("xduck") == Seq("[CLS]", "##u", "##c", "##k", "[SEP]"))
    // an entirely-unknown word contributes no tokens at all
    assert(toks("zzz") == Seq("[CLS]", "[SEP]"))
  }

  test("whitespace split covers all C isspace bytes") {
    assert(toks("new\tyork\nnewyork\fnew\ryork new") ==
      Seq("[CLS]", "new", "york", "new", "york", "new", "york", "new", "[SEP]"))
  }

  test("empty and all-space input yields [CLS][SEP]") {
    assert(toks("") == Seq("[CLS]", "[SEP]"))
    assert(toks("   \t\n") == Seq("[CLS]", "[SEP]"))
  }

  test("token budget: stops at nMaxTokens-1 then appends [SEP]") {
    val out = ids("new york new york new york new york", max = 6)
    assert(out.length == 6)
    assert(out.head == v.main("[CLS]"))
    assert(out.last == v.main("[SEP]"))
    // interior tokens are the first 4 words
    assert(out.slice(1, 5).map(v.tokenOf) == Seq("new", "york", "new", "york"))
  }

  test("budget check happens per-token inside a word too") {
    val out = ids("duckdbdb duckdbdb", max = 4)
    assert(out.map(v.tokenOf) == Seq("[CLS]", "duckdb", "##db", "[SEP]"))
  }

  test("output length never exceeds nMaxTokens") {
    for (max <- 3 to 10) {
      val out = ids("duckdbdb new york duckdbdb new york", max)
      assert(out.length <= max, s"max=$max")
      assert(out.last == v.main("[SEP]"))
    }
  }
}
