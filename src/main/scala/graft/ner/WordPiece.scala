package graft.ner

import java.nio.charset.StandardCharsets

/** WordPiece tokenizer with the reference's exact (quirky) semantics
  * (reference: `src/ner_model.cpp:100-160`):
  *
  *   - input split into words on C `isspace` bytes (byte-wise scan);
  *   - per word, greedy longest-prefix match starting against the *main*
  *     vocab; after the first successful match the matcher switches
  *     permanently (for the rest of that word) to the `##`-subword vocab;
  *   - a failed match at any position also switches to the subword vocab and
  *     skips exactly one byte — no `[UNK]` token is ever emitted;
  *   - `[CLS]` prepended, `[SEP]` appended; token emission stops at
  *     `nMaxTokens - 1` (both at word granularity and inside a word), after
  *     which `[SEP]` is still appended, so output length <= nMaxTokens.
  *
  * All matching is byte-wise (the reference works on `std::string` bytes), so
  * we operate on ISO-8859-1 views of the UTF-8 bytes — same alphabet the
  * vocab maps are keyed with (see [[NerVocab]]).
  */
object WordPiece {

  /** C `isspace` in the default locale, applied to a byte. */
  @inline private def isSpace(b: Byte): Boolean = {
    val c = b & 0xff
    c == 0x20 || (c >= 0x09 && c <= 0x0d)
  }

  /** Tokenize `text` into vocab ids. Requires `[CLS]` and `[SEP]` in the main
    * vocab (the reference `.at()`s them and would throw; we do the same).
    */
  def tokenize(vocab: NerVocab, text: String, nMaxTokens: Int): Array[Int] = {
    val cls = vocab.main("[CLS]")
    val sep = vocab.main("[SEP]")
    val bytes = text.getBytes(StandardCharsets.UTF_8)

    val out = new scala.collection.mutable.ArrayBuffer[Int](math.min(nMaxTokens, 64))
    out += cls

    // words as [start, end) byte ranges
    var i = 0
    val n = bytes.length
    var wordsDone = false
    while (i < n && !wordsDone) {
      while (i < n && isSpace(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isSpace(bytes(i))) i += 1
        if (out.length >= nMaxTokens - 1) wordsDone = true
        else {
          val word = new String(bytes, start, i - start, StandardCharsets.ISO_8859_1)
          tokenizeWord(vocab, word, out, nMaxTokens)
        }
      }
    }
    out += sep
    out.toArray
  }

  private def tokenizeWord(
      vocab: NerVocab,
      word: String,
      out: scala.collection.mutable.ArrayBuffer[Int],
      nMaxTokens: Int
  ): Unit = {
    var i = 0
    val n = word.length
    var useSub = false
    while (i < n) {
      if (out.length >= nMaxTokens - 1) return
      val map = if (useSub) vocab.sub else vocab.main
      var j = n
      var found = false
      while (j > i && !found) {
        map.get(word.substring(i, j)) match {
          case Some(id) =>
            out += id
            i = j
            useSub = true
            found = true
          case None => j -= 1
        }
      }
      if (!found) {
        useSub = true
        i += 1 // skip one unknown byte, emit nothing
      }
    }
  }
}
