package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import graft.ner._

/** Dev micro-profile of the NER eval stages (run explicitly, prints times). */
class ProfSpec extends AnyFunSuite {
  test("profile encoder stages") {
    val loaded = SyntheticModel.loaded
    val text = ("spark table query join window batch stream filter " * 8).trim
    (1 to 50).foreach(_ => Ner.evalWith(Some(loaded), text, true))
    val n = 300
    val t0 = System.nanoTime()
    (1 to n).foreach(_ => Ner.evalWith(Some(loaded), text, true))
    val full = (System.nanoTime() - t0) / 1e6 / n
    val t1 = System.nanoTime()
    (1 to n).foreach(_ => WordPiece.tokenize(loaded.model.vocab, text, 128))
    val tok = (System.nanoTime() - t1) / 1e6 / n
    val tokens = WordPiece.tokenize(loaded.model.vocab, text, 128)
    val t2 = System.nanoTime()
    (1 to n).foreach(_ => loaded.encoder.eval(tokens))
    val enc = (System.nanoTime() - t2) / 1e6 / n
    info(f"tokens=${tokens.length} full=$full%.3f ms tokenize=$tok%.3f ms encoder=$enc%.3f ms")
    assert(full > 0)
  }
}
