package graft.conll

import org.scalatest.funsuite.AnyFunSuite
import java.util.regex.Pattern

/** The r9 literal fast path inside Rules.Re must be observationally
  * identical to java.util.regex find() on every pattern class — both
  * the shapes it accelerates and the shapes that must fall back. */
class ReFastPathSpec extends AnyFunSuite {

  private val inputs = Seq(
    "", "a", "b", "ab", "ba", "neg", "negation", "un-neg", "NOUN",
    "PROPN", "PRON", "XNOUNX", "conj", "parataxis", "root", "rooted",
    "aroot", "conll:WORD", "x conll:WORD y", "AUX", "aux", "|", "a|b",
    "flat", "compound", "mwe", "list", "enlist", "PROPNOUN")

  private val patterns = Seq(
    // the accelerated class
    "NOUN|PROPN|PRON", "VERB|AUX", "^(neg)", "^(root)",
    "^(conj|parataxis|flat|compound|fixed|mwe|list)", "(a|b)", "neg",
    "conll:WORD", "^conj",
    // shapes that MUST fall back (and still agree)
    "^a|b",            // anchor binds the first alternative only
    "a||b",            // empty alternative
    "|a", "a|",        // leading/trailing empty alternative
    "a.b", "a+", "[ab]", "a b", "^(a|b)$", "(?i)noun", "a(b|c)d")

  test("fast path == java.util.regex find() across pattern classes") {
    for (p <- patterns; v <- inputs) {
      val expected = Pattern.compile(p).matcher(v).find()
      assert(Rules.rex(p)(v) == expected,
        s"Re('$p')('$v') = ${Rules.rex(p)(v)}, regex find() = $expected")
    }
  }
}
