package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Fnmatch

class FnmatchSpec extends AnyFunSuite {

  private def m(glob: String, s: String): Boolean =
    s.matches(Fnmatch.translate(glob))

  test("star matches any run including empty") {
    assert(m("BH*", "BHZ")); assert(m("BH*", "BH"))
    assert(!m("BH*", "HHZ"))
  }
  test("question matches exactly one char") {
    assert(m("BH?", "BHZ")); assert(!m("BH?", "BH")); assert(!m("BH?", "BHZZ"))
  }
  test("character classes and negation") {
    assert(m("BH[ZN]", "BHZ")); assert(!m("BH[ZN]", "BHE"))
    assert(m("BH[!ZN]", "BHE")); assert(!m("BH[!ZN]", "BHZ"))
  }
  test("full-string anchoring (reference re.match + \\Z semantics)") {
    assert(!m("H", "BHZ")); assert(!m("BH", "BHZ"))
  }
  test("regex metachars in glob are literal") {
    assert(m("a.b", "a.b")); assert(!m("a.b", "axb"))
    assert(m("a+b", "a+b")); assert(!m("a+b", "aab"))
  }
  test("isLiteral detects wildcard-free globs") {
    assert(Fnmatch.isLiteral("BHZ")); assert(!Fnmatch.isLiteral("BH?"))
  }
}
