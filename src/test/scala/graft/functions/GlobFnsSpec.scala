package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** fnmatch-parity unit tests (SURVEY §5.2; edge cases from
  * fnmatch.translate semantics: leading-] class member, unclosed [,
  * class negation, Java-only metacharacters). */
class GlobFnsSpec extends AnyFunSuite {

  private def matches(glob: String, s: String): Boolean =
    s.matches("(?i)" + GlobFns.globToRegex(glob))

  test("star and question wildcards") {
    assert(matches("*/vac/*/pressure", "r3/vac/pump-01/pressure"))
    assert(matches("r?/mag*", "r3/mag-current"))
    assert(!matches("r?/mag*", "r33/mag"))
  }

  test("case-insensitive like the reference search") {
    assert(matches("R3/MAG*", "r3/mag/x"))
  }

  test("character class and negated class") {
    assert(matches("u[12]/x", "u1/x"))
    assert(matches("u[12]/x", "u2/x"))
    assert(!matches("u[12]/x", "u3/x"))
    assert(matches("u[!12]/x", "u3/x"))
    assert(!matches("u[!12]/x", "u1/x"))
  }

  test("leading ] right after [ is a literal member (fnmatch parity)") {
    // glob "[]a]" matches "]" and "a"
    assert(matches("[]a]", "]"))
    assert(matches("[]a]", "a"))
    assert(!matches("[]a]", "b"))
    // negated variant "[!]a]"
    assert(matches("[!]a]", "b"))
    assert(!matches("[!]a]", "]"))
  }

  test("unclosed [ is a literal bracket") {
    assert(matches("a[b", "a[b"))
    assert(!matches("a[b", "ab"))
    assert(matches("[]", "[]")) // empty class can never close: both literal
  }

  test("&& inside a class is not Java class intersection") {
    assert(matches("[a&&b]", "&")) // fnmatch: class with members a,&,b
    assert(matches("[a&&b]", "a"))
    assert(!matches("[a&&b]", "c"))
  }

  test("regex metacharacters outside classes are literal") {
    assert(matches("a.b", "a.b"))
    assert(!matches("a.b", "axb"))
    assert(matches("a+b(c)", "a+b(c)"))
    assert(matches("a$b^c", "a$b^c"))
  }

  test("substring regex is literal and case-insensitive") {
    assert("R3/MAG/dia".matches(".*" + GlobFns.substringRegex("mag") + ".*"))
    assert(!"r3/x".matches(".*" + GlobFns.substringRegex("a.c") + ".*"))
  }
}
