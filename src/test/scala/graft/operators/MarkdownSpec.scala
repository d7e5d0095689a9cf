package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import Markdown._

class MarkdownSpec extends AnyFunSuite {

  test("ATX headings: levels, trailing-# close, no-space is paragraph") {
    val s = parse("# One\n## Two ##\n####### seven\n#nospace\n###    \n")
    // '###  ' is a valid EMPTY heading (space after the run); 7 #'s and
    // #nospace are paragraphs
    assert(s.headings == Vector((1, "One"), (2, "Two"), (3, "")))
    assert(s.plainText == "One\nTwo\n####### seven\n#nospace")
  }

  test("fenced code: verbatim body, info string, tilde fences, nesting traps") {
    val md = "```scala\n# not a heading\n*stays*\n```\n~~~\nplain\n```\nstill inside\n~~~\ntail"
    val s = parse(md)
    assert(s.codeBlocks == Vector(
      ("scala", "# not a heading\n*stays*"),
      ("", "plain\n```\nstill inside")))
    assert(s.plainText == "tail")
  }

  test("closing fence must be at least as long; unclosed runs to EOF") {
    val s = parse("````\ncode\n```\nmore\n````\nafter")
    assert(s.codeBlocks == Vector(("", "code\n```\nmore")))
    assert(s.plainText == "after")
    val t = parse("```py\nnever closed\nline2")
    assert(t.codeBlocks == Vector(("py", "never closed\nline2")))
  }

  test("inline code spans: backticks dropped, unbalanced stays literal") {
    val s = parse("a `b * c` d\nlone ` tick")
    assert(s.plainText == "a b * c d\nlone ` tick")
  }

  test("code-span content is shielded from the emphasis pass") {
    // the '*' inside backticks must neither strip nor pair with the
    // emphasis outside the span
    assert(parse("`a*b` *em*").plainText == "a*b em")
    assert(parse("x `2*3` y *z* `_u_`").plainText == "x 2*3 y z _u_")
  }

  test("links and images: text kept, url recorded, images counted") {
    val s = parse("see [here](http://u/1) and ![pic](i.png) end [broken] one")
    assert(s.links == Vector(("here", "http://u/1")))
    assert(s.nImages == 1)
    assert(s.plainText == "see here and pic end [broken] one")
  }

  test("emphasis: paired runs stripped, unmatched literal, nesting") {
    assert(parse("*a* **b** _c_ *lone").plainText == "a b c *lone")
    assert(parse("**outer *inner* done**").plainText == "outer inner done")
    assert(parse("2 * 3 * 4").plainText == "2 3 4") // honest-subset cost
    assert(parse("2 * 3").plainText == "2 * 3")
  }

  test("lists, blockquotes, thematic breaks") {
    val s = parse("- a\n* b\n+ c\n12. d\n3) e\n> quoted\n>> deep\n---\n* * *\n-x not list")
    assert(s.nListItems == 5)
    assert(s.nQuoteLines == 2)
    assert(s.plainText == "a\nb\nc\nd\ne\nquoted\ndeep\n-x not list")
  }

  test("null and empty input") {
    assert(parse(null).plainText == "")
    assert(parse("").plainText == "")
    assert(parse("").codeBlocks.isEmpty)
  }

  test("whitespace collapses per line; blank lines separate blocks") {
    assert(parse("a   b\t c\n\n\nd").plainText == "a b c\nd")
  }
}
