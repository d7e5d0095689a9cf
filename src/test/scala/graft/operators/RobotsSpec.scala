package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Robots._

class RobotsSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val txt =
    """# sample
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/ok/
      |Disallow: /*.pdf$
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /bot-trap/
      |Crawl-delay: 10
      |""".stripMargin

  test("group selection: named group is exclusive; * is the fallback; " +
      "longest agent token wins") {
    assert(rulesFor(txt, "graftbot/1.0").map(_.pattern)
      == Seq("/bot-trap/"))
    assert(rulesFor(txt, "randombot").map(_.pattern)
      == Seq("/private/", "/private/ok/", "/*.pdf$"))
    val two =
      """User-agent: bot
        |Disallow: /a/
        |User-agent: graftbot
        |Disallow: /b/
        |""".stripMargin
    // both tokens substring-match "graftbot/1.0"; the longer wins
    assert(rulesFor(two, "graftbot/1.0").map(_.pattern) == Seq("/b/"))
  }

  test("rule precedence: longest pattern wins; allow wins ties; no " +
      "match allows") {
    val r = rulesFor(txt, "randombot")
    assert(allowed(r, "/public/x"))
    assert(!allowed(r, "/private/doc"))
    assert(allowed(r, "/private/ok/doc"))
    assert(!allowed(r, "/papers/x.pdf")) // wildcard + anchor
    assert(allowed(r, "/papers/x.pdfx")) // anchor: .pdf not at end
    val tie = Seq(Rule(allow = true, "/a/"), Rule(allow = false, "/a/"))
    assert(allowed(tie, "/a/x"), "equal-length tie resolves to allow")
  }

  test("wildcard matching: '*' spans segments, '$' anchors, and the " +
      "matcher stays polynomial on hostile many-star patterns") {
    assert(matches("/a/*/c", "/a/b/x/c"))
    assert(!matches("/a/*/c$", "/a/b/cx"))
    assert(matches("/*.php$", "/dir/page.php"))
    assert(!matches("/*.php$", "/dir/page.php?x=1"))
    val hostile = "/*a*a*a*a*a*a*a*a*a*a*a*a$"
    val path = "/" + "ab" * 3000
    val t0 = System.nanoTime()
    assert(!matches(hostile, path))
    assert((System.nanoTime() - t0) / 1e9 < 2.0,
      "matcher must be polynomial on hostile patterns")
  }

  test("empty Disallow is a no-op; unknown directives and comments are " +
      "ignored; malformed lines never throw") {
    val messy =
      """User-agent: *
        |Disallow:
        |Sitemap: https://h.example/sitemap.xml
        |NotADirective
        |: nokey
        |Disallow: /x/ # trailing comment
        |""".stripMargin
    val r = rulesFor(messy, "anybot")
    assert(r == Seq(Rule(allow = false, "/x/")))
    assert(allowed(r, "/anything"))
    assert(!allowed(r, "/x/deep"))
    assert(parse(null).isEmpty)
    assert(allowed(rulesFor("", "anybot"), "/x"))
  }

  test("agent-token scan is a property: a named group never leaks to " +
      "a non-matching agent") {
    checkProp(Prop.forAll(Gen.alphaLowerStr.suchThat(_.nonEmpty)) { a =>
      val t = s"User-agent: $a\nDisallow: /\nUser-agent: *\nAllow: /\n"
      val its = rulesFor(t, s"$a/2.0")
      val other = rulesFor(t, "zz-unrelated-9")
      its == Seq(Rule(allow = false, "/")) &&
        (a.r.findFirstIn("zz-unrelated-9").isDefined ||
          other == Seq(Rule(allow = true, "/")))
    })
  }
}
