package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import HtmlExtract._

class HtmlExtractSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("planted paragraphs survive arbitrary inline-tag nesting and " +
      "whitespace noise") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon")
    val para = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    val inline = Gen.oneOf("b", "i", "em", "strong", "span", "code")
    val ws = Gen.oneOf(" ", "\n", "\t  \n", "   ")
    checkProp(Prop.forAll(Gen.nonEmptyListOf(para), inline, ws) {
      (paras, tag, pad) =>
        // each paragraph wrapped in <p>, its text wrapped in a random
        // inline tag with noisy attrs and padded with random whitespace
        val html = paras.map(t =>
          s"""<p>$pad<$tag class="x" data-z="a>b">$t</$tag>$pad</p>""")
          .mkString("\n")
        val got = mainText(html, 1.0)
        got.main_text == paras.mkString("\n") &&
          got.n_blocks == paras.size && got.n_dropped == 0
    })
  }

  test("script/style/title/comment content is dropped wholesale, " +
      "including '<' '&' and tag-lookalike traps inside") {
    val html =
      """<html><head><title>Boilerplate Title</title>
        |<style>p { content: "<p>fake</p>"; }</style></head><body>
        |<script>if (a < b && c > d) { s = "</div><p>"; }</script>
        |<!-- <p>commented out</p> -->
        |<p>real text</p>
        |<SCRIPT type="text/js">more < junk</SCRIPT>
        |<p>more text</p></body></html>""".stripMargin
    val got = mainText(html, 1.0)
    assert(got.main_text == "real text\nmore text")
    assert(got.n_blocks == 2 && got.n_dropped == 0)
  }

  test("link-density cut: pure link bars drop at 0.5, survive at 1.0; " +
      "prose with an inline anchor is kept with the anchor text inlined") {
    val html =
      """<nav><a href="/">Home</a> <a href="/x">About</a></nav>
        |<p>Read about <a href="/t">this topic</a> in depth here</p>""".stripMargin
    val cut = mainText(html, 0.5)
    assert(cut.main_text == "Read about this topic in depth here")
    assert(cut.n_blocks == 1 && cut.n_dropped == 1)
    val keep = mainText(html, 1.0)
    assert(keep.main_text ==
      "Home About\nRead about this topic in depth here")
    assert(keep.n_blocks == 2 && keep.n_dropped == 0)
  }

  test("entities decode: named, decimal, hex; unknown/bare '&' stays " +
      "literal") {
    val got = mainText(
      "<p>Tom &amp; Jerry &lt;3 &quot;hi&quot; &#65;&#x42; " +
        "AT&T R&unknown; a&b</p>", 1.0)
    assert(got.main_text == "Tom & Jerry <3 \"hi\" AB AT&T R&unknown; a&b")
  }

  test("the full HTML5 named table: Latin-1, typographic, symbol, " +
      "case-sensitive, two-codepoint names; nbsp collapses to space") {
    val got = mainText(
      "<p>Caf&eacute;&nbsp;menu&mdash;&hellip; &copy; &Delta;&delta; " +
        "&rarr; x&ne;y &NotEqualTilde; end</p>", 1.0)
    assert(got.main_text ==
      "Café menu—… © Δδ → x≠y ≂̸ end")
    // names are case-sensitive: &AMP; (valid) vs &Amp; (not a name)
    assert(mainText("<p>&AMP; &Amp;</p>", 1.0).main_text == "& &Amp;")
    // the table is the complete WHATWG set incl. 31-char names
    assert(HtmlEntities.table.size == 2125)
    assert(HtmlEntities.table("CounterClockwiseContourIntegral")
      == "∳")
    assert(HtmlEntities.maxNameLen == 31)
    // an entity at the old 10-char window boundary now decodes
    assert(mainText("<p>&thickapprox;</p>", 1.0).main_text == "≈")
  }

  test("astral numeric character references decode to real code " +
      "points (surrogate pairs), not toChar-truncated BMP garbage") {
    val got = mainText("<p>hi &#128169; and &#x1F600; end</p>", 1.0)
    assert(got.main_text == "hi 💩 and 😀 end")
    // out-of-range and surrogate-half NCRs stay literal
    assert(mainText("<p>&#1114112; &#xD800;</p>", 1.0).main_text
      == "&#1114112; &#xD800;")
    // hrefs get the same decode
    assert(links("""<a href="https://h.example/&#x1F600;">x</a>""")
      == Vector("https://h.example/😀"))
  }

  test("a page full of bare ampersands parses in linear time (the " +
      "entity scan is window-bounded, not scan-to-end-of-string)") {
    val html = "<p>" + ("x& " * 200000) + "</p>"
    val t0 = System.nanoTime()
    val got = mainText(html, 1.0)
    assert((System.nanoTime() - t0) / 1e9 < 2.0,
      "600k-char ampersand flood must not go quadratic")
    assert(got.main_text.startsWith("x& x&"))
  }

  test("malformed markup never throws and ends deterministically") {
    val cases = Seq(
      "<p>unclosed paragraph",
      "a < b and c > d plain text",
      "<p>text<",
      "<!-- unterminated comment <p>gone</p>",
      "<script>unterminated script <p>gone</p>",
      "<p attr=\"unterminated quote>text</p><p>next</p>",
      "<>empty tag<p>kept</p>",
      "</div></div></div>over-closed",
      "", "\n\n", "<p></p><div></div>")
    cases.foreach { h =>
      val got = mainText(h, 0.5) // must not throw
      assert(got.n_blocks >= 0)
    }
    assert(mainText("<p>unclosed paragraph", 1.0).main_text ==
      "unclosed paragraph")
    assert(mainText("a < b and c > d plain text", 1.0).main_text ==
      "a < b and c > d plain text")
    assert(mainText("<!-- unterminated comment <p>gone</p>", 1.0)
      .main_text == "")
    assert(mainText("<script>unterminated script <p>gone</p>", 1.0)
      .main_text == "")
    assert(mainText("</div></div></div>over-closed", 1.0).main_text ==
      "over-closed")
  }

  test("deeply nested and interleaved blocks flush once per boundary; " +
      "whitespace-only blocks vanish") {
    checkProp(Prop.forAll(Gen.choose(1, 30)) { depth =>
      // <div><div>...<p>x</p>...</div></div> — all nesting collapses
      // to the single non-empty block
      val html = ("<div>" * depth) + "<p>x</p>" + ("</div>" * depth)
      val got = mainText(html, 1.0)
      got.main_text == "x" && got.n_blocks == 1
    })
  }

  test("over-nested anchors cannot push link depth negative: text " +
      "after a stray </a> is not counted as link text") {
    val got = blocks("<p></a></a>plain prose here</p>")
    assert(got.size == 1 && got.head.nLinkChars == 0)
  }

  test("links: quoted/unquoted hrefs extract in order; script-body " +
      "and commented anchors do not leak; entities decode") {
    val html =
      """<a href="https://a.example/1">x</a>
        |<a class="z" href='https://b.example/2?u=1&amp;v=2'>y</a>
        |<a href=https://c.example/3>z</a>
        |<a name="no-href">w</a>
        |<!-- <a href="https://gone.example/">c</a> -->
        |<script>var t = '<a href="https://evil.example/">t</a>';</script>
        |<a href="/relative">r</a>""".stripMargin
    assert(links(html) == Vector(
      "https://a.example/1", "https://b.example/2?u=1&v=2",
      "https://c.example/3", "/relative"))
  }

  test("links property: N planted hrefs always extract, whatever the " +
      "quoting mix and attribute noise") {
    val quoteStyle = Gen.choose(0, 2)
    checkProp(Prop.forAll(Gen.nonEmptyListOf(Gen.zip(
        Gen.choose(0, 99), quoteStyle))) { targets =>
      val html = targets.zipWithIndex.map { case ((n, q), i) =>
        val url = s"https://h$n.example/p$i"
        q match {
          case 0 => s"""<a id="l$i" href="$url" rel="x">t</a>"""
          case 1 => s"<a href='$url'>t</a>"
          case _ => s"<a href=$url rel=nofollow>t</a>"
        }
      }.mkString("<p>", " and ", "</p>")
      links(html) == targets.zipWithIndex.map { case ((n, _), i) =>
        s"https://h$n.example/p$i"
      }.toVector
    })
  }

  test("normalizeUrl: every messiness dimension collapses to one " +
      "canonical form; non-http and relative stay None") {
    def n(u: String) = normalizeUrl(u)
    assert(n("HTTPS://Host.Example:443/a/b/../c/./d?z=1&utm_source=x&a=2#f")
      .contains("https://host.example/a/c/d?a=2&z=1"))
    assert(n("http://user:pw@HOST.example:80//x///y/")
      .contains("http://host.example/x/y/"))
    assert(n("http://h.example:8080/p?fbclid=abc&k=1")
      .contains("http://h.example:8080/p?k=1")) // non-default port kept
    assert(n("https://h.example").contains("https://h.example/"))
    assert(n("https://h.example/a/../../..").contains("https://h.example/"))
    assert(n("https://h.example/p?utm_campaign=c")
      .contains("https://h.example/p")) // emptied query loses '?'
    assert(n("https://h.example/p?b=1&a=2&a=1")
      .contains("https://h.example/p?a=1&a=2&b=1")) // stable value sort
    assert(n("ftp://h.example/f").isEmpty)
    assert(n("/relative").isEmpty)
    assert(n(null).isEmpty)
    // idempotence: normalizing a normalized URL is the identity
    val once = n("HTTPS://A.B:443/x/./y?q=1&utm_x=t#z").get
    assert(n(once).contains(once))
  }

  test("tables: header/data cells extract in grid order; inline markup " +
      "vanishes; entities decode; stray cells outside rows are ignored") {
    val html =
      """<td>stray</td><table>
        |<tr><th>h1</th><th>h2</th></tr>
        |<tr><td>a &amp; b</td><td><b>bo</b>ld</td></tr>
        |</table>
        |<table><tr><td>t2</td></tr></table>""".stripMargin
    val got = tables(html)
    assert(got == Vector(
      TableCell(0, 0, 0, "h1", header = true),
      TableCell(0, 0, 1, "h2", header = true),
      TableCell(0, 1, 0, "a & b", header = false),
      TableCell(0, 1, 1, "bold", header = false),
      TableCell(1, 0, 0, "t2", header = false)))
  }

  test("tables: unclosed cells flush at the next boundary; script " +
      "content inside a cell is dropped; malformed markup never throws") {
    val got = tables(
      "<table><tr><td>one<td>two<script>x<td>fake</script></tr>" +
        "<tr><td>three</table>")
    assert(got.map(_.text) == Vector("one", "two", "three"))
    assert(tables("<table><tr><td>unclosed everything").map(_.text)
      == Vector("unclosed everything"))
    assert(tables("no tables at all").isEmpty)
    assert(tables(null).isEmpty)
  }

  test("pageMetadata: title/description/og:title/canonical extract " +
      "with entity decode; a script-body fake title does not leak; " +
      "first occurrence wins") {
    val html =
      """<head><script>t = "<title>fake</title>";</script>
        |<title> Real &amp; True </title>
        |<title>second ignored</title>
        |<meta name="DESCRIPTION" content="d &lt;1&gt;">
        |<meta property="og:title" content='og val'>
        |<link rel=canonical href=https://h.example/c>
        |</head>""".stripMargin
    val m = pageMetadata(html)
    assert(m.title.contains("Real & True"))
    assert(m.description.contains("d <1>"))
    assert(m.ogTitle.contains("og val"))
    assert(m.canonical.contains("https://h.example/c"))
    val none = pageMetadata("<p>no head fields</p>")
    assert(none == PageMeta(None, None, None, None))
    assert(pageMetadata(null) == PageMeta(None, None, None, None))
  }

  test("urlHost: case-folds, strips userinfo/port/path/query/fragment; " +
      "relative and non-http schemes yield None") {
    assert(urlHost("https://Example.COM/path?q#f").contains("example.com"))
    assert(urlHost("HTTP://user:pw@Host.Example:8080/x")
      .contains("host.example"))
    assert(urlHost("https://h.example").contains("h.example"))
    assert(urlHost("/relative/path").isEmpty)
    assert(urlHost("ftp://h.example/f").isEmpty)
    assert(urlHost("mailto:x@y.example").isEmpty)
    assert(urlHost("https:///no-host").isEmpty)
    assert(urlHost(null).isEmpty)
  }
}
