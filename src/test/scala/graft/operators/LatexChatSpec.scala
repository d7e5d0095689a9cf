package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class LatexChatSpec extends AnyFunSuite {

  test("latex: comments, escaped %, math, cites") {
    val t = Latex.strip(
      "keep 100\\% here % drop this\nnext $a+b$ line \\cite{x} end")
    assert(t.plainText == "keep 100% here\nnext line end")
    assert(t.nMath == 1 && t.nCites == 1)
  }

  test("latex: env dropping vs keeping, sections, nested braces") {
    val t = Latex.strip(
      "\\section{The {nested} title}\n" +
        "\\begin{figure}\nsecret\\end{figure}\n" +
        "\\begin{abstract}visible\\end{abstract}\n" +
        "\\textbf{bold {deep} arg} tail")
    assert(t.plainText == "The {nested} title\nvisible\nbold {deep} arg tail")
    assert(t.nSections == 1 && t.nEnvsDropped == 1)
  }

  test("latex: display math forms, unclosed constructs run to EOF") {
    assert(Latex.strip("a \\[x=1\\] b $$y$$ c").plainText == "a b c")
    assert(Latex.strip("a \\[x=1\\] b").nMath == 1)
    assert(Latex.strip("pre $never closed").plainText == "pre")
    assert(Latex.strip("pre \\begin{figure} never").plainText == "pre")
    assert(Latex.strip(null).plainText == "")
  }

  test("latex: unknown commands keep brace args, bare commands drop") {
    assert(Latex.strip("\\foo{kept} \\bar baz \\\\ next").plainText ==
      "kept baz\nnext")
  }

  test("latex: nested machinery inside kept args still strips") {
    val t = Latex.strip("\\emph{see \\cite{x} and $a+b$ here}")
    assert(t.plainText == "see and here")
    assert(t.nCites == 1 && t.nMath == 1)
    // escaped braces inside an argument do not derail nesting
    assert(Latex.strip("\\textbf{set \\{x\\} ok} rest").plainText ==
      "set {x} ok rest")
  }

  test("chat render: spans are codepoints and survive astral text") {
    val astral = new String(Character.toChars(0x1F600)) // 1 cp, 2 chars
    val (r, spans) = Chat.render(Seq(
      Chat.Turn(0, "user", astral + astral),
      Chat.Turn(1, "assistant", "yes " + astral)))
    val (a, b) = spans.head
    assert(Chat.sliceSpan(r, a, b) == "yes " + astral)
    assert(b - a == 5) // 5 codepoints, though 6 UTF-16 chars
  }

  test("chat render: spans address exactly the assistant content") {
    val (r, spans) = Chat.render(Seq(
      Chat.Turn(1, "assistant", "reply one"),
      Chat.Turn(0, "user", "hi"),
      Chat.Turn(2, "assistant", "reply two")))
    // turns re-sort by idx: user first
    assert(r.startsWith("<|im_start|>user\nhi<|im_end|>\n"))
    assert(spans.size == 2)
    spans.zip(Seq("reply one", "reply two")).foreach { case ((a, b), exp) =>
      assert(r.substring(a.toInt, b.toInt) == exp)
    }
  }

  test("table markdown: missing cells render empty, pipes escape") {
    val cells = Seq(
      HtmlExtract.TableCell(0, 0, 0, "h1", true),
      HtmlExtract.TableCell(0, 0, 1, "h2", true),
      HtmlExtract.TableCell(0, 1, 1, "a|b", false)) // col 0 missing
    val md = TableText.toMarkdown(cells)
    assert(md == Vector((0,
      "| h1 | h2 |\n| --- | --- |\n|  | a\\|b |")))
  }
}
