package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class ScriptFrontierSpec extends AnyFunSuite {

  test("script census: counts, dominance tie-break, mixed flag") {
    val c = UnicodeScripts.census("abc где xy")
    assert(c.nLetters == 8 && c.dominant == "latin" && c.dominantCount == 5)
    assert(c.nScripts == 2 && c.mixed) // 3 cyrillic letters >= threshold
    val t = UnicodeScripts.census("ab яб") // 2 vs 2: name ascending wins
    assert(t.dominant == "cyrillic" && !t.mixed) // cyrillic < latin
    assert(UnicodeScripts.census("123 !?").nScripts == 0)
    assert(UnicodeScripts.census(null).dominant == "none")
    val han = UnicodeScripts.census("中文文本 test")
    assert(han.dominant == "han" && han.nLetters == 8)
  }

  test("script census: supplementary-plane codepoints walk correctly") {
    // U+10400 DESERET CAPITAL LONG I — a surrogate-pair letter
    val c = UnicodeScripts.census(new String(Character.toChars(0x10400)) * 4)
    assert(c.nLetters == 4 && c.dominant == "deseret")
  }

  test("mixed threshold is configurable") {
    assert(!UnicodeScripts.census("abcdef гд", mixedThreshold = 3).mixed)
    assert(UnicodeScripts.census("abcdef гд", mixedThreshold = 2).mixed)
  }
}
