package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import Code._

class CodeSpec extends AnyFunSuite {

  test("language id: extension beats shebang; env and version suffixes") {
    assert(detectLanguage("a/b.py", "#!/usr/bin/env node\nx") == ("python", "ext"))
    assert(detectLanguage("bin/run", "#!/usr/bin/env python3\nx") == ("python", "shebang"))
    assert(detectLanguage("bin/run", "#!/usr/bin/python2.7\nx") == ("python", "shebang"))
    assert(detectLanguage("t", "#!/bin/zsh\nx") == ("shell", "shebang"))
    assert(detectLanguage("a.zzz", "plain") == ("unknown", "none"))
    assert(detectLanguage("noext", "no shebang") == ("unknown", "none"))
    assert(detectLanguage("UPPER.PY", "x") == ("python", "ext"))
    assert(detectLanguage(".hidden", "x") == ("unknown", "none")) // dotfile: no ext
    assert(detectLanguage("x.c", null) == ("c", "ext"))
  }

  test("license: SPDX wins, phrase order, star-terminated tag, none") {
    assert(detectLicense("// SPDX-License-Identifier: Apache-2.0\ncode") ==
      ("Apache-2.0", "spdx"))
    assert(detectLicense("/* SPDX-License-Identifier: MIT */") == ("MIT", "spdx"))
    assert(detectLicense("Permission is hereby granted, free of charge") ==
      ("MIT", "phrase"))
    assert(detectLicense("x" * 2000 + "SPDX-License-Identifier: MIT") ==
      ("none", "none")) // outside the header window
    assert(detectLicense(null) == ("none", "none"))
    assert(detectLicense("no license here") == ("none", "none"))
  }

  test("comment strip (c): strings shield, block merges lines, counts") {
    val (s1, n1) = stripComments("a = \"//x\"; // tail\nb;", "c")
    assert(s1 == "a = \"//x\"; \nb;")
    assert(n1 == 7) // '// tail'
    val (s2, n2) = stripComments("x/* a\nb */y", "c")
    assert(s2 == "xy")
    assert(n2 == 9)
    val (s3, _) = stripComments("c = 'it\\'s'; // q", "c")
    assert(s3 == "c = 'it\\'s'; ")
    // unterminated block runs to EOF
    val (s4, n4) = stripComments("x /* open", "c")
    assert(s4 == "x " && n4 == 7)
    // division is not a comment
    assert(stripComments("a = b / c / d;", "c")._1 == "a = b / c / d;")
  }

  test("alpha-normalize: consistent renames are invariant, structure is not") {
    val a = alphaNormalize("int total = count + total;")
    val b = alphaNormalize("int sum   = items + sum;")
    assert(a == b && a == "int %0=%1+%0;")
    // inconsistent rename (different reference pattern) differs
    assert(alphaNormalize("int x = y + z;") != a)
    // keywords survive; first-occurrence order is stable
    assert(alphaNormalize("if (foo) return foo;") == "if(%0)return %0;")
    assert(alphaNormalize("while (a) a = a - 1;") == "while(%0)%0=%0-1;")
    assert(alphaNormalize(null) == "")
    // literals are not identifiers
    assert(alphaNormalize("x = 42;") == "%0=42;")
  }

  test("alpha-normalize: literals and % text cannot forge clone keys") {
    // hex/suffixed numeric literals stay verbatim — 0xFF vs 0xAB differ
    assert(alphaNormalize("int a = 0xFF;") != alphaNormalize("int a = 0xAB;"))
    assert(alphaNormalize("long v = 1_000L;").contains("1_000L"))
    // string literal contents are values, not identifiers
    assert(alphaNormalize("f(\"abc\")") != alphaNormalize("f(\"xyz\")"))
    assert(alphaNormalize("s = \"don't // strip\";") ==
      "%0=\"don't // strip\";")
    // a literal %0 in source cannot collide with the rename alphabet
    assert(alphaNormalize("f(%0);") != alphaNormalize("f(f);"))
  }

  test("comment strip (hash): # shielded by strings, newline survives") {
    val (s, n) = stripComments("a = \"#no\" # yes\nb = 1", "hash")
    assert(s == "a = \"#no\" \nb = 1")
    assert(n == 5)
    assert(stripComments(null, "hash") == ("", 0L))
  }
}
