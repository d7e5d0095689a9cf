package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

class BlocklistSpec extends SparkSpec {

  private def checkProp(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  /** All occurrence positions, overlapping included — the spec the
    * automaton must match. */
  private def bruteCount(text: String, p: String): Long =
    (0 to text.length - p.length)
      .count(i => text.regionMatches(i, p, 0, p.length)).toLong

  test("automaton matches a brute-force scan on the classic " +
      "he/she/his/hers overlap family") {
    val ac = AhoCorasick.build(Seq("he", "she", "his", "hers"))
    val c = ac.countMatches("ushers say she sees his hershey")
    val expect = Seq("he", "she", "his", "hers")
      .map(p => bruteCount("ushers say she sees his hershey", p))
    assert(c.toSeq == expect, s"${c.toSeq} vs $expect")
    // 'ushers' alone: she, he (inside she), hers — nested outputs fire
    assert(ac.countMatches("ushers").toSeq == Seq(1L, 1L, 0L, 1L))
  }

  test("automaton == brute force on random binary strings with " +
      "bordered, nested, and prefix-sharing patterns") {
    val pats = Seq("a", "aa", "ab", "aab", "aba", "bb", "abab")
    val ac = AhoCorasick.build(pats)
    checkProp(Prop.forAll(Gen.listOf(Gen.oneOf('a', 'b'))) { chars =>
      val text = chars.mkString
      ac.countMatches(text).toSeq == pats.map(p => bruteCount(text, p))
    })
  }

  test("build rejects empty and duplicate patterns; null text is zeros") {
    intercept[IllegalArgumentException](AhoCorasick.build(Nil))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("a", "")))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("x", "x")))
    val ac = AhoCorasick.build(Seq("x"))
    assert(ac.countMatches(null).toSeq == Seq(0L))
  }

  test("blocklistMatch: totals, hit counts, dominant-pattern tiebreak") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam ham"), // spam 2x, ham 1x
      (2L, "ham spam"), // tie 1-1 -> lexicographically smaller 'ham'
      (3L, "clean text"), // no hits -> NULL top, 0 count
      (4L, "hamham")) // adjacent occurrences both count
      .toDF("doc_id", "text")
    val r = Blocklist.blocklistMatch(docs, Seq("spam", "ham"))
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2),
        if (x.isNullAt(3)) null else x.getString(3), x.getLong(4)))
    assert(r(0) == ((1L, 3L, 2, "spam", 2L)))
    assert(r(1) == ((2L, 2L, 2, "ham", 1L)))
    assert(r(2) == ((3L, 0L, 0, null, 0L)))
    assert(r(3) == ((4L, 2L, 1, "ham", 2L)))
  }

  test("payLevelDomain: longest rule wins, default rule for unknown " +
      "TLDs, bare public suffix has no PLD") {
    import spark.implicits._
    val hosts = Seq(
      (1L, "www.example.com"),
      (2L, "a.b.deep.example.co.uk"),
      (3L, "user.github.io"),
      (4L, "example.zz"), // unknown TLD -> default rule (last label)
      (5L, "github.io"), // bare public suffix -> NULL pld
      (6L, "com")) // bare 1-label suffix -> NULL pld
      .toDF("doc_id", "host")
    val psl = Seq("com", "io", "uk", "co.uk", "github.io")
    val r = TextAnalysis.payLevelDomain(hosts, "doc_id", "host", psl)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getString(2),
        if (x.isNullAt(3)) null else x.getString(3)))
    assert(r(0) == ((1L, "com", "example.com")))
    assert(r(1) == ((2L, "co.uk", "example.co.uk")))
    assert(r(2) == ((3L, "github.io", "user.github.io")))
    assert(r(3) == ((4L, "zz", "example.zz")))
    assert(r(4) == ((5L, "github.io", null)))
    assert(r(5) == ((6L, "com", null)))
  }

  test("canonicalDedupKey: composition form, case, and spacing " +
      "variants collapse to one group with the min-id survivor") {
    import spark.implicits._
    val docs = Seq(
      (10L, "Caf\u00e9 du Monde"), // composed U+00E9
      (11L, "Café du Monde"), // decomposed
      (12L, "CAF\u00c9  DU   MONDE "), // case + ragged spacing
      (13L, "something else"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.canonicalDedupKey(docs)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        x.getBoolean(3)))
    assert(r.length == 4)
    assert(r(0) == ((10L, "café du monde", 3L, true)))
    assert(r(1) == ((11L, "café du monde", 3L, false)))
    assert(r(2) == ((12L, "café du monde", 3L, false)))
    assert(r(3) == ((13L, "something else", 1L, true)))
  }

  test("canonicalDedupKey collapses tabs/newlines/CR/FF like spaces " +
      "and trims them off the edges") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b"),
      (2L, "a\tb"),
      (3L, "\na \t b\r\n"),
      (4L, "a\fb "))
      .toDF("doc_id", "text")
    val r = TextAnalysis.canonicalDedupKey(docs).orderBy("doc_id")
      .collect().map(x => (x.getString(1), x.getLong(2)))
    assert(r.forall(_ == (("a b", 4L))), r.toSeq.toString)
  }
}
