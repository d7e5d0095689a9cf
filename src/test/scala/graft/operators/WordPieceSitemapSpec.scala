package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Unit laws for the round-11 text/crawl additions: WordPiece greedy
  * encode, sentence segmentation, sitemap parsing. */
class WordPieceSitemapSpec extends SparkSpec {

  import spark.implicits._

  private def checkProp(p: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def encodeOne(word: String): Seq[String] = {
    val df = Seq((0L, word)).toDF("doc_id", "text")
    TextAnalysis.wordPieceEncode(df, TextAnalysis.WordPieceVocab)
      .select($"pieces").as[String].head().split(" ").toSeq
  }

  test("WordPiece picks the LONGEST piece first, not a shorter prefix") {
    // 'scan' is in the vocab whole; a shorter-first encoder says s ##c…
    assert(encodeOne("scan") === Seq("scan"))
    // 'scanner': scan + n + er? greedy: 'scan', then 'ne'? n-e-r: vocab
    // has 'ng','en' but at pos 4 remainder is 'ner' → no 3/4-piece, 'ne'
    // not in vocab, so single letters n/e/r → check exact greedy walk
    assert(encodeOne("tables") === Seq("tab", "##le", "##s"))
    assert(encodeOne("question") === Seq("que", "##st", "##ion"))
  }

  test("WordPiece reassembly: stripping '##' and concatenating pieces " +
      "recovers every word (totality, no [UNK])") {
    checkProp(Prop.forAll(Gen.nonEmptyListOf(Gen.choose('a', 'z'))
        .map(_.mkString)) { w =>
      val pieces = encodeOne(w)
      pieces.head.startsWith("##") == false &&
        pieces.tail.forall(_.startsWith("##")) &&
        pieces.map(_.stripPrefix("##")).mkString === w
    }, n = 30)
  }

  test("sentence segmentation keeps terminators, indexes, word counts") {
    val df = Seq((7L, "alpha beta gamma. delta epsilon! zeta?"))
      .toDF("doc_id", "prose")
    val out = TextAnalysis.segmentSentences(df, $"prose")
      .orderBy($"sent_idx")
      .select($"sent_idx", $"sentence", $"n_words")
      .collect()
    assert(out.map(_.getString(1)).toSeq ===
      Seq("alpha beta gamma.", "delta epsilon!", "zeta?"))
    assert(out.map(_.getLong(2)).toSeq === Seq(3L, 2L, 1L))
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
  }

  test("unterminated trailing text yields no sentence (contract: the " +
      "regex requires a terminator)") {
    val df = Seq((1L, "complete one. dangling tail")).toDF("doc_id", "prose")
    val out = TextAnalysis.segmentSentences(df, $"prose")
      .select($"sentence").as[String].collect()
    assert(out.toSeq === Seq("complete one."))
  }

  test("sitemap round-trip with entities, omitted fields, and priorities") {
    val entries = Seq(
      ("https://a.example/p?x=1&y=2", Some("2024-03-01"), Some(0.8)),
      ("https://a.example/<odd>", None, Some(0.1)),
      ("https://a.example/q", Some("2023-12-31"), None))
    val xml = Sitemap.emit(entries)
    assert(xml.contains("&amp;") && xml.contains("&lt;odd&gt;"))
    val parsed = Sitemap.parse(xml)
    assert(parsed === Seq(
      Sitemap.Entry("https://a.example/p?x=1&y=2", Some("2024-03-01"),
        Some(0.8)),
      Sitemap.Entry("https://a.example/<odd>", None, Some(0.1)),
      Sitemap.Entry("https://a.example/q", Some("2023-12-31"), None)))
  }

  test("'<url' never matches '<urlset', and attributes are tolerated") {
    val xml = """<urlset xmlns="x">
                |<url data-k="v"><loc> https://h.example/1 </loc></url>
                |</urlset>""".stripMargin
    assert(Sitemap.parse(xml) ===
      Seq(Sitemap.Entry("https://h.example/1", None, None)))
  }

  test("sitemap index parses child locs; urlset entries don't leak in") {
    val xml = """<sitemapindex>
                |<sitemap><loc>https://h.example/s1.xml</loc></sitemap>
                |<sitemap><loc>https://h.example/s2.xml</loc></sitemap>
                |</sitemapindex>""".stripMargin
    assert(Sitemap.parseIndex(xml) ===
      Seq("https://h.example/s1.xml", "https://h.example/s2.xml"))
    assert(Sitemap.parse(xml) === Seq.empty)
  }

  test("malformed sitemaps keep what parses and never throw") {
    assert(Sitemap.parse(null) === Seq.empty)
    assert(Sitemap.parse("") === Seq.empty)
    assert(Sitemap.parse("<urlset><url><loc></loc></url></urlset>")
      === Seq.empty) // empty loc skipped
    // truncated second entry: the first survives
    val cut = "<urlset><url><loc>https://h/1</loc></url><url><loc>https://h/2"
    assert(Sitemap.parse(cut) === Seq(Sitemap.Entry("https://h/1", None, None)))
    // unparseable priority degrades to None, entry kept
    val badPri = "<urlset><url><loc>https://h/3</loc>" +
      "<priority>high</priority></url></urlset>"
    assert(Sitemap.parse(badPri) ===
      Seq(Sitemap.Entry("https://h/3", None, None)))
  }
}
