package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import Feed._

class FeedSpec extends AnyFunSuite {

  private val entries = Seq(
    ("first & post", "https://h.test/1", "2020-01-05"),
    ("second <b>", "https://h.test/2", "2021-03-11"),
    ("cdata & <raw>", "https://h.test/3", "2019-12-31"))

  test("RSS round-trip: channel title, counts, CDATA item, max date") {
    val m = decodeFeed(encodeRss("chan & co", entries)).get
    assert(m.kind === "rss")
    assert(m.title.contains("chan & co"))
    assert(m.nEntries === 3)
    assert(m.nLinks === 3)
    assert(m.maxDate.contains("2021-03-11"))
  }

  test("Atom round-trip: href links, RFC 3339 max") {
    val m = decodeFeed(encodeAtom("atom <feed>", entries)).get
    assert(m.kind === "atom")
    assert(m.title.contains("atom <feed>"))
    assert(m.nEntries === 3)
    assert(m.nLinks === 3)
    assert(m.maxDate.contains("2021-03-11"))
  }

  test("channel title comes from BEFORE the entries (no leak-up)") {
    // a feed with NO channel title: the first title is an item's
    val noTitle = ("""<rss version="2.0"><channel>""" +
      "<item><title>item only</title><link>u</link></item>" +
      "</channel></rss>").getBytes("UTF-8")
    val m = decodeFeed(noTitle).get
    assert(m.title === None)
    assert(m.nEntries === 1)
  }

  test("entries without links or dates count entries but not links") {
    val bare = ("""<rss version="2.0"><channel><title>t</title>""" +
      "<item><title>a</title></item><item><link>u</link></item>" +
      "</channel></rss>").getBytes("UTF-8")
    val m = decodeFeed(bare).get
    assert(m.nEntries === 2)
    assert(m.nLinks === 1)
    assert(m.maxDate === None)
  }

  test("not-a-feed, empty feeds, and truncation yield None") {
    assert(decodeFeed(null) === None)
    assert(decodeFeed("<html>page</html>".getBytes) === None)
    assert(decodeFeed(
      """<rss version="2.0"><channel><title>t</title></channel></rss>"""
        .getBytes) === None) // zero entries
    val good = encodeRss("t", entries)
    (1 until good.length by 3).foreach(n => decodeFeed(good.take(n)))
    assert(decodeFeed(good.take(good.length / 2)) === None)
  }
}
