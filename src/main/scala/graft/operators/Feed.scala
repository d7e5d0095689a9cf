package graft.operators

/** RSS 2.0 / Atom feed parsing — the crawl-discovery channel that
  * pairs with [[Sitemap]] (public specs: RSS 2.0, RFC 4287 Atom). A
  * frontier that reads sitemaps but not feeds misses the freshest
  * URLs a host publishes; a curation pass reads the entry dates to
  * prioritize recency. Same discipline as the sitemap walk: a
  * purpose-built scan (no DOM), entity-decoded text, CDATA tolerated,
  * malformed-but-recoverable entries skipped rather than fatal,
  * not-a-feed → None.
  */
object Feed {

  /** `kind` is "rss" or "atom"; `maxDate` is the lexicographic max of
    * the per-entry date strings — exact for Atom's RFC 3339 stamps,
    * and replayable for fixtures either way. */
  final case class FeedMeta(kind: String, title: Option[String],
      nEntries: Int, nLinks: Int, maxDate: Option[String])

  private def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&")

  /** Text content of the FIRST `<tag ...>text</tag>` at or after
    * `from` within [from, until); CDATA unwrapped, entities decoded. */
  private def tagText(s: String, tag: String, from: Int,
      until: Int): Option[String] = {
    var i = from
    while (i < until) {
      val k = s.indexOf("<" + tag, i)
      if (k < 0 || k >= until) return None
      val after = k + 1 + tag.length
      if (after < s.length &&
        (s.charAt(after) == '>' || s.charAt(after).isWhitespace)) {
        val open = s.indexOf('>', k)
        if (open < 0 || open >= until) return None
        val close = s.indexOf("</" + tag, open)
        if (close < 0 || close > until) return None
        val raw = s.substring(open + 1, close).trim
        val body =
          if (raw.startsWith("<![CDATA[") && raw.endsWith("]]>"))
            raw.substring(9, raw.length - 3)
          else decodeEntities(raw)
        return Some(body.trim)
      }
      i = k + 1
    }
    None
  }

  def decodeFeed(b: Array[Byte]): Option[FeedMeta] =
    try {
      if (b == null || b.length < 10) return None
      val s = new String(b, "UTF-8")
      val rssAt = s.indexOf("<rss")
      val atomAt = s.indexOf("<feed")
      val isRss = rssAt >= 0 && (atomAt < 0 || rssAt < atomAt)
      val isAtom = atomAt >= 0 && !isRss
      if (!isRss && !isAtom) return None
      val (entryTag, dateTag, kind) =
        if (isRss) ("item", "pubDate", "rss") else ("entry", "updated", "atom")
      // channel/feed title = first <title> BEFORE the first entry
      val firstEntry = s.indexOf("<" + entryTag)
      val headEnd = if (firstEntry < 0) s.length else firstEntry
      val title = tagText(s, "title", 0, headEnd)
      var nEntries = 0
      var nLinks = 0
      var maxDate: Option[String] = None
      var i = firstEntry
      while (i >= 0 && i < s.length) {
        val open = s.indexOf('>', i)
        val close = s.indexOf("</" + entryTag, i)
        if (open < 0 || close < 0) return None // unterminated entry
        nEntries += 1
        // links: RSS <link>url</link>; Atom <link href="..."/>
        if (isRss) {
          if (tagText(s, "link", open, close).exists(_.nonEmpty)) nLinks += 1
        } else {
          val lk = s.indexOf("<link", open)
          if (lk >= 0 && lk < close) {
            val (attrs, _) = HtmlExtract.tagAttrs(s, lk + 5)
            if (attrs.get("href").exists(_.nonEmpty)) nLinks += 1
          }
        }
        tagText(s, dateTag, open, close).foreach { d =>
          if (maxDate.forall(_ < d)) maxDate = Some(d)
        }
        i = s.indexOf("<" + entryTag, close)
      }
      if (nEntries == 0) return None // a feed with no entries is not useful
      Some(FeedMeta(kind, title, nEntries, nLinks, maxDate))
    } catch { case _: Exception => None }

  /** Fixture emitter, RSS 2.0: channel title (entity-escaped), per-item
    * title/link/pubDate with a CDATA title on every third item. */
  def encodeRss(title: String, items: Seq[(String, String, String)])
      : Array[Byte] = {
    val esc = title.replace("&", "&amp;").replace("<", "&lt;")
    val sb = new StringBuilder(
      s"""<?xml version="1.0"?>\n<rss version="2.0"><channel>\n""" +
        s"<title>$esc</title><link>https://example.test/</link>\n")
    items.zipWithIndex.foreach { case ((t, link, date), k) =>
      val it =
        if (k % 3 == 2) s"<![CDATA[$t]]>"
        else t.replace("&", "&amp;").replace("<", "&lt;")
      sb.append(s"<item><title>$it</title><link>$link</link>" +
        s"<pubDate>$date</pubDate></item>\n")
    }
    sb.append("</channel></rss>\n")
    sb.toString.getBytes("UTF-8")
  }

  /** Fixture emitter, Atom (RFC 4287): feed title, per-entry title,
    * href-style link, RFC 3339 updated stamp. */
  def encodeAtom(title: String, entries: Seq[(String, String, String)])
      : Array[Byte] = {
    val esc = title.replace("&", "&amp;").replace("<", "&lt;")
    val sb = new StringBuilder(
      """<?xml version="1.0" encoding="utf-8"?>""" + "\n" +
        s"""<feed xmlns="http://www.w3.org/2005/Atom">\n""" +
        s"<title>$esc</title>\n")
    entries.foreach { case (t, href, updated) =>
      val te = t.replace("&", "&amp;").replace("<", "&lt;")
      sb.append(s"""<entry><title>$te</title><link href="$href"/>""" +
        s"<updated>$updated</updated></entry>\n")
    }
    sb.append("</feed>\n")
    sb.toString.getBytes("UTF-8")
  }
}
