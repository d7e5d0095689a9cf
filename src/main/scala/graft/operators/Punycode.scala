package graft.operators

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Punycode (RFC 3492) + IDN label handling for the URL/host plane.
  * A crawl frontier that can't fold `xn--mnchen-3ya.example` and
  * `münchen.example` onto one host double-counts every
  * internationalized domain — IDNs are a sizable share of ccTLD
  * zones. This implements the RFC 3492 bootstring codec exactly
  * (base 36, tmin 1, tmax 26, skew 38, damp 700, the bias adaptation
  * loop) with overflow checks, plus the `xn--` ACE label wrappers.
  *
  * Referee: `java.net.IDN` (the JDK's IDNA implementation) —
  * PunycodeSpec requires encode/decode to agree with toASCII/
  * toUnicode on generated lowercase labels in both directions.
  * Malformed ACE labels (bad digits, overflow, out-of-range or
  * surrogate code points) → None.
  */
object Punycode {

  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128

  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + (Base - TMin + 1) * delta / (delta + Skew)
  }

  private def digitValue(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else -1

  /** Decode one punycode payload (no `xn--` prefix) to code points. */
  def decode(s: String): Option[String] = {
    if (s == null) return None
    val out = new java.lang.StringBuilder
    val basicEnd = s.lastIndexOf('-')
    val output = new scala.collection.mutable.ArrayBuffer[Int]
    if (basicEnd >= 0) {
      var i = 0
      while (i < basicEnd) {
        val c = s.charAt(i)
        if (c >= 128) return None
        output += c.toInt
        i += 1
      }
    }
    var in = if (basicEnd >= 0) basicEnd + 1 else 0
    var n = InitialN
    var i = 0
    var bias = InitialBias
    while (in < s.length) {
      val oldi = i
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (in >= s.length) return None
        val digit = digitValue(s.charAt(in))
        in += 1
        if (digit < 0) return None
        if (digit > (Int.MaxValue - i) / w) return None // overflow
        i += digit * w
        val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax
          else k - bias
        if (digit < t) done = true
        else {
          if (w > Int.MaxValue / (Base - t)) return None
          w *= Base - t
          k += Base
        }
      }
      val numPoints = output.length + 1
      bias = adapt(i - oldi, numPoints, oldi == 0)
      // RFC 3492 §6.2 overflow handling: with numPoints=1 a legal i
      // can reach ~Int.MaxValue, so n would wrap negative and slip
      // past the range guard below.
      if (i / numPoints > Int.MaxValue - n) return None
      n += i / numPoints
      i %= numPoints
      if (n > 0x10ffff || (n >= 0xd800 && n <= 0xdfff)) return None
      output.insert(i, n)
      i += 1
    }
    output.foreach(out.appendCodePoint)
    Some(out.toString)
  }

  /** Encode code points to a punycode payload (no prefix). */
  def encode(s: String): Option[String] = {
    if (s == null) return None
    val cps = s.codePoints().toArray
    val out = new java.lang.StringBuilder
    cps.foreach(c => if (c < 128) out.append(c.toChar))
    val nBasic = out.length()
    if (nBasic > 0) out.append('-')
    var n = InitialN
    var delta = 0
    var bias = InitialBias
    var handled = nBasic
    while (handled < cps.length) {
      var m = Int.MaxValue
      cps.foreach(c => if (c >= n && c < m) m = c)
      if (m - n > (Int.MaxValue - delta) / (handled + 1)) return None
      delta += (m - n) * (handled + 1)
      n = m
      cps.foreach { c =>
        if (c < n) {
          delta += 1
          if (delta == Int.MaxValue) return None
        }
        if (c == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax
              else k - bias
            if (q < t) done = true
            else {
              val d = t + (q - t) % (Base - t)
              out.append(
                (if (d < 26) 'a' + d else '0' + d - 26).toChar)
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          out.append((if (q < 26) 'a' + q else '0' + q - 26).toChar)
          bias = adapt(delta, handled + 1, handled == nBasic)
          delta = 0
          handled += 1
        }
      }
      delta += 1
      n += 1
    }
    Some(out.toString)
  }

  /** ACE wrappers: a label needing encoding gains `xn--`; an
    * all-ASCII label passes through lowered. */
  def toAscii(label: String): Option[String] = {
    val lower = label.toLowerCase(java.util.Locale.ROOT)
    if (lower.forall(_ < 128)) Some(lower)
    else encode(lower).map("xn--" + _)
  }

  def toUnicode(label: String): Option[String] = {
    val lower = label.toLowerCase(java.util.Locale.ROOT)
    if (lower.startsWith("xn--")) decode(lower.substring(4))
    else Some(lower)
  }

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  private val FixtureLabels = Vector(
    ("bücher", "xn--bcher-kva"),
    ("münchen", "xn--mnchen-3ya"),
    ("россия", "xn--h1alffa9f"),
    ("中国", "xn--fiqs8s"),
    ("ελλάδα", "xn--hxakic4aa"),
    ("日本語", "xn--wgv71a119e"),
    ("café", "xn--caf-dma"))

  val defs: Seq[QueryDef] = Seq(

    // IDN host folding: mixed ACE and unicode host spellings of the
    // same logical hosts fold onto one canonical unicode host, so the
    // per-host census counts each host ONCE. Even ids carry the ACE
    // spelling, odd the unicode one; the shuffle carries host keys.
    // The oracle replays both the fold and the ACE forms (ground
    // truth pinned from java.net.IDN at authoring time).
    QueryDef(
      "q437_idn_host_fold",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id")
          .fanout.as[Long]
          .map { id =>
            val (uni, ace) = FixtureLabels((id % 7).toInt)
            val spelled = if (id % 2 == 0) s"$ace.example" else s"$uni.example"
            val label = spelled.split('.').head
            val folded = Punycode.toUnicode(label).getOrElse("??")
            val aceBack = Punycode.toAscii(folded).getOrElse("??")
            (id, s"$folded.example", aceBack)
          }
          .toDF("doc_id", "host", "ace")
          .groupBy($"host", $"ace")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy($"host")
      },
      Some("""
        WITH m(i, uni, ace) AS (VALUES
          (0, 'bücher', 'xn--bcher-kva'),
          (1, 'münchen', 'xn--mnchen-3ya'),
          (2, 'россия', 'xn--h1alffa9f'),
          (3, '中国', 'xn--fiqs8s'),
          (4, 'ελλάδα', 'xn--hxakic4aa'),
          (5, '日本語', 'xn--wgv71a119e'),
          (6, 'café', 'xn--caf-dma'))
        SELECT m.uni || '.example' AS host, m.ace AS ace,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM documents d JOIN m ON m.i = d.doc_id % 7
        GROUP BY 1, 2
        ORDER BY host""")))
}
