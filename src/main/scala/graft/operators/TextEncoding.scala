package graft.operators

/** Charset sniffing for raw crawl bytes — the step BEFORE any text
  * operator can run (a corpus arrives as bytes of unknown encoding;
  * mis-decoding poisons every downstream token). Pure-JVM byte walk,
  * the [[ImageHeaders]] discipline applied to text:
  *
  *  1. BOMs decide outright: EF BB BF → utf-8, FF FE → utf-16le,
  *     FE FF → utf-16be (public Unicode standard).
  *  2. Otherwise a FULL RFC 3629 UTF-8 validation pass: correct
  *     continuation counts, overlong forms rejected (C0/C1 and the
  *     E0/F0 low-bound checks), UTF-16 surrogates rejected (ED A0+),
  *     > U+10FFFF rejected (F4 90+, F5+). All-ASCII → "ascii";
  *     valid with multi-byte sequences → "utf-8".
  *  3. Invalid UTF-8: a NUL seen before the first invalid sequence →
  *     "binary" (text encodings do not emit NULs; a pdf/zip mislabeled
  *     text/html does), else "windows-1252" (the de-facto fallback for
  *     8-bit crawl bytes — what browsers assume for undeclared legacy
  *     pages). The walk stops at the first invalid sequence, so the
  *     NUL-vs-1252 split is decided by whichever evidence comes first
  *     — deterministic, which is what the oracle replay needs.
  *
  * Deterministic and total: every byte sequence gets exactly one
  * label, so the whole classifier replays arithmetically for the
  * oracle. Map-only at scale.
  */
object TextEncoding {

  /** Sniff result: charset label + whether a BOM led the stream. */
  final case class Encoding(charset: String, bom: Boolean)

  def sniff(b: Array[Byte]): Encoding = {
    if (b == null || b.length == 0) return Encoding("empty", bom = false)
    if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
      (b(2) & 0xff) == 0xbf) return Encoding("utf-8", bom = true)
    if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe)
      return Encoding("utf-16le", bom = true)
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      return Encoding("utf-16be", bom = true)
    var i = 0
    var multi = false
    var hasNul = false
    var valid = true
    val n = b.length
    while (valid && i < n) {
      val c = b(i) & 0xff
      if (c == 0x00) { hasNul = true; i += 1 }
      else if (c < 0x80) i += 1
      else if (c < 0xc2) valid = false // continuation or overlong C0/C1
      else if (c < 0xe0) { // 2-byte
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) valid = false
        else { multi = true; i += 2 }
      } else if (c < 0xf0) { // 3-byte
        if (i + 2 >= n) valid = false
        else {
          val c1 = b(i + 1) & 0xff
          val lo = if (c == 0xe0) 0xa0 else 0x80 // E0: reject overlong
          val hi = if (c == 0xed) 0x9f else 0xbf // ED: reject surrogates
          if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80) valid = false
          else { multi = true; i += 3 }
        }
      } else if (c < 0xf5) { // 4-byte
        if (i + 3 >= n) valid = false
        else {
          val c1 = b(i + 1) & 0xff
          val lo = if (c == 0xf0) 0x90 else 0x80 // F0: reject overlong
          val hi = if (c == 0xf4) 0x8f else 0xbf // F4: reject > U+10FFFF
          if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80 ||
            (b(i + 3) & 0xc0) != 0x80) valid = false
          else { multi = true; i += 4 }
        }
      } else valid = false // F5..FF never appear in UTF-8
    }
    if (valid && !hasNul) {
      if (multi) Encoding("utf-8", bom = false)
      else Encoding("ascii", bom = false)
    } else if (hasNul) Encoding("binary", bom = false)
    else Encoding("windows-1252", bom = false)
  }
}
