package graft.operators

import graft.engine.Tables

/** Baseline JPEG entropy decode — the last big pixel gap closed: the
  * q229 family walks JPEG headers; this decodes the IMAGE — DQT
  * quantization tables, DHT canonical Huffman tables, the SOF0 frame,
  * the SOS scan with 0xFF00 byte-unstuffing and RSTn restart handling,
  * per-block DC-predictor + run/size AC coefficient decode, dequant,
  * de-zigzag, and a double-precision separable IDCT with level shift.
  * Grayscale sequential baseline (1 component, 8-bit, no progressive)
  * — the subset contract posture of the whole decoder family.
  *
  * Referee: JPEG is lossy and IDCT rounding is implementation-defined,
  * so there is no arithmetic pixel oracle. Instead the JDK's ImageIO
  * is IN THE LOOP twice: it ENCODES the fixture (a real libjpeg-style
  * baseline stream — tables, markers, entropy coding all foreign to
  * this code) and DECODES it back as the reference; the query's gate
  * column asserts our pixels match ImageIO's within ±1 (IDCT rounding
  * slack), and the oracle pins that gate TRUE for every document plus
  * the dims/block arithmetic. A Huffman slip, a stuffing miss, or a
  * dequant/zigzag error produces garbage far beyond ±1.
  *
  * Scale shape: map-only per blob, linear; the IDCT is O(8³) per
  * 8×8 block. Reference analogue: the map-side per-record slot
  * (mapper.py:21-41); the format is ITU-T T.81.
  */
object Jpeg {

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table: decode by walking code lengths 1..16
    * with the per-length first-code/base-index arrays (T.81 F.2.2.3). */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    // minCode(l), maxCode(l) (inclusive; -1 = none), valPtr(l)
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) == 0) { minCode(l) = 0; maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(code: Int, len: Int): Int = vals(valPtr(len) + code - minCode(len))
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    var sawEoi = false
    /** Refill honoring 0xFF stuffing; RSTn markers handled by caller
      * via expectRestart(). */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) throw new IllegalStateException("eof")
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= b.length) throw new IllegalStateException("eof")
          val m = b(pos) & 0xff; pos += 1
          if (m == 0x00) () // stuffed FF
          else if (m == 0xd9) { sawEoi = true; v = 0 } // EOI: pad with 0
          else throw new IllegalStateException(f"marker $m%02x in scan")
        }
        cur = v; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(h: Huff): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l)) return h.value(code, l)
        code = (code << 1) | bit()
        l += 1
      }
      throw new IllegalStateException("bad huffman code")
    }
    /** Byte-align and consume an RSTn marker. */
    def restart(expected: Int): Unit = {
      nbits = 0
      if (pos + 2 > b.length) throw new IllegalStateException("eof at rst")
      val m0 = b(pos) & 0xff; val m1 = b(pos + 1) & 0xff
      if (m0 != 0xff || m1 != (0xd0 | expected))
        throw new IllegalStateException("missing restart")
      pos += 2
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Separable 2-D inverse DCT (T.81 A.3.3 reference formula), double
    * precision, then level shift and clamp. Slow-but-exact-enough:
    * the referee tolerance is ±1 against libjpeg-style fast IDCTs. */
  private def idct8x8(coef: Array[Int]): Array[Int] = {
    val c = new Array[Double](8)
    var i = 0
    while (i < 8) { c(i) = if (i == 0) 1.0 / math.sqrt(2) else 1.0; i += 1 }
    val tmp = new Array[Double](64)
    // rows
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          s += c(u) * coef(y * 8 + u) *
            math.cos((2 * x + 1) * u * math.Pi / 16)
          u += 1
        }
        tmp(y * 8 + x) = s / 2
        x += 1
      }
      y += 1
    }
    val out = new Array[Int](64)
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          s += c(v) * tmp(v * 8 + x) *
            math.cos((2 * yy + 1) * v * math.Pi / 16)
          v += 1
        }
        val p = math.round(s / 2 + 128).toInt
        out(yy * 8 + x) = math.max(0, math.min(255, p))
        yy += 1
      }
      x += 1
    }
    out
  }

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Decode a grayscale baseline sequential JPEG to pixels. Corrupt /
    * unsupported (progressive, multi-component, 16-bit tables) →
    * None. */
  def decodeJpegGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
        (bytes(1) & 0xff) != 0xd8) return None
      var off = 2
      val qt = new Array[Array[Int]](4)
      val dcT = new Array[Huff](4); val acT = new Array[Huff](4)
      var w = -1; var h = -1
      var compQ = -1 // the single component's quant table id
      var dcId = -1; var acId = -1
      var restartInterval = 0
      var scanAt = -1
      while (scanAt < 0) {
        if (off + 4 > bytes.length) return None
        if ((bytes(off) & 0xff) != 0xff) return None
        val marker = bytes(off + 1) & 0xff
        val len = be16(bytes, off + 2)
        if (off + 2 + len > bytes.length) return None
        marker match {
          case 0xdb => // DQT (possibly several tables per segment)
            var p = off + 4
            while (p < off + 2 + len) {
              val pq = (bytes(p) & 0xff) >> 4
              val tq = bytes(p) & 0x0f
              if (pq != 0) return None // 8-bit tables only
              qt(tq) = Array.tabulate(64)(i => bytes(p + 1 + i) & 0xff)
              p += 65
            }
          case 0xc4 => // DHT
            var p = off + 4
            while (p < off + 2 + len) {
              val tc = (bytes(p) & 0xff) >> 4
              val th = bytes(p) & 0x0f
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) {
                bits(l) = bytes(p + l) & 0xff; total += bits(l); l += 1
              }
              val vals = Array.tabulate(total)(i => bytes(p + 17 + i) & 0xff)
              val tbl = new Huff(bits, vals)
              if (tc == 0) dcT(th) = tbl else acT(th) = tbl
              p += 17 + total
            }
          case 0xc0 => // SOF0 baseline
            if ((bytes(off + 4) & 0xff) != 8) return None
            h = be16(bytes, off + 5); w = be16(bytes, off + 7)
            if ((bytes(off + 9) & 0xff) != 1) return None // grayscale only
            // component: id, sampling (must be 1x1), quant table
            if ((bytes(off + 11) & 0xff) != 0x11) return None
            compQ = bytes(off + 12) & 0x0f
          case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
            0xcb | 0xcd | 0xce | 0xcf =>
            return None // extended/progressive/lossless out of contract
          case 0xdd => restartInterval = be16(bytes, off + 4)
          case 0xda => // SOS
            if ((bytes(off + 4) & 0xff) != 1) return None
            dcId = (bytes(off + 6) & 0xff) >> 4
            acId = bytes(off + 6) & 0x0f
            scanAt = off + 2 + len
          case _ => () // APPn / COM / others: hop
        }
        off += 2 + len
      }
      if (w <= 0 || h <= 0 || w.toLong * h > (1 << 26)) return None
      if (compQ < 0 || qt(compQ) == null || dcT(dcId) == null ||
        acT(acId) == null) return None
      val q = qt(compQ)
      val bw = (w + 7) / 8; val bh = (h + 7) / 8
      val px = new Array[Int](w * h)
      val r = new BitReader(bytes, scanAt)
      var dcPred = 0
      var rst = 0
      var blocksSinceRestart = 0
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          if (restartInterval > 0 && blocksSinceRestart == restartInterval) {
            r.restart(rst); rst = (rst + 1) & 7
            dcPred = 0; blocksSinceRestart = 0
          }
          val coef = new Array[Int](64)
          val t = r.decode(dcT(dcId))
          dcPred += extend(r.bits(t), t)
          coef(0) = dcPred * q(0)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = r.decode(acT(acId))
            val run = rs >> 4; val size = rs & 0x0f
            if (size == 0) {
              if (run == 15) k += 16 // ZRL
              else eob = true
            } else {
              k += run
              if (k > 63) throw new IllegalStateException("ac overrun")
              coef(ZigZag(k)) = extend(r.bits(size), size) * q(k)
              k += 1
            }
          }
          val block = idct8x8(coef)
          var yy = 0
          while (yy < 8) {
            val py = by * 8 + yy
            if (py < h) {
              var xx = 0
              while (xx < 8) {
                val pxx = bx * 8 + xx
                if (pxx < w) px(py * w + pxx) = block(yy * 8 + xx)
                xx += 1
              }
            }
            yy += 1
          }
          blocksSinceRestart += 1
          bx += 1
        }
        by += 1
      }
      Some((w, h, px))
    } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  final case class JpegRow(doc_id: Long, width: Int, height: Int,
      n_blocks: Int, ref_match: Boolean)

  val defs: Seq[QueryDef] = Seq(

    // ----- baseline JPEG decode, ImageIO-refereed ----------------------
    // ImageIO ENCODES the fixture (foreign tables, markers, entropy
    // stream) and DECODES it as the reference; our decoder must land
    // within ±1 of the reference on every pixel (IDCT rounding slack —
    // JPEG is lossy, so there is no arithmetic pixel oracle; a
    // Huffman/stuffing/zigzag slip produces garbage, not ±1). The
    // oracle pins dims/blocks arithmetic and ref_match TRUE.
    QueryDef(
      "q357_jpeg_baseline_decode",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id").as[Long]
          .map { id =>
            val w = (16 + (id % 6) * 8).toInt
            val h = (16 + (id * 3 % 6) * 8).toInt
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            var i = 0
            while (i < w * h) {
              img.getRaster.setSample(i % w, i / w, 0,
                ((id * 31 + (i % w) * 7 + (i / w) * 13) % 256).toInt)
              i += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "jpg", bos)
            val blob = bos.toByteArray
            val ref = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(blob))
            val ours = decodeJpegGray(blob)
            val ok = ours.exists { case (dw, dh, px) =>
              dw == w && dh == h && {
                var worst = 0
                var j = 0
                while (j < w * h) {
                  // raw raster samples: getRGB would push linear gray
                  // through sRGB color management and distort values
                  val d = math.abs(px(j) -
                    ref.getRaster.getSample(j % w, j / w, 0))
                  if (d > worst) worst = d
                  j += 1
                }
                worst <= 1
              }
            }
            JpegRow(id, w, h, (w / 8) * (h / 8), ok)
          }.toDF().orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(16 + (doc_id % 6) * 8 AS INT) AS width,
               CAST(16 + (doc_id * 3 % 6) * 8 AS INT) AS height,
               CAST((16 + (doc_id % 6) * 8) // 8
                    * ((16 + (doc_id * 3 % 6) * 8) // 8) AS INT)
                 AS n_blocks,
               TRUE AS ref_match
        FROM documents
        ORDER BY doc_id"""))
  )
}
