package graft.operators

import java.io.ByteArrayOutputStream
import java.security.MessageDigest

import graft.engine.Tables

/** FLAC subset codec — REAL lossless audio decode, pure JVM.
  *
  * The audio family's header walks (q239 sniffs STREAMINFO) stop where
  * the actual compression starts. This implements the decode spine of
  * RFC 9639: STREAMINFO parse, frame headers (uncommon-blocksize form,
  * UTF-8-coded frame numbers, CRC-8), subframes CONSTANT / VERBATIM /
  * FIXED orders 0–4, Rice-coded residuals (4-bit parameters, escape to
  * raw width), fixed-predictor reconstruction, frame CRC-16, and the
  * STREAMINFO MD5 check over the decoded samples. Mono / 16-bit — the
  * subset that covers the fixed-predictor half of real-world FLAC; LPC
  * subframes and stereo decorrelation are out of contract (documented).
  *
  * Referee posture: the format's OWN integrity machinery closes the
  * encode→decode loop — STREAMINFO's MD5 is computed from the raw
  * samples before encoding, so the decoder's MD5 check fails unless
  * decode ∘ encode is exactly the identity; both CRCs use the
  * spec-published polynomials (0x07, 0x8005). The oracle replays the
  * sample formula arithmetically, closing the fixture→stats loop.
  *
  * Scale shape: map-only per blob, linear in bytes, corrupt → None —
  * identical to the q334/q336 decode family. Reference analogue: the
  * map-side per-record feature slot (mapper.py:21-41).
  */
object Flac {

  // ------------------------------------------------------------------
  // bit I/O (MSB-first, the FLAC convention)
  // ------------------------------------------------------------------

  private final class BitWriter {
    private val out = new ByteArrayOutputStream(256)
    private var cur = 0
    private var nbits = 0
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def writeUnary(q: Int): Unit = { // q zero bits then a one bit
      var i = 0
      while (i < q) { writeBits(0, 1); i += 1 }
      writeBits(1, 1)
    }
    def alignByte(): Unit = if (nbits > 0) writeBits(0, 8 - nbits)
    def toBytes: Array[Byte] = { alignByte(); out.toByteArray }
  }

  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    private var pos = startByte
    private var bit = 0
    def bytePos: Int = pos
    def aligned: Boolean = bit == 0
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        if (pos >= bytes.length) throw new IllegalStateException("eof")
        v = (v << 1) | ((bytes(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def readUnary(): Int = {
      var q = 0
      while (readBits(1) == 0) {
        q += 1
        if (q > (1 << 20)) throw new IllegalStateException("runaway unary")
      }
      q
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  // ------------------------------------------------------------------
  // CRCs (spec polynomials) and the UTF-8-style frame number
  // ------------------------------------------------------------------

  /** CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — frame header checksum. */
  def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
        else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0 — whole-frame checksum. */
  def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
        else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  private def writeUtf8Number(w: BitWriter, n: Long): Unit = {
    if (n < 0x80) w.writeBits(n, 8)
    else if (n < 0x800) {
      w.writeBits(0xc0L | (n >> 6), 8); w.writeBits(0x80L | (n & 0x3f), 8)
    } else if (n < 0x10000) {
      w.writeBits(0xe0L | (n >> 12), 8)
      w.writeBits(0x80L | ((n >> 6) & 0x3f), 8)
      w.writeBits(0x80L | (n & 0x3f), 8)
    } else throw new IllegalArgumentException(s"frame number $n too large")
  }

  private def readUtf8Number(r: BitReader): Long = {
    val b0 = r.readBits(8)
    if ((b0 & 0x80) == 0) b0
    else if ((b0 & 0xe0) == 0xc0)
      ((b0 & 0x1f) << 6) | (r.readBits(8) & 0x3f)
    else if ((b0 & 0xf0) == 0xe0) {
      val b1 = r.readBits(8) & 0x3f; val b2 = r.readBits(8) & 0x3f
      ((b0 & 0x0f) << 12) | (b1 << 6) | b2
    } else throw new IllegalStateException("bad utf8 frame number")
  }

  // ------------------------------------------------------------------
  // fixed predictors (RFC 9639 §9.2.5)
  // ------------------------------------------------------------------

  /** Residual of the order-k fixed predictor at position i (needs k
    * prior samples). */
  private def fixedResidual(s: Array[Int], i: Int, k: Int): Long = k match {
    case 0 => s(i)
    case 1 => s(i).toLong - s(i - 1)
    case 2 => s(i).toLong - 2L * s(i - 1) + s(i - 2)
    case 3 => s(i).toLong - 3L * s(i - 1) + 3L * s(i - 2) - s(i - 3)
    case _ => s(i).toLong - 4L * s(i - 1) + 6L * s(i - 2) -
      4L * s(i - 3) + s(i - 4)
  }

  /** Reconstruct sample i in place from its residual. */
  private def fixedRestore(s: Array[Int], i: Int, k: Int, res: Long): Int =
    (k match {
      case 0 => res
      case 1 => res + s(i - 1)
      case 2 => res + 2L * s(i - 1) - s(i - 2)
      case 3 => res + 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
      case _ => res + 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) -
        s(i - 4)
    }).toInt

  // ------------------------------------------------------------------
  // encode (fixture emitter — byte-valid subset streams)
  // ------------------------------------------------------------------

  private def zigzag(r: Long): Long = if (r >= 0) r << 1 else (-r << 1) - 1
  private def unzigzag(u: Long): Long = if ((u & 1) == 0) u >> 1 else -((u + 1) >> 1)

  /** Encode mono 16-bit samples as a byte-valid FLAC subset stream:
    * fLaC magic, STREAMINFO (incl. real MD5 of the raw LE sample
    * bytes), frames of `blockSize` with the uncommon-blocksize header
    * form. Subframe choice per frame: CONSTANT when all samples agree,
    * VERBATIM every 7th frame, else FIXED order frameIdx % 5 (capped
    * by available warmup), Rice parameter fitted per frame with the
    * escape-to-raw path when residuals outgrow param 14. */
  def encodeFlac(samples: Array[Int], blockSize: Int,
      sampleRate: Int): Array[Byte] = {
    require(blockSize >= 16 && blockSize <= 65535, s"bad block $blockSize")
    samples.foreach(s => require(s >= -32768 && s <= 32767, s"s16 range: $s"))
    val out = new ByteArrayOutputStream(samples.length + 256)
    out.write("fLaC".getBytes("US-ASCII"), 0, 4)
    // STREAMINFO, last-metadata-block flag set
    val si = new BitWriter
    si.writeBits(blockSize, 16); si.writeBits(blockSize, 16)
    si.writeBits(0, 24); si.writeBits(0, 24) // frame sizes unknown
    si.writeBits(sampleRate, 20)
    si.writeBits(0, 3) // channels - 1 = 0 (mono)
    si.writeBits(15, 5) // bits per sample - 1 = 15
    si.writeBits(samples.length.toLong, 36)
    val md = MessageDigest.getInstance("MD5")
    samples.foreach { s => md.update(s.toByte); md.update((s >> 8).toByte) }
    md.digest().foreach(b => si.writeBits(b & 0xffL, 8))
    val siBytes = si.toBytes
    out.write(0x80) // last block + type 0
    out.write(0); out.write(0); out.write(siBytes.length) // 24-bit length
    out.write(siBytes, 0, siBytes.length)

    var frameIdx = 0L
    var off = 0
    while (off < samples.length) {
      val n = math.min(blockSize, samples.length - off)
      val frame = new BitWriter
      // header: sync(14) 111111111111 10, reserved 0, blocking 0 (fixed)
      frame.writeBits(0xfff8L >> 0, 16) // 0xFF 0xF8
      frame.writeBits(0x7, 4) // blocksize: 16-bit at end of header
      frame.writeBits(0x0, 4) // sample rate: from STREAMINFO
      frame.writeBits(0x0, 4) // channels: mono
      frame.writeBits(0x4, 3) // sample size: 16-bit
      frame.writeBits(0, 1) // reserved
      writeUtf8Number(frame, frameIdx)
      frame.writeBits(n - 1, 16)
      val headerBytes = frame.toBytes // byte-aligned by construction
      val withCrc8 = headerBytes :+ crc8(headerBytes, 0, headerBytes.length).toByte

      // subframe
      val sub = new BitWriter
      val block = java.util.Arrays.copyOfRange(samples, off, off + n)
      val allEqual = block.forall(_ == block(0))
      if (allEqual) {
        sub.writeBits(0, 1); sub.writeBits(0, 6); sub.writeBits(0, 1)
        sub.writeBits(block(0) & 0xffffL, 16)
      } else if (frameIdx % 7 == 3) { // VERBATIM
        sub.writeBits(0, 1); sub.writeBits(1, 6); sub.writeBits(0, 1)
        block.foreach(s => sub.writeBits(s & 0xffffL, 16))
      } else { // FIXED order
        val k = math.min((frameIdx % 5).toInt, n - 1)
        sub.writeBits(0, 1); sub.writeBits(8 | k, 6); sub.writeBits(0, 1)
        var i = 0
        while (i < k) { sub.writeBits(block(i) & 0xffffL, 16); i += 1 }
        val res = Array.tabulate(n - k)(j => fixedResidual(block, k + j, k))
        // rice fit: parameter from the mean zigzag magnitude
        val zz = res.map(zigzag)
        val mean = if (zz.isEmpty) 0L else zz.sum / math.max(1, zz.length)
        var p = 0
        while (p < 14 && (mean >> p) > 0) p += 1
        val maxZz = if (zz.isEmpty) 0L else zz.max
        sub.writeBits(0, 2) // residual method: 4-bit rice
        sub.writeBits(0, 4) // partition order 0: one partition
        if ((maxZz >> p) > (1 << 10)) {
          // escape: raw fixed-width residuals in TWO'S COMPLEMENT (the
          // spec's unencoded form — not zigzag), param 1111 + 5-bit
          // width; engaged when the unary quotients would outgrow the
          // fitted parameter (spike-over-silence frames)
          val width = res.map { v =>
            65 - java.lang.Long.numberOfLeadingZeros(if (v >= 0) v else ~v)
          }.max.min(31)
          sub.writeBits(0xf, 4); sub.writeBits(width, 5)
          res.foreach(v => sub.writeBits(v & ((1L << width) - 1), width))
        } else {
          sub.writeBits(p, 4)
          zz.foreach { u =>
            sub.writeUnary((u >> p).toInt)
            if (p > 0) sub.writeBits(u & ((1L << p) - 1), p)
          }
        }
      }
      val subBytes = sub.toBytes // zero-padded to byte alignment per spec
      val frameBytes = withCrc8 ++ subBytes
      val c16 = crc16(frameBytes, 0, frameBytes.length)
      out.write(frameBytes, 0, frameBytes.length)
      out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
      off += n
      frameIdx += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  final case class FlacAudio(sampleRate: Int, samples: Array[Int],
      frames: Int, md5Ok: Boolean)

  /** Decode a mono 16-bit FLAC subset stream back to samples: verified
    * STREAMINFO walk, per-frame CRC-8 + CRC-16, CONSTANT / VERBATIM /
    * FIXED subframes, Rice + escape residuals, predictor
    * reconstruction, final MD5 check. Corrupt / unsupported → None. */
  def decodeFlac(bytes: Array[Byte]): Option[FlacAudio] =
    try {
      if (bytes.length < 4 + 4 + 34 + 2) return None
      if (new String(bytes, 0, 4, "US-ASCII") != "fLaC") return None
      // metadata blocks: walk until last-flag; need STREAMINFO first
      var off = 4
      var rate = -1; var totalSamples = -1L; var md5 = Array.empty[Byte]
      var last = false
      var sawStreamInfo = false
      while (!last) {
        if (off + 4 > bytes.length) return None
        val hdr = bytes(off) & 0xff
        last = (hdr & 0x80) != 0
        val typ = hdr & 0x7f
        val len = ((bytes(off + 1) & 0xff) << 16) |
          ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
        if (off + 4 + len > bytes.length) return None
        if (typ == 0) {
          if (len != 34) return None
          val r = new BitReader(bytes, off + 4)
          r.readBits(16); r.readBits(16); r.readBits(24); r.readBits(24)
          rate = r.readBits(20).toInt
          val channels = r.readBits(3).toInt + 1
          val bps = r.readBits(5).toInt + 1
          if (channels != 1 || bps != 16) return None // subset contract
          totalSamples = r.readBits(36)
          md5 = Array.tabulate(16)(_ => r.readBits(8).toByte)
          sawStreamInfo = true
        }
        off += 4 + len
      }
      if (!sawStreamInfo || totalSamples < 0 ||
        totalSamples > (1L << 26)) return None
      val samples = new Array[Int](totalSamples.toInt)
      var got = 0
      var frames = 0
      while (got < totalSamples) {
        val frameStart = off
        val r = new BitReader(bytes, off)
        if (r.readBits(14) != 0x3ffe) return None // sync
        r.readBits(1) // reserved
        if (r.readBits(1) != 0) return None // fixed blocksize only
        val bsBits = r.readBits(4).toInt
        val srBits = r.readBits(4).toInt
        val chan = r.readBits(4).toInt
        val ssBits = r.readBits(3).toInt
        r.readBits(1)
        if (chan != 0 || ssBits != 4) return None // mono 16-bit only
        readUtf8Number(r)
        val n = bsBits match {
          case 0x6 => r.readBits(8).toInt + 1
          case 0x7 => r.readBits(16).toInt + 1
          case 0x1 => 192
          case b if b >= 2 && b <= 5 => 576 << (b - 2)
          case b if b >= 8 => 256 << (b - 8)
          case _ => return None
        }
        if (srBits == 0xc) r.readBits(8)
        else if (srBits == 0xd || srBits == 0xe) r.readBits(16)
        else if (srBits == 0xf) return None
        if (!r.aligned) return None // header is byte-aligned here
        val headerEnd = r.bytePos
        if (crc8(bytes, frameStart, headerEnd) !=
          (bytes(headerEnd) & 0xff)) return None
        if (got + n > totalSamples) return None

        val br = new BitReader(bytes, headerEnd + 1)
        if (br.readBits(1) != 0) return None
        val typ = br.readBits(6).toInt
        if (br.readBits(1) != 0) return None // wasted bits unsupported
        val block = new Array[Int](n)
        if (typ == 0) { // CONSTANT
          val v = br.readBits(16).toShort.toInt
          java.util.Arrays.fill(block, v)
        } else if (typ == 1) { // VERBATIM
          var i = 0
          while (i < n) { block(i) = br.readBits(16).toShort.toInt; i += 1 }
        } else if (typ >= 8 && typ <= 12) { // FIXED order 0-4
          val k = typ - 8
          if (k > n) return None
          var i = 0
          while (i < k) { block(i) = br.readBits(16).toShort.toInt; i += 1 }
          val method = br.readBits(2).toInt
          if (method > 1) return None
          val pBits = if (method == 0) 4 else 5
          val escape = (1 << pBits) - 1
          val partOrder = br.readBits(4).toInt
          val nParts = 1 << partOrder
          if (partOrder > 0 && (n % nParts != 0 || n / nParts <= k))
            return None
          var idx = k
          var part = 0
          while (part < nParts) {
            val count = (if (partOrder == 0) n else n / nParts) -
              (if (part == 0) k else 0)
            val p = br.readBits(pBits).toInt
            if (p == escape) {
              val width = br.readBits(5).toInt // 0 = all-zero residuals
              var j = 0
              while (j < count) {
                var v = if (width == 0) 0L else br.readBits(width)
                if (width > 0 && (v >> (width - 1)) == 1)
                  v -= 1L << width // sign-extend
                block(idx) = fixedRestore(block, idx, k, v)
                idx += 1; j += 1
              }
            } else {
              var j = 0
              while (j < count) {
                val q = br.readUnary().toLong
                val u = (q << p) | (if (p > 0) br.readBits(p) else 0L)
                block(idx) = fixedRestore(block, idx, k, unzigzag(u))
                idx += 1; j += 1
              }
            }
            part += 1
          }
        } else return None // LPC out of the subset contract
        br.alignByte()
        val bodyEnd = br.bytePos
        if (bodyEnd + 2 > bytes.length) return None
        val declared = ((bytes(bodyEnd) & 0xff) << 8) |
          (bytes(bodyEnd + 1) & 0xff)
        if (crc16(bytes, frameStart, bodyEnd) != declared) return None
        System.arraycopy(block, 0, samples, got, n)
        got += n
        frames += 1
        off = bodyEnd + 2
      }
      // the format's own round-trip referee: MD5 over decoded samples
      val md = MessageDigest.getInstance("MD5")
      samples.foreach { s => md.update(s.toByte); md.update((s >> 8).toByte) }
      val md5Ok = java.util.Arrays.equals(md.digest(), md5)
      if (!md5Ok) return None
      Some(FlacAudio(rate, samples, frames, md5Ok))
    } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  final case class FlacRow(doc_id: Long, n_samples: Int, frames: Int,
      peak: Int, sum_abs: Long, zero_crossings: Int)

  val defs: Seq[QueryDef] = Seq(

    // ----- REAL FLAC decode: frames → residuals → samples → gates ----
    // Each doc becomes a byte-valid FLAC subset stream (block 256;
    // constant first block every 5th doc, verbatim every 7th frame,
    // fixed orders cycling otherwise) whose samples follow an
    // arithmetic ramp; the decoder undoes rice + predictors and the
    // in-format MD5 seals the round trip. The oracle replays the ramp:
    // frames = ceil(n/256) checks the frame walk, the signal stats
    // check every reconstructed sample.
    QueryDef(
      "q341_flac_decode",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text").as[(Long, String)]
          .map { case (id, _) =>
            val n = (300 + id % 500).toInt
            val const = (id % 2000).toInt - 1000
            val samples = Array.tabulate(n) { t =>
              if (id % 5 == 0 && t < 256) const
              else ((id * 37 + t.toLong * 23) % 3989).toInt - 1994
            }
            val bytes = encodeFlac(samples, 256, 8000)
            decodeFlac(bytes) match {
              case Some(a) =>
                val st = Pcm.stats(id, a.samples, clipAt = Int.MaxValue)
                FlacRow(id, st.n_samples, a.frames, st.peak, st.sum_abs,
                  st.zero_crossings)
              case None => FlacRow(id, -1, -1, -1, -1L, -1)
            }
          }.toDF().orderBy($"doc_id")
      },
      Some("""
        WITH base AS (
          SELECT doc_id, 300 + doc_id % 500 AS n,
                 doc_id % 2000 - 1000 AS cval FROM documents),
        ts AS (SELECT doc_id, n, cval,
                      unnest(generate_series(0, n - 1)) AS t FROM base),
        sm AS (SELECT doc_id, n, t,
                      CASE WHEN doc_id % 5 = 0 AND t < 256 THEN cval
                           ELSE (doc_id * 37 + t * 23) % 3989 - 1994
                      END AS s
               FROM ts),
        lagd AS (SELECT doc_id, n, s,
                        lag(s) OVER (PARTITION BY doc_id ORDER BY t) AS prev
                 FROM sm)
        SELECT doc_id,
               CAST(COUNT(*) AS INT) AS n_samples,
               CAST((MAX(n) + 255) // 256 AS INT) AS frames,
               CAST(MAX(ABS(s)) AS INT) AS peak,
               CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
               CAST(SUM(CASE WHEN prev * s < 0 THEN 1 ELSE 0 END) AS INT)
                 AS zero_crossings
        FROM lagd
        GROUP BY doc_id
        ORDER BY doc_id"""))
  )
}
