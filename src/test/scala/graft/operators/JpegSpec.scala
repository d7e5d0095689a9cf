package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class JpegSpec extends AnyFunSuite {

  private def encode(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (i <- 0 until w * h)
      img.getRaster.setSample(i % w, i / w, 0, px(i))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    bos.toByteArray
  }

  private def refDecode(blob: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(blob))
    // raw raster samples — getRGB would push linear gray through sRGB
    // color management and distort every value
    (img.getWidth, img.getHeight,
      Array.tabulate(img.getWidth * img.getHeight)(i =>
        img.getRaster.getSample(i % img.getWidth, i / img.getWidth, 0)))
  }

  private def maxDiff(a: Array[Int], b: Array[Int]): Int =
    a.zip(b).map { case (x, y) => math.abs(x - y) }.max

  test("smooth ramp: within +-1 of the ImageIO reference decode") {
    val (w, h) = (48, 32)
    val px = Array.tabulate(w * h)(i => ((i % w) * 5 + (i / w) * 3) % 256)
    val blob = encode(w, h, px)
    val Some((dw, dh, ours)) = Jpeg.decodeJpegGray(blob)
    val (rw, rh, ref) = refDecode(blob)
    assert(dw == rw && dh == rh && dw == w)
    assert(maxDiff(ours, ref) <= 1, s"diff ${maxDiff(ours, ref)}")
  }

  test("noise: the hard entropy stream still matches the reference") {
    var s = 12345L
    val (w, h) = (64, 64)
    val px = Array.fill(w * h) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % 256).toInt
    }
    val blob = encode(w, h, px)
    val Some((_, _, ours)) = Jpeg.decodeJpegGray(blob)
    val (_, _, ref) = refDecode(blob)
    assert(maxDiff(ours, ref) <= 1, s"diff ${maxDiff(ours, ref)}")
  }

  test("non-multiple-of-8 dims: edge blocks crop correctly") {
    val (w, h) = (21, 13)
    val px = Array.tabulate(w * h)(i => (i * 11) % 256)
    val blob = encode(w, h, px)
    val Some((dw, dh, ours)) = Jpeg.decodeJpegGray(blob)
    val (_, _, ref) = refDecode(blob)
    assert(dw == 21 && dh == 13)
    assert(maxDiff(ours, ref) <= 1)
  }

  test("corrupt / unsupported streams yield None") {
    assert(Jpeg.decodeJpegGray(Array.empty[Byte]).isEmpty)
    assert(Jpeg.decodeJpegGray("not a jpeg".getBytes).isEmpty)
    val blob = encode(16, 16, Array.tabulate(256)(identity))
    assert(Jpeg.decodeJpegGray(blob.take(blob.length / 2)).isEmpty)
    assert(Jpeg.decodeJpeg(blob.take(blob.length / 2)).isEmpty)
    // a color JPEG (3 components) is out of the GRAY surface's contract
    val color = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(color, "jpg", bos)
    assert(Jpeg.decodeJpegGray(bos.toByteArray).isEmpty)
    // ...but decodes through the general surface
    assert(Jpeg.decodeJpeg(bos.toByteArray).exists(_.nComp == 3))
  }

  test("sequential scan cut short of its MCU count is None, not a mis-decode") {
    // Chop entropy bytes out of the scan and close with a clean EOI:
    // the zero-fill after the (now early) marker can form valid Huffman
    // codes, so without the mid-scan marker check this would decode to
    // Some(wrong pixels). The contract is corrupt -> None.
    val blob = encode(64, 64, Array.tabulate(64 * 64)(i => (i * 7) % 256))
    var truncated = 0
    for (cut <- Seq(4, 16, 64, 256)) {
      val t = blob.dropRight(cut + 2) ++ Array(0xff.toByte, 0xd9.toByte)
      if (Jpeg.decodeJpegGray(t).nonEmpty) truncated += 1
    }
    assert(truncated == 0, s"$truncated truncated streams mis-decoded")
  }

  // ---- color + progressive (round 13) --------------------------------

  private def worstChannelDiff(blob: Array[Byte]): Int = {
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(blob))
    val Some(img) = Jpeg.decodeJpeg(blob)
    assert(img.width == ref.getWidth && img.height == ref.getHeight)
    val raster = ref.getRaster
    var worst = 0
    for (y <- 0 until img.height; x <- 0 until img.width) {
      val p = img.pixels(y * img.width + x)
      if (img.nComp == 1)
        worst = math.max(worst, math.abs(p - raster.getSample(x, y, 0)))
      else for (c <- 0 until 3)
        worst = math.max(worst,
          math.abs(((p >> (16 - 8 * c)) & 0xff) - raster.getSample(x, y, c)))
    }
    worst
  }

  for ((lh, lv, mode) <- Seq((1, 1, "4:4:4"), (2, 1, "4:2:2"), (2, 2, "4:2:0"));
      prog <- Seq(false, true)) {
    val label = if (prog) "progressive" else "sequential"
    test(s"color $mode $label: within +-3 of ImageIO across 40 fixtures") {
      for (id <- 0L until 40L) {
        val blob = Jpeg.encodeImageIO(Jpeg.colorFixture(id), lh, lv, prog)
        val d = worstChannelDiff(blob)
        assert(d <= 3, s"id=$id diff=$d")
      }
    }
  }

  test("progressive gray decodes within +-1 (DC/AC refine on one component)") {
    import javax.imageio._
    val px = Array.tabulate(48 * 32)(i => (i * 7 + (i / 48) * 3) % 256)
    val img = new java.awt.image.BufferedImage(48, 32,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (i <- 0 until 48 * 32) img.getRaster.setSample(i % 48, i / 48, 0, px(i))
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val blob = bos.toByteArray
    // really progressive: SOF2 marker present
    assert(blob.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2))
    assert(worstChannelDiff(blob) <= 1)
    assert(Jpeg.decodeJpegGray(blob).nonEmpty)
  }

  test("restart markers: DRI-interval stream decodes (DC preds reset)") {
    // JDK's writer does not emit DRI; splice one in by re-encoding with
    // restarts via the raw API is unavailable — instead verify against
    // a stream with restarts synthesized by transcoding: encode, then
    // decode+re-encode through ImageIO with JPEGImageWriteParam? Not
    // steerable either. So pin the contract the other way: a stream
    // whose DRI segment declares an interval but whose scan carries no
    // RSTn markers must fail cleanly (None), not mis-decode.
    val blob = encode(32, 32, Array.tabulate(1024)(i => (i * 13) % 256))
    // splice a DRI (FFDD 0004 interval=2) right before SOS
    val sos = {
      var i = 2
      var at = -1
      while (at < 0 && i + 4 < blob.length) {
        if ((blob(i) & 0xff) == 0xff && (blob(i + 1) & 0xff) == 0xda) at = i
        else i += 1
      }
      at
    }
    assert(sos > 0)
    val dri = Array[Byte](0xff.toByte, 0xdd.toByte, 0, 4, 0, 2)
    val spliced = blob.take(sos) ++ dri ++ blob.drop(sos)
    assert(Jpeg.decodeJpeg(spliced).isEmpty)
  }

  test("mode gates: 12-bit precision and 4-component streams are None") {
    // forge a SOF0 with precision 12: flip the precision byte
    val blob = encode(16, 16, Array.tabulate(256)(identity))
    var i = 2
    var sof = -1
    while (sof < 0 && i + 4 < blob.length) {
      if ((blob(i) & 0xff) == 0xff && (blob(i + 1) & 0xff) == 0xc0) sof = i
      else i += 1
    }
    assert(sof > 0)
    val forged = blob.clone()
    forged(sof + 4) = 12
    assert(Jpeg.decodeJpeg(forged).isEmpty)
  }

  test("4:4:0 (v-only subsampling): transposed fancy filter within +-3") {
    for (prog <- Seq(false, true); id <- 0L until 30L) {
      val blob = Jpeg.encodeImageIO(Jpeg.colorFixture(id), 1, 2, prog)
      val d = worstChannelDiff(blob)
      assert(d <= 3, s"id=$id prog=$prog diff=$d")
    }
  }
}
