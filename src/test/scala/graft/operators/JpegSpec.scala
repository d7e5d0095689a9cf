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
    // a color JPEG (3 components) is out of contract
    val color = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(color, "jpg", bos)
    assert(Jpeg.decodeJpegGray(bos.toByteArray).isEmpty)
  }
}
