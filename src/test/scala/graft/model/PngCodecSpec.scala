package graft.model

import org.scalatest.funsuite.AnyFunSuite

class PngCodecSpec extends AnyFunSuite {
  test("encode/decode round-trip is lossless for seeded pixels") {
    val rnd = new scala.util.Random(5)
    (0 until 20).foreach { _ =>
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val px = ImageCodec.seededPixels(w, h, rnd.nextLong())
      val enc = PngCodec.encode(px, w, h)
      val (dec, dw, dh) = PngCodec.decode(enc)
      assert((dw, dh) === (w, h))
      assert(dec.toSeq === px.toSeq)
      assert(ImageCodec.psnr(px, dec) === Double.PositiveInfinity)
    }
  }

  test("output is valid PNG per an independent decoder (javax.imageio)") {
    val px = ImageCodec.seededPixels(16, 16, 42L)
    val enc = PngCodec.encode(px, 16, 16)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(img.getWidth === 16 && img.getHeight === 16)
    // spot-check pixel (3, 5)
    val i = (5 * 16 + 3) * 3
    val rgb = img.getRGB(3, 5)
    assert(((rgb >> 16) & 0xFF) === (px(i) & 0xFF))
    assert(((rgb >> 8) & 0xFF) === (px(i + 1) & 0xFF))
    assert((rgb & 0xFF) === (px(i + 2) & 0xFF))
  }

  test("deterministic: same pixels → same bytes") {
    val px = ImageCodec.seededPixels(16, 16, 7L)
    assert(PngCodec.encode(px, 16, 16).toSeq === PngCodec.encode(px, 16, 16).toSeq)
  }
}
