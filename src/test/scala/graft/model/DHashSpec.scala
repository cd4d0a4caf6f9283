package graft.model

import org.scalatest.funsuite.AnyFunSuite

class DHashSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int, ltr: Boolean): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (if (ltr) x else w - 1 - x) * (255 / (w - 1))
      val o = (y * w + x) * 3
      px(o) = v.toByte; px(o + 1) = v.toByte; px(o + 2) = v.toByte
    }
    px
  }

  test("left-to-right gradient → all gradient bits set; flipped → none") {
    val up = ImageCodec.dhashBits(gradient(18, 16, ltr = true), 18, 16)
    assert(up.length === 64 && up.forall(_ == '1'))
    val dn = ImageCodec.dhashBits(gradient(18, 16, ltr = false), 18, 16)
    assert(dn.forall(_ == '0'))
  }

  test("deterministic and format-insensitive (decode path irrelevant)") {
    val px = ImageCodec.seededPixels(16, 16, 99L)
    val a = ImageCodec.dhashBits(px, 16, 16)
    assert(a === ImageCodec.dhashBits(px.clone(), 16, 16))
    assert(a.length === 64 && a.forall(c => c == '0' || c == '1'))
    // round-trip through the PNG codec must not change the hash (lossless)
    val enc = PngCodec.encode(px, 16, 16)
    val (dec, _, _) = PngCodec.decode(enc)
    assert(ImageCodec.dhashBits(dec, 16, 16) === a)
  }

  test("near-duplicate robustness: single-pixel flip moves few bits") {
    val px = ImageCodec.seededPixels(32, 32, 7L)
    val tweaked = px.clone()
    tweaked(5 * 32 * 3 + 9) = (tweaked(5 * 32 * 3 + 9) ^ 0x7F).toByte
    val a = ImageCodec.dhashBits(px, 32, 32)
    val b = ImageCodec.dhashBits(tweaked, 32, 32)
    val hamming = a.zip(b).count { case (x, y) => x != y }
    assert(hamming <= 4, s"one-pixel tweak flipped $hamming/64 bits")
  }

  test("dhashPack: MSB-first packing") {
    assert(ImageCodec.dhashPack("0" * 64) === 0L)
    assert(ImageCodec.dhashPack("1" + "0" * 63) === Long.MinValue)
    assert(ImageCodec.dhashPack("0" * 63 + "1") === 1L)
    assert(ImageCodec.dhashPack("0" * 56 + "10101010") === 0xAAL)
  }

  test("dhashNearDups finds every planted perturbed duplicate") {
    val spark = graft.TestSpark.spark
    val imgs = Synth.images(spark, 256, 16).toDF
    val dups = graft.ops.ImageOps.perturbedDups(spark, imgs)
    val nDups = dups.count()
    assert(nDups > 0)
    val all = imgs.select("image_id", "bytes", "w", "h", "fmt").unionByName(dups)
    val pairs = graft.ops.ImageOps.dhashNearDups(spark, all, maxHamming = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // every planted (id, id~dup) pair must surface with a tiny distance
    val planted = dups.select("image_id").collect()
      .map(_.getString(0)).map(d => (d.stripSuffix("~dup"), d)).toSet
    val found = pairs.map(p => (p._1, p._2)).toSet
    planted.foreach { pl => assert(found.contains(pl), s"missing planted pair $pl") }
    pairs.foreach { case (_, _, hm) => assert(hm >= 0 && hm <= 3) }
    // random 64-bit hashes collide at hamming ≤ 3 with p ≈ 2e-15 — any
    // non-planted pair here would be a determinism bug, not bad luck
    assert(pairs.length === planted.size)
  }
}
