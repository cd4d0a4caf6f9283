package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-6: exact-integer SSIM pair verification. Pins (a) identical
  * images scoring exactly 1.0, (b) agreement with an independent
  * double-precision reference within quantization, (c) monotonicity
  * (more noise → lower SSIM; SSIM tolerates a global brightness shift
  * better than heavy noise), (d) mismatched dimensions dropped,
  * (e) partition invariance.
  */
class SsimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def img(id: String, px: Array[Int]): (String, Array[Byte], Int, Int, String) = {
    require(px.length == 16 * 16 * 3)
    (id, px.map(_.toByte), 16, 16, "raw")
  }

  private def noisy(base: Array[Int], seed: Long, amp: Int): Array[Int] =
    base.zipWithIndex.map { case (v, i) =>
      val d = (java.lang.Long.remainderUnsigned(
        graft.model.Synth.mix64(seed + i), (2L * amp + 1).toLong) - amp).toInt
      math.min(255, math.max(0, v + d))
    }

  private def basePx(seed: Long): Array[Int] =
    Array.tabulate(16 * 16 * 3) { i =>
      (java.lang.Long.remainderUnsigned(
        graft.model.Synth.mix64(seed * 131L + i), 200L) + 20L).toInt
    }

  private def run(imgs: Seq[(String, Array[Byte], Int, Int, String)],
                  pairs: Seq[(String, String)],
                  parts: Int = 4): Map[(String, String), Double] = {
    import spark.implicits._
    val idf = spark.createDataFrame(imgs)
      .toDF("image_id", "bytes", "w", "h", "fmt").repartition(parts)
    val pdf = pairs.toDF("img_a", "img_b")
    ImageOps.ssimPairs(spark, idf, pdf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
  }

  /** Double-precision SSIM reference over the same floor-div luma. */
  private def ref(a: Array[Int], b: Array[Int]): Double = {
    val la = a.grouped(3).map(c => (299L * c(0) + 587L * c(1) + 114L * c(2)) / 1000L).toArray
    val lb = b.grouped(3).map(c => (299L * c(0) + 587L * c(1) + 114L * c(2)) / 1000L).toArray
    val n = la.length.toDouble
    val ma = la.sum / n; val mb = lb.sum / n
    val va = la.map(x => (x - ma) * (x - ma)).sum / n
    val vb = lb.map(x => (x - mb) * (x - mb)).sum / n
    val cov = la.zip(lb).map { case (x, y) => (x - ma) * (y - mb) }.sum / n
    val c1 = 6.5025; val c2 = 58.5225
    ((2 * ma * mb + c1) * (2 * cov + c2)) / ((ma * ma + mb * mb + c1) * (va + vb + c2))
  }

  test("identical images score exactly 1.0") {
    val p = basePx(3)
    val got = run(Seq(img("a", p), img("b", p)), Seq(("a", "b")))
    assert(got(("a", "b")) === 1.0)
  }

  test("matches a double-precision reference within quantization") {
    for (t <- 0 until 4) {
      val a = basePx(10 + t)
      val b = noisy(a, 77 + t, amp = 25)
      val got = run(Seq(img("a", a), img("b", b)), Seq(("a", "b")))(("a", "b"))
      assert(math.abs(got - ref(a, b)) < 1e-4,
        s"trial $t: got $got want ~${ref(a, b)}")
    }
  }

  test("monotone: heavier noise scores lower; brightness shift scores higher than heavy noise") {
    val a = basePx(42)
    val mild = noisy(a, 5, amp = 8)
    val heavy = noisy(a, 6, amp = 60)
    val bright = a.map(v => math.min(255, v + 25)) // uniform +25 shift
    val got = run(Seq(img("a", a), img("m", mild), img("h", heavy),
      img("s", bright)), Seq(("a", "m"), ("a", "h"), ("a", "s")))
    assert(got(("a", "m")) > got(("a", "h")), "mild noise must beat heavy")
    assert(got(("a", "s")) > got(("a", "h")),
      "a global shift must beat heavy noise (the anti-SAD property)")
  }

  test("mismatched dimensions are dropped") {
    val a = basePx(1)
    val small = ("c", Array.fill(8 * 8 * 3)(100.toByte), 8, 8, "raw")
    val got = run(Seq(img("a", a), small), Seq(("a", "c")))
    assert(got.isEmpty)
  }

  test("partition invariance") {
    val a = basePx(9); val b = noisy(a, 8, 20); val c = noisy(a, 9, 40)
    val imgs = Seq(img("a", a), img("b", b), img("c", c))
    val prs = Seq(("a", "b"), ("a", "c"), ("b", "c"))
    assert(run(imgs, prs, parts = 1) === run(imgs, prs, parts = 7))
  }
}
