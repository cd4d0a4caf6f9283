package graft.ops

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{PngCodec, Synth}

/** TWAP (q145) + luma entropy (q146). Pins (a) a hand hold chain with
  * exact decimal numerator/denominator, (b) single-event users emit no
  * row, (c) flat-image entropy 0 and two-level entropy = rounded ln 2
  * split, (d) partition invariance for both.
  */
class TwapEntropySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T0 = LocalDateTime.of(2024, 3, 1, 0, 0, 0)

  test("hand hold chain: exact numerator and held time") {
    val df = Seq(
      (1L, T0, 1L, "a", 2.5, "{}"),
      (2L, T0.plusSeconds(10), 1L, "a", 4.0, "{}"),
      (3L, T0.plusSeconds(25), 1L, "a", 1.0, "{}"), // value 1.0 never held
      (4L, T0, 2L, "a", 9.0, "{}"))                 // single event: no row
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Sessionize.timeWeightedValue(df).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
    // 2.5 * 10s + 4.0 * 15s = 85 value-seconds = 85e6 value-micros
    assert(got === Map(1L -> (("85000000.000000", 25000000L, 2L))))
  }

  test("entropy: flat image is 0; two equal levels split ln 2") {
    def img(id: String, vals: Seq[Int]) = {
      val px = new Array[Byte](768)
      vals.zipWithIndex.foreach { case (v, i) =>
        px(3 * i) = v.toByte; px(3 * i + 1) = v.toByte; px(3 * i + 2) = v.toByte
      }
      (id, PngCodec.encode(px, 16, 16), 16, 16, "png")
    }
    val df = Seq(img("flat", Seq.fill(256)(77)),
      img("two", Seq.fill(128)(0) ++ Seq.fill(128)(200)))
      .toDF("image_id", "bytes", "w", "h", "fmt")
    val got = ImageOps.lumaEntropy(spark, df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("flat") === 0L)
    // two equal bins: each term = 0.5 * ln 2 * 1e9 rounded, summed
    val term = math.round(128L * math.log(256.0 / 128L) / 256.0 * 1e9)
    assert(got("two") === 2 * term)
  }

  test("partition invariance") {
    val rnd = new scala.util.Random(73)
    val ev = (0 until 1000).map(i =>
      (i.toLong, T0.plusSeconds(rnd.nextInt(100000)),
        rnd.nextInt(30).toLong, "a", rnd.nextInt(1000) / 8.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def t(p: Int) = Sessionize.timeWeightedValue(ev.repartition(p))
      .orderBy("user_id").collect().toSeq
    assert(t(3) === t(17) && t(3).nonEmpty)
    val imgs = Synth.withAnchors(Synth.images(spark, 200L, 16L).toDF(), 16L)
    def e(p: Int) = ImageOps.lumaEntropy(spark, imgs.repartition(p))
      .orderBy("image_id").collect().toSeq
    assert(e(3) === e(11) && e(3).size === 200)
  }
}
