package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Geohash encode (q117). Pins (a) the published test vector
  * (42.605°N 5.603°W → "ezs42"), (b) equality with an independent classic
  * bisection implementation over seeded random coordinates (including the
  * closed upper edges lon = 180 / lat = 90), (c) the prefix-locality
  * property — points sharing a 5-char prefix sit inside one
  * 0.044°×0.044° cell.
  */
class GeohashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Classic per-bit bisection geohash (independent of the bit-math op). */
  private def classic(lon: Double, lat: Double, chars: Int): String = {
    var (loL, hiL, loB, hiB) = (-180.0, 180.0, -90.0, 90.0)
    val sb = new StringBuilder
    var even = true; var bits = 0; var v = 0
    while (sb.length < chars) {
      if (even) {
        val mid = (loL + hiL) / 2
        if (lon >= mid) { v = v * 2 + 1; loL = mid } else { v = v * 2; hiL = mid }
      } else {
        val mid = (loB + hiB) / 2
        if (lat >= mid) { v = v * 2 + 1; loB = mid } else { v = v * 2; hiB = mid }
      }
      even = !even; bits += 1
      if (bits == 5) { sb += B32(v); v = 0; bits = 0 }
    }
    sb.toString
  }

  private def encode(pts: Seq[(Double, Double)], chars: Int): Seq[String] =
    pts.toDF("lon", "lat")
      .select(SpatialOps.geohashEncode(col("lon"), col("lat"), chars))
      .collect().map(_.getString(0)).toSeq

  test("published vector: ezs42") {
    assert(encode(Seq((-5.60302734375, 42.60498046875)), 5) === Seq("ezs42"))
  }

  test("matches classic bisection on seeded points incl. closed edges") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextDouble() * 360 - 180,
      rnd.nextDouble() * 180 - 90)) ++
      Seq((180.0, 90.0), (-180.0, -90.0), (0.0, 0.0), (179.9999999, 89.9999999))
    val got = encode(pts, 8)
    // the closed upper edge clamps into the LAST cell — classic bisection
    // never reaches it because lon < 180 strictly in its recursion; feed
    // the classic encoder a nudged-inside point for exactly that edge
    val expect = pts.map { case (lon, lat) =>
      classic(math.min(lon, 179.9999999999), math.min(lat, 89.99999999995), 8)
    }
    assert(got === expect)
  }

  test("shared 5-char prefix bounds both axes (locality property)") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(2000)((rnd.nextDouble() * 0.36 + 100.0 / 1000.0,
      rnd.nextDouble() * 0.36 + 0.1))
    val rows = pts.toDF("lon", "lat")
      .select(substring(SpatialOps.geohashEncode(
        col("lon"), col("lat"), 8), 1, 5).as("gh5"), col("lon"), col("lat"))
      .groupBy("gh5").agg(max("lon") - min("lon"), max("lat") - min("lat"))
      .collect()
    // 25 bits = 13 lon + 12 lat → cell ≤ 360/2^13 ≈ 0.0439° × 180/2^12 ≈ 0.0439°
    rows.foreach { r =>
      assert(r.getDouble(1) <= 360.0 / (1 << 13), r.toString)
      assert(r.getDouble(2) <= 180.0 / (1 << 12), r.toString)
    }
  }
}
