package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.ImageCodec

/** Round-6: Hough line detection (q170). Pins (a) a horizontal line's
  * transition rows voting θ=90° with full-width counts, (b) a vertical
  * line voting θ=0°, (c) the interior-only contract (a line ON the tile
  * ring casts no votes), (d) the exactness of the power-of-two ρ floor
  * (votes identical across partitionings), (e) flat tiles → no edges.
  */
class HoughSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 2×1 tile strip (32×16 world) with bright pixels where f(wx,wy). */
  private def strip(f: (Int, Int) => Boolean, parts: Int = 2) = {
    (0 until 2).map { tx =>
      val px = new Array[Byte](16 * 16 * 3)
      for (j <- 0 until 256) {
        val wx = tx * 16 + j % 16; val wy = j / 16
        val v = if (f(wx, wy)) 230.toByte else 20.toByte
        px(3 * j) = v; px(3 * j + 1) = v; px(3 * j + 2) = v
      }
      (f"h$tx%02d", ImageCodec.encodeRaw(px), 16, 16, "raw", tx, 0)
    }.toDF("image_id", "bytes", "w", "h", "fmt", "tile_x", "tile_y")
      .repartition(parts)
  }

  private def top(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))

  test("horizontal line: transition rows vote theta=90 at full width") {
    val rows = top(ImageOps.houghLines(spark,
      strip((_, wy) => wy == 8), gradThr = 60, nTheta = 12, k = 4))
    // θ index 6 = 90°: cos→0, sin→1024 ⇒ ρ = wy exactly. Sobel fires on
    // the transition rows 7 and 9 (the line row itself is symmetric);
    // each fires across both tiles' interiors = 28 pixels
    assert(rows.take(2).map(t => (t._1, t._2)).toSet === Set((6, 7L), (6, 9L)))
    assert(rows.take(2).forall(_._3 === 28L))
  }

  test("vertical line votes theta=0 on the transition columns") {
    val rows = top(ImageOps.houghLines(spark,
      strip((wx, _) => wx == 8), gradThr = 60, nTheta = 12, k = 2))
    // θ index 0: cos=1024, sin=0 ⇒ ρ = wx; columns 7 and 9, 14 interior
    // rows each (single tile hosts the line)
    assert(rows.map(t => (t._1, t._2)).toSet === Set((0, 7L), (0, 9L)))
    assert(rows.forall(_._3 === 14L))
  }

  test("a line ON the tile ring casts no votes (interior-only contract)") {
    val rows = top(ImageOps.houghLines(spark,
      strip((_, wy) => wy == 0), gradThr = 60, nTheta = 12, k = 4))
    // Sobel needs y-1: the wy=0 line's only transition row inside the
    // interior is wy=1 — the dominant bucket is θ=90° at ρ=1, 28 wide
    assert(rows.head === ((6, 1L, 28L)))
  }

  test("flat input has no edges; partition invariance of the top-k") {
    assert(ImageOps.houghLines(spark, strip((_, _) => false),
      60, 12, 5).count() === 0L)
    val a = top(ImageOps.houghLines(spark,
      strip((wx, wy) => wx == wy, parts = 1), 60, 12, 10)).toSeq
    val b = top(ImageOps.houghLines(spark,
      strip((wx, wy) => wx == wy, parts = 7), 60, 12, 10)).toSeq
    assert(a === b && a.nonEmpty)
  }
}
