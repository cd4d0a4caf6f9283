package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-1 verdict "What's wrong #3": the tiling histogram collected one
  * row per distinct cell — unbounded on a wide domain (2^28 possible cells
  * at level 14). The bounded version must coarsen to a parent level until
  * the collect fits maxCells, without touching per-row cell assignments.
  */
class TilingBoundSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("uniform wide-domain anchors coarsen the histogram below the cap") {
    // ~2000 distinct 64 m cells spread over a 300 km domain — the unbounded
    // histogram would collect them all; cap at 64
    val wide = spark.range(0, 2048).select(
      format_string("img%06d", col("id")).as("image_id"),
      pmod(col("id") * 137999L, lit(300000L)).cast("double").as("anchor_x"),
      pmod(col("id") * 77261L, lit(300000L)).cast("double").as("anchor_y"))
    val cells = SpatialOps.imageCells(wide)
    val full = cells.select(col("cell_id")).distinct().count()
    assert(full > 1000, s"fixture must exceed the cap by far, got $full")
    val (bounds, delta) = ImageOps.cellRangeBoundaries(cells, buckets = 8, maxCells = 64)
    assert(delta > 0, "must coarsen on a wide domain")
    val parents = cells
      .select(ImageOps.parentCell(col("cell_id"), SpatialOps.JoinLevel, delta))
      .distinct().count()
    assert(parents <= 64, s"histogram collect still unbounded: $parents parents")
    assert(bounds.length < 8 && bounds.sorted.toSeq === bounds.toSeq)
  }

  test("dense city keeps the exact level (delta = 0, boundaries unchanged)") {
    val imgs = graft.model.Synth.withAnchors(
      graft.model.Synth.images(spark, 512L, 16L).toDF, 16L)
    val cells = SpatialOps.imageCells(imgs)
    val (_, delta) = ImageOps.cellRangeBoundaries(cells, buckets = 8)
    assert(delta === 0)
  }

  test("parentCell matches Cells.parent bit-for-bit") {
    import spark.implicits._
    val ids = Seq(100.5 -> 200.25, 65535.0 -> 2.0, 12345.6 -> 54321.9)
    val df = ids.toDF("x", "y")
      .select(graft.expr.GeomFunctions.cell_encode(col("x"), col("y"), lit(14)).as("c"))
      .select(col("c"), ImageOps.parentCell(col("c"), 14, 3).as("p"))
    df.collect().foreach { r =>
      assert(r.getLong(1) === graft.geom.Cells.parent(r.getLong(0), 11))
    }
  }
}
