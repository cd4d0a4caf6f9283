package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Spatial hot-spot screen (q107). Pins the grid bucketing, the 3×3
  * window sum (edge cells see only existing neighbors), the exact
  * integer cross-multiplied flag, and partition invariance.
  */
class HotSpotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("window sums and hot flag match a hand-computed fixture") {
    // grid cw=1: 20 points in cell (0,0), 1 in (1,0), 1 in (5,5)
    // n_points=22, n_cells=3, mean density 22/3
    val pts = (Seq.fill(20)((0.5, 0.2)) ++ Seq((1.5, 0.9), (5.5, 5.5)))
      .toDF("anchor_x", "anchor_y")
    val got = HotSpots.collectMap(
      SpatialOps.hotSpots(pts, cw = 1.0, k = 4L))
    // windows: (0,0) sees itself+its neighbor (1,0) → 21; (1,0) sees 21;
    // (5,5) sees only itself → 1
    assert(got((0L, 0L)) === ((20L, 21L, 21L * 3 > 36 * 22)))
    assert(got((1L, 0L)) === ((1L, 21L, 21L * 3 > 36 * 22)))
    assert(got((5L, 5L)) === ((1L, 1L, false)))
    // sanity: the dense cell does NOT flag here (21·3 = 63 < 792), so
    // build one that must: 100 points in one cell, 10 singleton cells
    val pts2 = (Seq.tabulate(100)(i => (0.5, 0.5)) ++
      Seq.tabulate(10)(i => (10.0 * (i + 1) + 0.5, 0.5)))
      .toDF("anchor_x", "anchor_y")
    val got2 = HotSpots.collectMap(
      SpatialOps.hotSpots(pts2, cw = 1.0, k = 4L))
    // n_points=110, n_cells=11: hot iff n_window·11 > 36·110=3960
    assert(got2((0L, 0L)) === ((100L, 100L, false)))
    // k=1: 100·11 = 1100 > 9·110 = 990 → flags
    val got3 = HotSpots.collectMap(
      SpatialOps.hotSpots(pts2, cw = 1.0, k = 1L))
    assert(got3((0L, 0L))._3 === true)
    assert(got3((10L, 0L))._3 === false)
  }

  test("partition invariance") {
    val pts = Seq.tabulate(200)(i =>
      (graft.model.Synth.mix64(i.toLong).toDouble.abs % 50.0,
        graft.model.Synth.mix64(1000L + i).toDouble.abs % 50.0))
      .toDF("anchor_x", "anchor_y")
    val a = HotSpots.collectMap(SpatialOps.hotSpots(pts, cw = 8.0))
    val b = HotSpots.collectMap(
      SpatialOps.hotSpots(pts.repartition(7), cw = 8.0))
    assert(a === b)
  }
}

private object HotSpots {
  def collectMap(df: org.apache.spark.sql.DataFrame)
      : Map[(Long, Long), (Long, Long, Boolean)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
}
