package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q109 vector→raster transfer: Sutherland-Hodgman rect clipping as a
  * dialect-abstracted expression chain. Pins (a) a hand-computed fixture
  * (cell-spanning right triangle), (b) AREA CONSERVATION — for every
  * seeded random triangle the per-cell clipped areas sum back to the
  * triangle's own shoelace area, (c) corner-touch pairs contribute zero
  * and are dropped from the rollup, (d) partition invariance.
  */
class ClipTransferSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand fixture: right triangle over four cells") {
    // (0,0)-(32,0)-(0,32), cs=16: cells (0,0)=256, (1,0)=(0,1)=128,
    // (1,1) touched only along the hypotenuse → zero, dropped
    val tri = Seq((0.0, 0.0, 32.0, 0.0, 0.0, 32.0))
      .toDF("ax", "ay", "bx", "by", "cx", "cy")
    val got = SpatialOps.clipTransfer(tri, cs = 16.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map((0L, 0L) -> ((1L, 256.0)), (1L, 0L) -> ((1L, 128.0)),
      (0L, 1L) -> ((1L, 128.0))))
  }

  test("conservation: per-cell clipped areas sum to the triangle area") {
    def u(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble
    val tris = (0 until 60).map { i =>
      def c(k: Int) = u(graft.model.Synth.mix64(i * 100L + k)) * 90.0 - 10.0
      (i.toLong, c(0), c(1), c(2), c(3), c(4), c(5))
    }
    val df = tris.toDF("tid", "ax", "ay", "bx", "by", "cx", "cy")
    val perTri = SpatialOps.clipCellAreas(df, cs = 16.0)
      .groupBy("tid").agg(sum(col("ar")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    tris.foreach { case (tid, ax, ay, bx, by, cx, cy) =>
      val area = math.abs(ax * (by - cy) + bx * (cy - ay) + cx * (ay - by)) / 2.0
      assert(math.abs(perTri(tid) - area) < 1e-5,
        s"tri $tid: ${perTri(tid)} vs $area")
    }
  }

  test("partition invariance") {
    val tri = Seq(
      (0.0, 0.0, 32.0, 0.0, 0.0, 32.0),
      (5.0, 5.0, 47.0, 9.0, 20.0, 44.0)).toDF("ax", "ay", "bx", "by", "cx", "cy")
    val a = SpatialOps.clipTransfer(tri, cs = 16.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val b = SpatialOps.clipTransfer(tri.repartition(5), cs = 16.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(a === b)
  }
}
