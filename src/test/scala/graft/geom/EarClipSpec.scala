package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class EarClipSpec extends AnyFunSuite {

  private def closed(pts: Vec3*): IndexedSeq[Vec3] = pts.toIndexedSeq :+ pts.head

  private def areaSum(tris: Array[EarClip.Tri]): Double =
    tris.map(t => (t.b - t.a).cross(t.c - t.a).norm / 2.0).sum

  test("square → 2 triangles, area preserved (FIXTURES.md golden)") {
    val tris = EarClip.triangulate(
      closed(Vec3(0, 0, 0), Vec3(1, 0, 0), Vec3(1, 1, 0), Vec3(0, 1, 0)), Nil)
    assert(tris.length === 2)
    assert(math.abs(areaSum(tris) - 1.0) < 1e-9)
  }

  test("L-shape (6 verts) → 4 triangles") {
    val l = closed(Vec3(0, 0, 0), Vec3(2, 0, 0), Vec3(2, 1, 0),
      Vec3(1, 1, 0), Vec3(1, 2, 0), Vec3(0, 2, 0))
    val tris = EarClip.triangulate(l, Nil)
    assert(tris.length === 4)
    assert(math.abs(areaSum(tris) - 3.0) < 1e-9)
  }

  test("square with square hole → 8 triangles (T = n_total − 2 + 2h)") {
    val outer = closed(Vec3(0, 0, 0), Vec3(4, 0, 0), Vec3(4, 4, 0), Vec3(0, 4, 0))
    val hole = closed(Vec3(1, 1, 0), Vec3(3, 1, 0), Vec3(3, 3, 0), Vec3(1, 3, 0))
    val tris = EarClip.triangulate(outer, Seq(hole))
    assert(tris.length === 8)
    assert(math.abs(areaSum(tris) - 12.0) < 1e-9)
  }

  test("vertical wall (XZ projection branch)") {
    val wall = closed(Vec3(0, 5, 0), Vec3(4, 5, 0), Vec3(4, 5, 3), Vec3(0, 5, 3))
    val tris = EarClip.triangulate(wall, Nil)
    assert(tris.length === 2)
    assert(math.abs(areaSum(tris) - 12.0) < 1e-9)
  }

  test("YZ-parallel wall (all-x-equal branch) incl. gable pentagon") {
    val pent = closed(Vec3(7, 0, 0), Vec3(7, 4, 0), Vec3(7, 4, 3), Vec3(7, 2, 5), Vec3(7, 0, 3))
    val tris = EarClip.triangulate(pent, Nil)
    assert(tris.length === 3)
    assert(math.abs(areaSum(tris) - (12.0 + 4.0)) < 1e-9)
  }

  test("every output triangle's normal matches the Newell polygon normal (tol 0.1)") {
    val l = closed(Vec3(0, 0, 1), Vec3(2, 0, 1), Vec3(2, 1, 1), Vec3(1, 1, 1), Vec3(1, 2, 1), Vec3(0, 2, 1))
    val poly = Geom.newellNormal(l)
    EarClip.triangulate(l, Nil).foreach { t =>
      val n = Geom.unitNormal(t.a, t.b, t.c).get
      assert(Geom.compareNormals(n, poly), s"tri normal $n vs poly $poly")
    }
    // and for a downward-facing (CW seen from above) ground ring
    val ground = closed(Vec3(0, 0, 0), Vec3(0, 2, 0), Vec3(2, 2, 0), Vec3(2, 0, 0))
    val gNorm = Geom.newellNormal(ground)
    assert(gNorm.z < 0)
    EarClip.triangulate(ground, Nil).foreach { t =>
      assert(Geom.compareNormals(Geom.unitNormal(t.a, t.b, t.c).get, gNorm))
    }
  }

  test("degenerate input → empty, never throws (reference swallow contract)") {
    assert(EarClip.triangulate(IndexedSeq(Vec3(0, 0, 0), Vec3(1, 1, 1)), Nil).isEmpty)
    assert(EarClip.triangulate(IndexedSeq(Vec3(0, 0, 0), Vec3(1, 1, 1), Vec3(2, 2, 2), Vec3(0, 0, 0)), Nil).isEmpty)
    assert(EarClip.triangulate(IndexedSeq.empty, Nil).isEmpty)
  }

  test("deterministic: same input → identical diagonals") {
    val l = closed(Vec3(0, 0, 0), Vec3(2, 0, 0), Vec3(2, 1, 0), Vec3(1, 1, 0), Vec3(1, 2, 0), Vec3(0, 2, 0))
    val a = EarClip.triangulate(l, Nil).toSeq
    val b = EarClip.triangulate(l, Nil).toSeq
    assert(a === b)
  }

  test("property: random convex polygons — count n−2, area preserved, orientation") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val n = 3 + rnd.nextInt(22)
      val r = 1.0 + rnd.nextDouble() * 99.0
      val phase = rnd.nextDouble() * math.Pi * 2
      val ringOpen = (0 until n).map { i =>
        val a = phase + i * 2 * math.Pi / n
        Vec3(math.rint(r * math.cos(a) * 64) / 64, math.rint(r * math.sin(a) * 64) / 64, 5.0)
      }.toIndexedSeq
      val distinct = ringOpen.distinct
      if (distinct.length >= 3 && Geom.area2D(distinct :+ distinct.head) > 1e-6) {
        val ring = distinct :+ distinct.head
        val tris = EarClip.triangulate(ring, Nil)
        assert(tris.length === distinct.length - 2, s"n=$n r=$r")
        val area = Geom.area3D(ring)
        assert(math.abs(areaSum(tris) - area) < 1e-6 * math.max(1.0, area))
        val poly = Geom.newellNormal(ring)
        tris.foreach { t =>
          val nn = Geom.unitNormal(t.a, t.b, t.c).get
          assert(Geom.compareNormals(nn, poly))
        }
      }
    }
  }
}
