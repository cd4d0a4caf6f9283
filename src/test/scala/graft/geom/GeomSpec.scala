package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class GeomSpec extends AnyFunSuite {
  private val sq = IndexedSeq(
    Vec3(0, 0, 0), Vec3(1, 0, 0), Vec3(1, 1, 0), Vec3(0, 1, 0), Vec3(0, 0, 0))

  test("det3 Laplace expansion") {
    assert(Geom.det3(Array(1, 2, 3), Array(4, 5, 6), Array(7, 8, 10)) === -3.0)
    assert(Geom.det3(Array(1, 0, 0), Array(0, 1, 0), Array(0, 0, 1)) === 1.0)
  }

  test("unitNormal of CCW square is +z; collinear is None") {
    val n = Geom.unitNormal(sq(0), sq(1), sq(2)).get
    assert(math.abs(n.x) < 1e-12 && math.abs(n.y) < 1e-12 && math.abs(n.z - 1.0) < 1e-12)
    assert(Geom.unitNormal(Vec3(0, 0, 0), Vec3(1, 1, 1), Vec3(2, 2, 2)).isEmpty)
  }

  test("newellNormal matches unitNormal on planar rings incl. vertical") {
    val n = Geom.newellNormal(sq)
    assert(math.abs(n.z - 1.0) < 1e-12)
    val wall = IndexedSeq(Vec3(0, 0, 0), Vec3(2, 0, 0), Vec3(2, 0, 3), Vec3(0, 0, 3), Vec3(0, 0, 0))
    val nw = Geom.newellNormal(wall)
    assert(math.abs(math.abs(nw.y) - 1.0) < 1e-12 && math.abs(nw.z) < 1e-12)
  }

  test("area3D: unit square = 1; scaled/tilted goldens to 1e-9") {
    assert(math.abs(Geom.area3D(sq) - 1.0) < 1e-9)
    val tilted = IndexedSeq( // 2×2 square tilted 45° about x: area stays 4/cos? no — exact 2×(2√2)/... golden:
      Vec3(0, 0, 0), Vec3(2, 0, 0), Vec3(2, 2, 2), Vec3(0, 2, 2), Vec3(0, 0, 0))
    assert(math.abs(Geom.area3D(tilted) - 2.0 * 2.0 * math.sqrt(2.0)) < 1e-9)
  }

  test("area2D drops z before shoelace") {
    val tilted = IndexedSeq(
      Vec3(0, 0, 0), Vec3(2, 0, 5), Vec3(2, 2, 9), Vec3(0, 2, 1), Vec3(0, 0, 0))
    assert(math.abs(Geom.area2D(tilted) - 4.0) < 1e-9)
  }

  test("areaGML: exterior minus holes, invalid rings contribute 0") {
    val hole = IndexedSeq(
      Vec3(0.25, 0.25, 0), Vec3(0.75, 0.25, 0), Vec3(0.75, 0.75, 0), Vec3(0.25, 0.75, 0), Vec3(0.25, 0.25, 0))
    assert(math.abs(Geom.areaGML(sq, Seq(hole)) - 0.75) < 1e-9)
    val open = hole.dropRight(1) // invalid: not closed
    assert(math.abs(Geom.areaGML(sq, Seq(open)) - 1.0) < 1e-9)
  }

  test("angles: flat roof tilt 0, wall tilt 90, rounded 3dp") {
    val (_, tiltFlat) = Geom.angles(sq)
    assert(tiltFlat === 0.0)
    val wall = IndexedSeq(Vec3(0, 0, 0), Vec3(2, 0, 0), Vec3(2, 0, 3), Vec3(0, 0, 3), Vec3(0, 0, 0))
    val (az, tiltWall) = Geom.angles(wall)
    assert(tiltWall === 90.0)
    assert(az === (90.0 - math.toDegrees(math.atan2(-1.0, 0.0)) + 360.0) % 360.0)
  }

  test("angles: 45-degree roof slab") {
    val roof = IndexedSeq(Vec3(0, 0, 0), Vec3(2, 0, 0), Vec3(2, 1, 1), Vec3(0, 1, 1), Vec3(0, 0, 0))
    val (_, tilt) = Geom.angles(roof)
    assert(tilt === 45.0)
  }

  test("compareNormals tolerance 0.1 per component") {
    assert(Geom.compareNormals(Vec3(0, 0, 1), Vec3(0.09, -0.09, 0.95)))
    assert(!Geom.compareNormals(Vec3(0, 0, 1), Vec3(0.11, 0, 1)))
  }

  test("cleanRing: order-preserving dedup keeping the closure point") {
    val ring = IndexedSeq(Vec3(0, 0, 0), Vec3(1, 0, 0), Vec3(1, 0, 0), Vec3(1, 1, 0), Vec3(0, 0, 0))
    assert(Geom.cleanRing(ring) ===
      IndexedSeq(Vec3(0, 0, 0), Vec3(1, 0, 0), Vec3(1, 1, 0), Vec3(0, 0, 0)))
    // interior repeat of the first point is dropped; closure stays
    val ring2 = IndexedSeq(Vec3(0, 0, 0), Vec3(1, 0, 0), Vec3(0, 0, 0), Vec3(1, 1, 0), Vec3(0, 0, 0))
    assert(Geom.cleanRing(ring2) ===
      IndexedSeq(Vec3(0, 0, 0), Vec3(1, 0, 0), Vec3(1, 1, 0), Vec3(0, 0, 0)))
  }

  test("isPolyValid: each invalidity mode") {
    assert(Geom.isPolyValid(sq))
    assert(!Geom.isPolyValid(sq.dropRight(1)))                  // open ring
    assert(!Geom.isPolyValid(IndexedSeq(sq(0), sq(1), sq(0))))  // <4 points
    val dup = IndexedSeq(sq(0), sq(1), sq(1), sq(2), sq(3), sq(0))
    assert(!Geom.isPolyValid(dup))                               // consecutive dup
    val nonPlanarAbove = IndexedSeq(
      Vec3(0, 0, 0), Vec3(1, 0, 0), Vec3(1, 1, 0), Vec3(0, 1, 0.011), Vec3(0, 0, 0))
    assert(!Geom.isPolyValid(nonPlanarAbove))                    // eps=0.01 exceeded
    val nonPlanarAtEps = IndexedSeq(
      Vec3(0, 0, 0), Vec3(1, 0, 0), Vec3(1, 1, 0), Vec3(0, 1, 0.01), Vec3(0, 0, 0))
    assert(Geom.isPolyValid(nonPlanarAtEps))                     // ≤ eps passes
  }

  test("planeFitPCA recovers an exact plane; getHeight/getY solve it") {
    val pts = IndexedSeq(Vec3(0, 0, 1), Vec3(2, 0, 1), Vec3(2, 2, 1), Vec3(0, 2, 1))
    val pl = Geom.planeFitPCA(pts)
    assert(math.abs(Geom.getHeight(pl, 1.0, 1.0) - 1.0) < 1e-9)
    val wallPts = IndexedSeq(Vec3(0, 5, 0), Vec3(2, 5, 0), Vec3(2, 5, 3), Vec3(0, 5, 3))
    val plw = Geom.planeFitPCA(wallPts)
    assert(math.abs(Geom.getY(plw, 1.0, 1.0) - 5.0) < 1e-9)
  }

  test("pointInTri2D: inside, boundary, outside") {
    assert(Geom.pointInTri2D(0.25, 0.25, 0, 0, 1, 0, 0, 1))
    assert(Geom.pointInTri2D(0.5, 0.5, 0, 0, 1, 0, 0, 1))   // on hypotenuse
    assert(Geom.pointInTri2D(0, 0, 0, 0, 1, 0, 0, 1))       // vertex
    assert(!Geom.pointInTri2D(0.6, 0.6, 0, 0, 1, 0, 0, 1))
  }

  test("smallestPoint is the lexicographic min") {
    val pts = Iterator(Vec3(2, 0, 0), Vec3(1, 5, 9), Vec3(1, 5, 2), Vec3(1, 7, 0))
    assert(Geom.smallestPoint(pts) === Vec3(1, 5, 2))
  }
}
