package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Seeded fuzz for the quickhull (O-46): on arbitrary point clouds the hull
  * must contain every input point (within the perturbation epsilon) and
  * every face must point outward.
  */
class Hull3DFuzzSpec extends AnyFunSuite {

  private def rnd(seed: Long, n: Int): IndexedSeq[Vec3] =
    (0 until n).map { i =>
      def u(s: Long) = (graft.model.Synth.mix64(seed * 1000003L + i * 3L + s) >>> 11)
        .toDouble / (1L << 53).toDouble
      Vec3(u(0) * 100 - 50, u(1) * 100 - 50, u(2) * 100 - 50)
    }

  test("50 seeded clouds: all points enclosed, faces outward, deterministic") {
    for (seed <- 0L until 50L) {
      val n = 4 + (seed % 20).toInt
      val pts = rnd(seed, n)
      val tris = Hull3D.hull(pts)
      assert(tris.nonEmpty, s"seed=$seed hull empty for $n points")
      // interior reference: centroid of the input cloud
      val c = Geom.centroid(pts)
      val eps = 1e-4 // perturbation is ±1e-6; leave slack for near-ties
      tris.foreach { t =>
        val nrm = (t.b - t.a).cross(t.c - t.a)
        assert(nrm.dot(c - t.a) <= eps, s"seed=$seed face points inward")
        pts.foreach { p =>
          assert(nrm.dot(p - t.a) <= nrm.norm * eps + 1e-9,
            s"seed=$seed point $p outside face")
        }
      }
      assert(Hull3D.hull(pts).toSeq === tris.toSeq, s"seed=$seed nondeterministic")
    }
  }

  test("shuffled input order yields the same hull surface area") {
    val pts = rnd(7L, 16)
    val a1 = Hull3D.hull(pts).map(t => (t.b - t.a).cross(t.c - t.a).norm / 2).sum
    val shuffled = pts.indices.map(i => pts((i * 7 + 3) % pts.length))
    val a2 = Hull3D.hull(shuffled).map(t => (t.b - t.a).cross(t.c - t.a).norm / 2).sum
    assert(math.abs(a1 - a2) < 1e-6, s"order-dependent hull: $a1 vs $a2")
  }
}
