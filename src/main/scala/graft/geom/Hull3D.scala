package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Deterministic incremental 3D convex hull (quickhull-style), for the
  * window-approximation operator (SURVEY.md O-46,
  * componentseparationmodule.py:420-450). The reference perturbs points with
  * `np.random.uniform(±1e-6)` before calling open3d — nondeterministic; we
  * replace it with a hash-salted epsilon keyed on the point index
  * (documented divergence, SURVEY.md §7.5.3), so output is reproducible.
  */
object Hull3D {

  final case class Tri(a: Vec3, b: Vec3, c: Vec3)

  /** Deterministic tiny perturbation to break coplanarity, mirroring the
    * reference's intent without RNG. Keyed on the point's own coordinate
    * bits (NOT its list position): collect_list order is nondeterministic
    * across runs/partitionings, so an index-keyed epsilon would only be
    * deterministic per-run.
    */
  def perturb(pts: IndexedSeq[Vec3]): IndexedSeq[Vec3] =
    pts.map { p =>
      val key = graft.model.Synth.mix64(
        java.lang.Double.doubleToLongBits(p.x) * 0x9E3779B97F4A7C15L ^
          java.lang.Double.doubleToLongBits(p.y) * 0xC2B2AE3D27D4EB4FL ^
          java.lang.Double.doubleToLongBits(p.z))
      def eps(salt: Long): Double = {
        val h = graft.model.Synth.mix64(key ^ salt)
        ((h >>> 11).toDouble / (1L << 53).toDouble - 0.5) * 2e-6
      }
      Vec3(p.x + eps(0), p.y + eps(1), p.z + eps(2))
    }

  /** Convex hull triangle faces, outward-oriented. Degenerate input
    * (< 4 points or all coplanar even after perturbation) → empty
    * (reference swallow-errors contract).
    */
  def hull(ptsIn: IndexedSeq[Vec3]): Array[Tri] = {
    try {
      val pts = perturb(ptsIn.distinct)
      if (pts.length < 4) return Array.empty
      hullFaces(pts)
    } catch { case _: Throwable => Array.empty }
  }

  private final case class Face(a: Int, b: Int, c: Int, n: Vec3, d: Double)

  private def mkFace(pts: IndexedSeq[Vec3], a: Int, b: Int, c: Int): Face = {
    val n = (pts(b) - pts(a)).cross(pts(c) - pts(a))
    Face(a, b, c, n, n.dot(pts(a)))
  }

  private def hullFaces(pts: IndexedSeq[Vec3]): Array[Tri] = {
    val n = pts.length
    // initial tetrahedron: extreme points on x, then max-dist to line/plane
    val i0 = pts.indices.minBy(i => (pts(i).x, pts(i).y, pts(i).z))
    val i1 = pts.indices.maxBy(i => (pts(i) - pts(i0)).norm)
    val i2 = pts.indices.maxBy { i =>
      val d = pts(i1) - pts(i0)
      (pts(i) - pts(i0)).cross(d).norm
    }
    val baseN = (pts(i1) - pts(i0)).cross(pts(i2) - pts(i0))
    val i3 = pts.indices.maxBy(i => math.abs(baseN.dot(pts(i) - pts(i0))))
    if (Set(i0, i1, i2, i3).size < 4) return Array.empty
    if (math.abs(baseN.dot(pts(i3) - pts(i0))) < 1e-18) return Array.empty

    var faces = ArrayBuffer[Face]()
    // orient the tetrahedron consistently outward
    def addOriented(a: Int, b: Int, c: Int, opposite: Int): Unit = {
      val f = mkFace(pts, a, b, c)
      if (f.n.dot(pts(opposite)) > f.d) faces += mkFace(pts, a, c, b)
      else faces += f
    }
    addOriented(i0, i1, i2, i3)
    addOriented(i0, i1, i3, i2)
    addOriented(i0, i2, i3, i1)
    addOriented(i1, i2, i3, i0)

    // incremental insertion in deterministic index order
    val eps = 1e-12
    var p = 0
    while (p < n) {
      if (p != i0 && p != i1 && p != i2 && p != i3) {
        val visible = faces.zipWithIndex.filter { case (f, _) =>
          f.n.dot(pts(p)) > f.d + eps
        }
        if (visible.nonEmpty) {
          // horizon = edges of visible faces shared with exactly one visible face
          val visSet = visible.map(_._2).toSet
          val edgeCount = scala.collection.mutable.Map.empty[(Int, Int), Int]
          def key(u: Int, v: Int) = if (u < v) (u, v) else (v, u)
          visible.foreach { case (f, _) =>
            Seq((f.a, f.b), (f.b, f.c), (f.c, f.a)).foreach { e =>
              edgeCount(key(e._1, e._2)) = edgeCount.getOrElse(key(e._1, e._2), 0) + 1
            }
          }
          val horizon = visible.flatMap { case (f, _) =>
            Seq((f.a, f.b), (f.b, f.c), (f.c, f.a))
              .filter(e => edgeCount(key(e._1, e._2)) == 1)
          }
          faces = faces.zipWithIndex.collect {
            case (f, i) if !visSet.contains(i) => f
          }
          horizon.foreach { case (u, v) =>
            val f = mkFace(pts, u, v, p)
            // orientation: keep interior (centroid of current hull) below
            faces += f
          }
          // re-orient any face whose normal points inward vs hull centroid
          val cent = {
            val idxs = faces.flatMap(f => Seq(f.a, f.b, f.c)).distinct
            val c0 = idxs.map(pts(_)).reduce(_ + _)
            c0 * (1.0 / idxs.length)
          }
          faces = faces.map { f =>
            if (f.n.dot(cent) > f.d) mkFace(pts, f.a, f.c, f.b) else f
          }
        }
      }
      p += 1
    }
    faces.map(f => Tri(pts(f.a), pts(f.b), pts(f.c))).toArray
  }
}
