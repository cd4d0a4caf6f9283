package graft.geom

/** Pure-Scala 3D geometry kernels (no Spark imports).
  *
  * Numeric contracts derive from the reference implementation
  * (tum-gis/CityGML2OBJv2, /root/reference/polygon3dmodule.py) — formulas are
  * re-expressed from the documented semantics in SURVEY.md §2.4/§2.5, with
  * file:line citations per function. All math is Double (f64), matching the
  * reference.
  */
final case class Vec3(x: Double, y: Double, z: Double) {
  def -(o: Vec3): Vec3 = Vec3(x - o.x, y - o.y, z - o.z)
  def +(o: Vec3): Vec3 = Vec3(x + o.x, y + o.y, z + o.z)
  def *(s: Double): Vec3 = Vec3(x * s, y * s, z * s)
  def dot(o: Vec3): Double = x * o.x + y * o.y + z * o.z
  def cross(o: Vec3): Vec3 =
    Vec3(y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x)
  def norm: Double = math.sqrt(x * x + y * y + z * z)
}

object Geom {

  /** 3x3 determinant, Laplace expansion (polygon3dmodule.py:209-211). */
  def det3(a: Array[Double], b: Array[Double], c: Array[Double]): Double =
    a(0) * (b(1) * c(2) - b(2) * c(1)) -
      a(1) * (b(0) * c(2) - b(2) * c(0)) +
      a(2) * (b(0) * c(1) - b(1) * c(0))

  /** Unit normal of the plane through a,b,c via three determinants
    * (polygon3dmodule.py:214-229). Returns None on zero magnitude (the
    * reference raises on collinear input).
    */
  def unitNormal(a: Vec3, b: Vec3, c: Vec3): Option[Vec3] = {
    val nx = det3(Array(1, a.y, a.z), Array(1, b.y, b.z), Array(1, c.y, c.z))
    val ny = det3(Array(a.x, 1, a.z), Array(b.x, 1, b.z), Array(c.x, 1, c.z))
    val nz = det3(Array(a.x, a.y, 1), Array(b.x, b.y, 1), Array(c.x, c.y, 1))
    val mag = math.sqrt(nx * nx + ny * ny + nz * nz)
    if (mag == 0.0) None else Some(Vec3(nx / mag, ny / mag, nz / mag))
  }

  /** Newell's-method polygon normal, normalized
    * (polygon3dmodule.py:509-548). Input ring may be open or closed; the
    * formula sums over consecutive pairs with wraparound.
    */
  def newellNormal(ring: IndexedSeq[Vec3]): Vec3 = {
    // Drop the closing point if present so wraparound isn't double-counted.
    val pts = if (ring.length > 1 && ring.head == ring.last) ring.dropRight(1) else ring
    var nx = 0.0; var ny = 0.0; var nz = 0.0
    val n = pts.length
    var i = 0
    while (i < n) {
      val cur = pts(i); val nxt = pts((i + 1) % n)
      nx += (cur.y - nxt.y) * (cur.z + nxt.z)
      ny += (cur.z - nxt.z) * (cur.x + nxt.x)
      nz += (cur.x - nxt.x) * (cur.y + nxt.y)
      i += 1
    }
    val mag = math.sqrt(nx * nx + ny * ny + nz * nz)
    if (mag == 0.0) Vec3(0, 0, 0) else Vec3(nx / mag, ny / mag, nz / mag)
  }

  /** 3D shoelace area: |Σ cross(vi, vi+1) · unit_normal(first 3)| / 2
    * (polygon3dmodule.py:245-261). Ring expected closed (first == last);
    * open rings are wrapped.
    */
  def area3D(ring: IndexedSeq[Vec3]): Double = {
    if (ring.length < 3) return 0.0
    val pts = if (ring.head == ring.last) ring.dropRight(1) else ring
    if (pts.length < 3) return 0.0
    var total = Vec3(0, 0, 0)
    val n = pts.length
    var i = 0
    while (i < n) {
      total = total + pts(i).cross(pts((i + 1) % n))
      i += 1
    }
    // reference uses unit_normal of the first three points; fall back to
    // Newell when those are collinear so the area is still defined.
    val un = unitNormal(pts(0), pts(1), pts(2)).getOrElse(newellNormal(pts))
    math.abs(total.dot(un) / 2.0)
  }

  /** Projected 2D area: z := 0, then area3D (polygon3dmodule.py:264-269). */
  def area2D(ring: IndexedSeq[Vec3]): Double =
    area3D(ring.map(p => Vec3(p.x, p.y, 0.0)))

  /** Net polygon area = exterior − Σ holes, each ring gated on validity
    * (polygon3dmodule.py:41-66).
    */
  def areaGML(ext: IndexedSeq[Vec3], holes: Seq[IndexedSeq[Vec3]]): Double = {
    val e = if (isPolyValid(ext)) area3D(ext) else 0.0
    val h = holes.map(r => if (isPolyValid(r)) area3D(r) else 0.0).sum
    e - h
  }

  /** Azimuth/tilt of a polygon's plane (polygon3dmodule.py:277-292):
    * azimuth = 90 − atan2(ny, nx) degrees wrapped to [0, 360), returned
    * UNROUNDED (the reference rounds only the tilt);
    * tilt = 90 − atan(nz / sqrt(nx²+ny²)) degrees (0 = flat, 90 = wall),
    * rounded to 3 decimal places per the reference.
    */
  def angles(ring: IndexedSeq[Vec3]): (Double, Double) = {
    if (ring.length < 3) return (0.0, 0.0)
    val n = unitNormal(ring(0), ring(1), ring(2)).getOrElse(newellNormal(ring))
    val horiz = math.sqrt(n.x * n.x + n.y * n.y)
    var azimuth = 90.0 - math.toDegrees(math.atan2(n.y, n.x))
    if (azimuth >= 360.0) azimuth -= 360.0
    if (azimuth < 0.0) azimuth += 360.0
    val tilt =
      if (horiz == 0.0) 0.0
      else 90.0 - math.toDegrees(math.atan(n.z / horiz))
    (azimuth, round3(tilt))
  }

  private def round3(v: Double): Double = math.rint(v * 1000.0) / 1000.0

  /** Component-wise normal equality within tol = 0.1
    * (polygon3dmodule.py:416-430, tol literal `10e-2`).
    */
  def compareNormals(a: Vec3, b: Vec3, tol: Double = 0.1): Boolean =
    math.abs(a.x - b.x) <= tol && math.abs(a.y - b.y) <= tol &&
      math.abs(a.z - b.z) <= tol

  /** Arithmetic-mean centroid (polygon3dmodule.py:338-348). */
  def centroid(pts: IndexedSeq[Vec3]): Vec3 = {
    var sx = 0.0; var sy = 0.0; var sz = 0.0
    var i = 0
    while (i < pts.length) { sx += pts(i).x; sy += pts(i).y; sz += pts(i).z; i += 1 }
    Vec3(sx / pts.length, sy / pts.length, sz / pts.length)
  }

  /** Lexicographic (x, y, z) minimum (polygon3dmodule.py:307-314). */
  def smallestPoint(pts: Iterator[Vec3]): Vec3 = {
    var best = pts.next()
    while (pts.hasNext) {
      val p = pts.next()
      if (lexLt(p, best)) best = p
    }
    best
  }

  private def lexLt(a: Vec3, b: Vec3): Boolean =
    a.x < b.x || (a.x == b.x && (a.y < b.y || (a.y == b.y && a.z < b.z)))

  /** Lexicographic (x, y, z) maximum; optional skip-equal-z variant used by
    * the reference for the "highest point" heuristic
    * (polygon3dmodule.py:317-335).
    */
  def highestPoint(pts: Iterator[Vec3], skipZ: Option[Double] = None): Vec3 = {
    val it = skipZ.map(z => pts.filter(_.z != z)).getOrElse(pts)
    var best = it.next()
    while (it.hasNext) {
      val p = it.next()
      if (lexLt(best, p)) best = p
    }
    best
  }

  /** Area-weighted centroid with cross-norm weights
    * (polygon3dmodule.py:449-471; defined in the reference but not on the
    * live path — kept for API completeness).
    */
  def weightedCentroid(ring: IndexedSeq[Vec3]): Vec3 = {
    val pts = if (ring.length > 1 && ring.head == ring.last) ring.dropRight(1) else ring
    if (pts.length < 3) return centroid(pts)
    var wsum = 0.0
    var acc = Vec3(0, 0, 0)
    var i = 1
    while (i + 1 < pts.length) {
      val a = pts(0); val b = pts(i); val c = pts(i + 1)
      val w = (b - a).cross(c - a).norm / 2.0
      val tc = Vec3((a.x + b.x + c.x) / 3, (a.y + b.y + c.y) / 3, (a.z + b.z + c.z) / 3)
      acc = acc + tc * w
      wsum += w
      i += 1
    }
    if (wsum == 0.0) centroid(pts) else acc * (1.0 / wsum)
  }

  /** Order-preserving de-dup of ring vertices excluding the final point,
    * which is re-appended verbatim (CityGML2OBJs.py:87-96 `remove_reccuring`).
    * A closed ring stays closed; interior duplicates are dropped keeping the
    * first occurrence.
    */
  def cleanRing(ring: IndexedSeq[Vec3]): IndexedSeq[Vec3] = {
    if (ring.isEmpty) return ring
    val body = ring.dropRight(1)
    val seen = scala.collection.mutable.LinkedHashSet.empty[Vec3]
    body.foreach(seen.add)
    (seen.toIndexedSeq :+ ring.last)
  }

  /** Planarity: normal from the first three points; every further point's
    * offset from point0 dotted with that normal must be ≤ eps = 0.01
    * (polygon3dmodule.py:105-123, eps literal).
    */
  def isPolyPlanar(ring: IndexedSeq[Vec3], eps: Double = 0.01): Boolean = {
    if (ring.length < 3) return false
    unitNormal(ring(0), ring(1), ring(2)) match {
      case None => false
      case Some(n) =>
        var i = 3
        var ok = true
        while (i < ring.length && ok) {
          val d = (ring(i) - ring(0)).dot(n)
          if (math.abs(d) > eps) ok = false
          i += 1
        }
        ok
    }
  }

  /** Polygon validity (polygon3dmodule.py:70-102): AND of — ring closed
    * (first == last); at least 4 points including closure; planar within
    * eps = 0.01; no identical consecutive points. Self-intersection is NOT
    * checked (disabled in the reference, :97-101 — documented parity gap).
    */
  def isPolyValid(ring: IndexedSeq[Vec3]): Boolean = {
    if (ring.length < 4) return false
    if (ring.head != ring.last) return false
    var i = 1
    while (i < ring.length) {
      if (ring(i) == ring(i - 1)) return false
      i += 1
    }
    isPolyPlanar(ring)
  }

  /** Plane through three points as (a, b, c, d) with ax+by+cz+d = 0
    * (polygon3dmodule.py:361-367).
    */
  def plane3(p0: Vec3, p1: Vec3, p2: Vec3): (Double, Double, Double, Double) = {
    val n = (p1 - p0).cross(p2 - p0)
    (n.x, n.y, n.z, -n.dot(p0))
  }

  /** PCA plane fit over all ring points (polygon3dmodule.py:370-399):
    * normal = eigenvector of the smallest eigenvalue of the 3×3 covariance;
    * d = −normal·mean. Deterministic eigen-solve via closed-form symmetric
    * 3×3 decomposition (no external lib needed for a 3×3).
    */
  def planeFitPCA(pts: IndexedSeq[Vec3]): (Double, Double, Double, Double) = {
    val c = centroid(pts)
    var xx = 0.0; var xy = 0.0; var xz = 0.0
    var yy = 0.0; var yz = 0.0; var zz = 0.0
    pts.foreach { p =>
      val d = p - c
      xx += d.x * d.x; xy += d.x * d.y; xz += d.x * d.z
      yy += d.y * d.y; yz += d.y * d.z; zz += d.z * d.z
    }
    val n = pts.length.toDouble
    val m = new org.apache.commons.math3.linear.Array2DRowRealMatrix(
      Array(Array(xx / n, xy / n, xz / n),
            Array(xy / n, yy / n, yz / n),
            Array(xz / n, yz / n, zz / n)), false)
    val eig = new org.apache.commons.math3.linear.EigenDecomposition(m)
    // smallest eigenvalue's eigenvector = plane normal
    val vals = eig.getRealEigenvalues
    var mi = 0
    var i = 1
    while (i < 3) { if (vals(i) < vals(mi)) mi = i; i += 1 }
    val v = eig.getEigenvector(mi)
    val nrm = Vec3(v.getEntry(0), v.getEntry(1), v.getEntry(2))
    (nrm.x, nrm.y, nrm.z, -nrm.dot(c))
  }

  /** Solve plane for z given (x, y) (polygon3dmodule.py:402-407). */
  def getHeight(pl: (Double, Double, Double, Double), x: Double, y: Double): Double =
    -(pl._1 * x + pl._2 * y + pl._4) / pl._3

  /** Solve plane for y given (x, z) (polygon3dmodule.py:409-413). */
  def getY(pl: (Double, Double, Double, Double), x: Double, z: Double): Double =
    -(pl._1 * x + pl._3 * z + pl._4) / pl._2

  /** 2D point-in-triangle (half-plane / sign-of-cross test), boundary
    * inclusive. Used as the exact refinement predicate of the cell-join
    * spatial join (SURVEY.md O-38).
    */
  def pointInTri2D(px: Double, py: Double,
                   ax: Double, ay: Double,
                   bx: Double, by: Double,
                   cx: Double, cy: Double): Boolean = {
    val d1 = (px - bx) * (ay - by) - (ax - bx) * (py - by)
    val d2 = (px - cx) * (by - cy) - (bx - cx) * (py - cy)
    val d3 = (px - ax) * (cy - ay) - (cx - ax) * (py - ay)
    val hasNeg = d1 < 0 || d2 < 0 || d3 < 0
    val hasPos = d1 > 0 || d2 > 0 || d3 > 0
    !(hasNeg && hasPos)
  }
}
