package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Deterministic ear-clipping triangulation with hole support.
  *
  * Reproduces the I/O contract of the reference triangulation operator
  * (polygon3dmodule.py:551-716, which shells out to Shewchuk's Triangle with
  * flags `pQjz` — constrained, no Steiner points):
  *
  *  - projection to 2D: all-x-equal ring → (y,z); vertical polygon
  *    (|newell.z| < 0.1) → (x,z); else → (x,y)          (:603, :614-636)
  *  - hole handling: each hole ring merged into the outer ring via a bridge
  *    edge (reference passes a PSLG + hole seed points to Triangle; the
  *    triangle-count invariant T = n_total − 2 + 2·h is identical)
  *  - orientation repair: every output triangle whose unit normal disagrees
  *    with the Newell polygon normal (component tolerance 0.1,
  *    polygon3dmodule.py:416-430) is reversed                 (:707-715)
  *  - failures never throw: degenerate input yields an empty result
  *    (CityGML2OBJs.py:144-148 swallow-errors contract)
  *
  * Exact diagonal choice is pinned by this implementation's own goldens
  * (SURVEY.md §7.5.1) — counts, area sums, and orientations match the
  * reference provably; diagonals may differ from Triangle's CDT.
  */
object EarClip {

  final case class Tri(a: Vec3, b: Vec3, c: Vec3)

  private final val VerticalEps = 0.1 // 10e-2 in the reference (:603)

  /** Projection axes chosen per the reference's rules. Returns a function
    * 3D → 2D plus a tag for diagnostics.
    */
  private def projector(ext: IndexedSeq[Vec3], normal: Vec3): Vec3 => (Double, Double) = {
    val allXEqual = ext.forall(_.x == ext.head.x)
    if (allXEqual) p => (p.y, p.z)
    else if (math.abs(normal.z) < VerticalEps) p => (p.x, p.z)
    else p => (p.x, p.y)
  }

  /** Triangulate exterior + holes. Returns an empty array on any degenerate
    * input rather than throwing.
    */
  def triangulate(extIn: IndexedSeq[Vec3], holesIn: Seq[IndexedSeq[Vec3]]): Array[Tri] = {
    try {
      val ext = open(Geom.cleanRing(extIn))
      if (ext.length < 3) return Array.empty
      val normal = Geom.newellNormal(ext)
      if (normal.norm == 0.0) return Array.empty
      val proj = projector(ext, normal)
      val holes = holesIn.map(h => open(Geom.cleanRing(h))).filter(_.length >= 3)

      // 2D working copies; keep the original 3D vertex alongside so output
      // triangles reuse input vertices exactly (no back-projection error).
      var outer = ext.map(v => { val (u, w) = proj(v); P(u, w, v) }).toArray
      // outer ring must be CCW in projected space
      if (signedArea(outer) < 0) outer = outer.reverse
      val holes2d = holes.map { h =>
        var arr = h.map(v => { val (u, w) = proj(v); P(u, w, v) }).toArray
        if (signedArea(arr) > 0) arr = arr.reverse // holes CW
        arr
      }

      // merge holes into outer ring via bridge edges, rightmost-hole first
      val merged = holes2d.sortBy(h => -h.map(_.u).max)
        .foldLeft(outer)((ring, hole) => mergeHole(ring, hole))

      val tris = clip(merged)
      // orientation repair vs Newell normal (tol 0.1 per component)
      tris.map { t =>
        Geom.unitNormal(t.a, t.b, t.c) match {
          case Some(n) if !Geom.compareNormals(n, normal) => Tri(t.c, t.b, t.a)
          case _ => t
        }
      }.toArray
    } catch { case _: Throwable => Array.empty }
  }

  private final case class P(u: Double, w: Double, orig: Vec3)

  private def open(ring: IndexedSeq[Vec3]): IndexedSeq[Vec3] =
    if (ring.length > 1 && ring.head == ring.last) ring.dropRight(1) else ring

  private def signedArea(ring: Array[P]): Double = {
    var s = 0.0
    var i = 0
    val n = ring.length
    while (i < n) {
      val a = ring(i); val b = ring((i + 1) % n)
      s += a.u * b.w - b.u * a.w
      i += 1
    }
    s / 2.0
  }

  private def cross2(ox: Double, oy: Double, ax: Double, ay: Double,
                     bx: Double, by: Double): Double =
    (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

  /** Standard hole-bridging (Eberly): find the hole vertex M with max u;
    * ray-cast +u from M to the outer ring; connect M to the visible outer
    * vertex; splice the hole (duplicate bridge endpoints).
    */
  private def mergeHole(outer: Array[P], hole: Array[P]): Array[P] = {
    var mi = 0
    var i = 1
    while (i < hole.length) { if (hole(i).u > hole(mi).u ||
      (hole(i).u == hole(mi).u && hole(i).w > hole(mi).w)) mi = i; i += 1 }
    val m = hole(mi)

    // ray from m in +u; find closest intersection with outer edges
    var bestT = Double.MaxValue
    var bestEdge = -1
    var bestX = 0.0
    i = 0
    val n = outer.length
    while (i < n) {
      val a = outer(i); val b = outer((i + 1) % n)
      // edge must straddle the horizontal line w = m.w with b above/below
      if ((a.w <= m.w && b.w >= m.w || b.w <= m.w && a.w >= m.w) && a.w != b.w) {
        val t = (m.w - a.w) / (b.w - a.w)
        val x = a.u + t * (b.u - a.u)
        if (x >= m.u && x - m.u < bestT) { bestT = x - m.u; bestEdge = i; bestX = x }
      }
      i += 1
    }
    if (bestEdge < 0) return outer // hole outside outer ring: drop it

    // candidate connection vertex: endpoint of the hit edge with larger u
    val a = outer(bestEdge); val b = outer((bestEdge + 1) % n)
    var conn = if (a.u > b.u) bestEdge else (bestEdge + 1) % n
    // check for reflex outer vertices inside triangle (m, hit, conn); if any,
    // connect to the one minimizing angle to +u (standard robustness step)
    val hitP = P(bestX, m.w, outer(conn).orig)
    var bestAngle = Double.MaxValue
    var bestConn = conn
    i = 0
    while (i < n) {
      val p = outer(i)
      if (p.u >= m.u && i != conn) {
        if (insideTri(m, hitP, outer(conn), p)) {
          val ang = math.abs(math.atan2(p.w - m.w, p.u - m.u))
          if (ang < bestAngle) { bestAngle = ang; bestConn = i }
        }
      }
      i += 1
    }
    conn = bestConn

    // splice: outer[0..conn] + m..hole..m(wrap) + outer[conn..]
    val out = new ArrayBuffer[P](n + hole.length + 2)
    i = 0
    while (i <= conn) { out += outer(i); i += 1 }
    var j = 0
    while (j <= hole.length) { out += hole((mi + j) % hole.length); j += 1 }
    out += outer(conn)
    i = conn + 1
    while (i < n) { out += outer(i); i += 1 }
    out.toArray
  }

  private def insideTri(t0: P, t1: P, t2: P, p: P): Boolean = {
    val d1 = cross2(t0.u, t0.w, t1.u, t1.w, p.u, p.w)
    val d2 = cross2(t1.u, t1.w, t2.u, t2.w, p.u, p.w)
    val d3 = cross2(t2.u, t2.w, t0.u, t0.w, p.u, p.w)
    (d1 >= 0 && d2 >= 0 && d3 >= 0) || (d1 <= 0 && d2 <= 0 && d3 <= 0)
  }

  /** Ear clipping on a CCW simple polygon (bridge duplicates allowed).
    * Deterministic: scans from the lowest index each pass.
    */
  private def clip(poly: Array[P]): ArrayBuffer[Tri] = {
    val idx = ArrayBuffer.tabulate(poly.length)(identity)
    val out = new ArrayBuffer[Tri](math.max(0, poly.length - 2))
    var guard = 0
    val maxIter = poly.length * poly.length + 16
    var relaxed = false
    while (idx.length > 3 && guard < maxIter) {
      guard += 1
      var clipped = false
      var k = 0
      while (k < idx.length && !clipped) {
        val ip = idx((k + idx.length - 1) % idx.length)
        val ic = idx(k)
        val in_ = idx((k + 1) % idx.length)
        val p = poly(ip); val c = poly(ic); val q = poly(in_)
        val convex = cross2(p.u, p.w, c.u, c.w, q.u, q.w) > 1e-12 ||
          (relaxed && cross2(p.u, p.w, c.u, c.w, q.u, q.w) >= 0)
        if (convex && noPointInside(poly, idx, k, p, c, q)) {
          out += Tri(p.orig, c.orig, q.orig)
          idx.remove(k)
          clipped = true
        }
        k += 1
      }
      if (!clipped) {
        if (!relaxed) relaxed = true // allow collinear ears on 2nd pass
        else {
          // give up gracefully: fan the remainder (degenerate input); the fan
          // emits ALL remaining triangles including (0,1,2), so clear idx —
          // leaving 3 entries would re-emit (0,1,2) via the post-loop path
          var k2 = 1
          while (k2 + 1 < idx.length) {
            out += Tri(poly(idx(0)).orig, poly(idx(k2)).orig, poly(idx(k2 + 1)).orig)
            k2 += 1
          }
          idx.clear()
        }
      }
    }
    if (idx.length == 3)
      out += Tri(poly(idx(0)).orig, poly(idx(1)).orig, poly(idx(2)).orig)
    // drop zero-area output triangles produced by bridge duplicates
    out.filter(t => triArea2(t) > 0.0)
  }

  private def triArea2(t: Tri): Double = {
    val n = (t.b - t.a).cross(t.c - t.a)
    n.norm / 2.0
  }

  private def noPointInside(poly: Array[P], idx: ArrayBuffer[Int], k: Int,
                            p: P, c: P, q: P): Boolean = {
    var i = 0
    val n = idx.length
    val prev = (k + n - 1) % n
    val next = (k + 1) % n
    while (i < n) {
      if (i != k && i != prev && i != next) {
        val t = poly(idx(i))
        // skip vertices coincident with an ear corner (bridge duplicates)
        val dup = (t.u == p.u && t.w == p.w) || (t.u == c.u && t.w == c.w) ||
          (t.u == q.u && t.w == q.w)
        // boundary points BLOCK the ear too (a vertex on the ear's edge
        // would otherwise yield overlapping output triangles)
        if (!dup && insideOrOnBoundary(p, c, q, t)) return false
      }
      i += 1
    }
    true
  }

  private def insideOrOnBoundary(t0: P, t1: P, t2: P, p: P): Boolean = {
    val d1 = cross2(t0.u, t0.w, t1.u, t1.w, p.u, p.w)
    val d2 = cross2(t1.u, t1.w, t2.u, t2.w, p.u, p.w)
    val d3 = cross2(t2.u, t2.w, t0.u, t0.w, p.u, p.w)
    d1 >= 0 && d2 >= 0 && d3 >= 0
  }
}
