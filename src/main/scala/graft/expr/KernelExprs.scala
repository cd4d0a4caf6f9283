package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{Bridge, GraftExpectsInputTypes}
import org.apache.spark.sql.types._

import graft.geom.{EarClip, Geom, Vec3}

import GeomSchemas._

/** The remaining reference scalar kernels (SURVEY.md §2.4) as Catalyst
  * expressions, so each one is exercised through the engine AND replayable
  * as plain SQL by the DuckDB oracle (q46–q48): edge dot/cross (O-17),
  * 2D projected area (O-19), 3-point plane + plane solving (O-24/O-26),
  * PCA plane fit (O-25), triangle orientation agreement (O-27/O-28 — the
  * compare_normals / reverse_vertices pair EarClip applies), and the
  * area-weighted centroid (O-30). All CodegenFallback: none sit on a hot
  * path; they exist for API completeness and the correctness gate.
  */

/** O-17 dot/cross of the first corner's edge pair e1 = p1−p0, e2 = p2−p0
  * (polygon3dmodule.py: the `np.dot`/`np.cross` building blocks).
  */
case class EdgeKernelExpr(child: Expression) extends UnaryExpression
    with CodegenFallback with GraftExpectsInputTypes {
  override def graftInputTypes: Seq[DataType] = Seq(ringType)
  override def dataType: DataType = StructType(Seq(
    StructField("dot", DoubleType, nullable = false),
    StructField("cx", DoubleType, nullable = false),
    StructField("cy", DoubleType, nullable = false),
    StructField("cz", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val r = toRing(v.asInstanceOf[ArrayData])
    if (r.length < 3) new GenericInternalRow(Array[Any](0.0, 0.0, 0.0, 0.0))
    else {
      val e1 = r(1) - r(0); val e2 = r(2) - r(0)
      val c = e1.cross(e2)
      new GenericInternalRow(Array[Any](e1.dot(e2), c.x, c.y, c.z))
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** O-19 projected 2D area (polygon3dmodule.py:264-269): z := 0, then the
  * 3D shoelace.
  */
case class Area2DExpr(child: Expression) extends UnaryExpression
    with CodegenFallback with GraftExpectsInputTypes {
  override def graftInputTypes: Seq[DataType] = Seq(ringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    Geom.area2D(toRing(v.asInstanceOf[ArrayData]))
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** O-24 + O-26: plane through the ring's first three points
  * (polygon3dmodule.py:361-367) and the plane solved for z (getHeight,
  * :402-407) and for y (getY, :409-413) at the ring centroid — null when
  * the plane is parallel to the probed axis (c = 0 / b = 0), mirroring the
  * reference's division blow-up surface.
  */
case class PlaneProbeExpr(child: Expression) extends UnaryExpression
    with CodegenFallback with GraftExpectsInputTypes {
  override def graftInputTypes: Seq[DataType] = Seq(ringType)
  override def dataType: DataType = StructType(Seq(
    StructField("pa", DoubleType, nullable = false),
    StructField("pb", DoubleType, nullable = false),
    StructField("pc", DoubleType, nullable = false),
    StructField("pd", DoubleType, nullable = false),
    StructField("h_at_c", DoubleType, nullable = true),
    StructField("y_at_c", DoubleType, nullable = true)))
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val r = toRing(v.asInstanceOf[ArrayData])
    if (r.length < 3)
      new GenericInternalRow(Array[Any](0.0, 0.0, 0.0, 0.0, null, null))
    else {
      val pl = Geom.plane3(r(0), r(1), r(2))
      val c = Geom.centroid(r)
      val h: Any = if (pl._3 != 0.0) Geom.getHeight(pl, c.x, c.y) else null
      val y: Any = if (pl._2 != 0.0) Geom.getY(pl, c.x, c.z) else null
      new GenericInternalRow(Array[Any](pl._1, pl._2, pl._3, pl._4, h, y))
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** O-25 PCA plane fit (polygon3dmodule.py:370-399), gated by its residual:
  * max |a·x + b·y + c·z + d| over the ring points against the FITTED plane
  * (unit normal ⇒ true point-plane distance). Defined — and oracle-pinned
  * to round(resid, 6) = 0 — only for EXACTLY planar rings (every point
  * within 1e-9 of the first-three-point plane, the same bit-mirrorable
  * test the SQL side runs); a merely eps-planar ring (isPolyValid admits
  * deviation up to 0.01) returns null on BOTH engines instead of turning a
  * legitimate nonzero residual into a spurious gate failure. On the planar
  * rows the pin is a real gate: a wrong eigenvector (non-smallest
  * eigenvalue, sign-flip bugs feeding a non-unit normal, covariance typos)
  * surfaces as a hash mismatch.
  */
case class PcaResidExpr(child: Expression) extends UnaryExpression
    with CodegenFallback with GraftExpectsInputTypes {
  override def graftInputTypes: Seq[DataType] = Seq(ringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val r = toRing(v.asInstanceOf[ArrayData])
    if (r.length < 3) return null
    Geom.unitNormal(r(0), r(1), r(2)) match {
      case None => null
      case Some(n) =>
        var i = 0
        while (i < r.length) {
          val p = r(i)
          val dev = (p.x - r(0).x) * n.x + (p.y - r(0).y) * n.y +
            (p.z - r(0).z) * n.z
          if (math.abs(dev) > 1e-9) return null
          i += 1
        }
        val (a, b, c, d) = Geom.planeFitPCA(r)
        var worst = 0.0
        i = 0
        while (i < r.length) {
          val p = r(i)
          val dist = math.abs(a * p.x + b * p.y + c * p.z + d)
          if (dist > worst) worst = dist
          i += 1
        }
        worst
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** O-30 area-weighted centroid (polygon3dmodule.py:449-471). */
case class WeightedCentroidExpr(child: Expression) extends UnaryExpression
    with CodegenFallback with GraftExpectsInputTypes {
  override def graftInputTypes: Seq[DataType] = Seq(ringType)
  override def dataType: DataType = vec3Type
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    vecRow(Geom.weightedCentroid(toRing(v.asInstanceOf[ArrayData])))
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** O-27/O-28 under the gate: triangulate (ext, holes) exactly like the OBJ
  * path and count triangles whose unit normal agrees with the ring's Newell
  * normal per compare_normals (tol 0.1/component). EarClip's orientation
  * repair (reverse_vertices on mismatch, EarClip.scala) makes n_aligned =
  * n_tris BY CONSTRUCTION — but the oracle recomputes the alignment of every
  * dumped triangle independently in SQL, so a broken repair (or a flipped
  * Newell) shows up as a mismatch, not as a tautology.
  */
case class TriAlignExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with GraftExpectsInputTypes {
  override def graftInputTypes: Seq[DataType] = Seq(ringType, holesType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tris", LongType, nullable = false),
    StructField("n_aligned", LongType, nullable = false)))
  override def nullIntolerant: Boolean = false
  override def eval(input: InternalRow): Any = {
    val e = left.eval(input)
    if (e == null) new GenericInternalRow(Array[Any](0L, 0L))
    else {
      val ring = toRing(e.asInstanceOf[ArrayData])
      val holes = toHoles(right.eval(input).asInstanceOf[ArrayData])
      val tris = EarClip.triangulate(ring, holes)
      val nn = Geom.newellNormal(ring)
      val aligned = tris.count(t =>
        Geom.unitNormal(t.a, t.b, t.c).exists(u => Geom.compareNormals(u, nn)))
      new GenericInternalRow(Array[Any](tris.length.toLong, aligned.toLong))
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** O-31 + O-34 — the reference's two dead kernels, implemented for 100%
  * §2 coverage and exercised under the gate (q164).
  *
  * point_inside (polygon3dmodule.py:352-358): after the Th_Fr rewrite it
  * is a centroid passthrough (shapely Point(centroid).coords), so pi_* =
  * the arithmetic-mean centroid of the ring — closure point included,
  * the Geom.centroid contract.
  *
  * collinear (polygon3dmodule.py:200-204): 2D cross of (p1−p0, p2−p0)
  * compared to 1e-12. `col_ref` preserves the reference's SIGNED compare
  * (`cross < 1e-12` — true for ANY clockwise turn, the documented bug
  * that got it disabled); `col_fix` is the intended `abs(cross) < 1e-12`.
  * Both are gated so the oracle pins the bug-for-bug behavior AND the
  * repaired predicate.
  */
case class DeadKernelsExpr(child: Expression) extends UnaryExpression
    with CodegenFallback with GraftExpectsInputTypes {
  override def graftInputTypes: Seq[DataType] = Seq(ringType)
  override def dataType: DataType = StructType(Seq(
    StructField("pix", DoubleType, nullable = false),
    StructField("piy", DoubleType, nullable = false),
    StructField("piz", DoubleType, nullable = false),
    StructField("col_ref", BooleanType, nullable = false),
    StructField("col_fix", BooleanType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val r = toRing(v.asInstanceOf[ArrayData])
    val c = Geom.centroid(r)
    if (r.length < 3)
      new GenericInternalRow(Array[Any](c.x, c.y, c.z, false, false))
    else {
      val x1 = r(1).x - r(0).x; val y1 = r(1).y - r(0).y
      val x2 = r(2).x - r(0).x; val y2 = r(2).y - r(0).y
      val cross = x1 * y2 - x2 * y1
      new GenericInternalRow(Array[Any](c.x, c.y, c.z,
        cross < 1e-12, math.abs(cross) < 1e-12))
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object KernelFunctions {
  private def col(e: Expression): Column = Bridge.column(e)
  private def x(c: Column): Expression = Bridge.expression(c)

  def edge_kernel(ring: Column): Column = col(EdgeKernelExpr(x(ring)))
  def area_2d(ring: Column): Column = col(Area2DExpr(x(ring)))
  def plane_probe(ring: Column): Column = col(PlaneProbeExpr(x(ring)))
  def pca_resid(ring: Column): Column = col(PcaResidExpr(x(ring)))
  def weighted_centroid(ring: Column): Column = col(WeightedCentroidExpr(x(ring)))
  def tri_align(ext: Column, holes: Column): Column =
    col(TriAlignExpr(x(ext), x(holes)))
  def dead_kernels(ring: Column): Column = col(DeadKernelsExpr(x(ring)))
}
