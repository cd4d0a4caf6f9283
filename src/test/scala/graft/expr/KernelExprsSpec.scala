package graft.expr

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.expr.KernelFunctions._
import graft.geom.{Geom, Vec3}
import graft.model.Pt

/** Known-answer tests for the scalar-kernel expressions behind q46–q48 (the
  * DuckDB oracle proves Spark↔SQL agreement at sf scale; these pin the
  * kernels to hand-computed values on fixtures where the answer is obvious).
  */
class KernelExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // closed unit square in the XY plane, CCW from +z
  private val sq = Seq(Pt(0, 0, 0), Pt(1, 0, 0), Pt(1, 1, 0), Pt(0, 1, 0), Pt(0, 0, 0))
  // 45°-tilted rectangle: z = y over [0,2]×[0,1]
  private val tilt = Seq(Pt(0, 0, 0), Pt(2, 0, 0), Pt(2, 1, 1), Pt(0, 1, 1), Pt(0, 0, 0))

  private def df(rings: Seq[Pt]*) =
    rings.zipWithIndex.map { case (r, i) => (i, r, Seq.empty[Seq[Pt]]) }
      .toDF("id", "ext", "holes")

  test("edge_kernel: dot and cross of the first corner's edge pair") {
    val Row(d: Double, cx: Double, cy: Double, cz: Double) =
      df(sq).select(edge_kernel(col("ext"))).head().getStruct(0)
    // e1 = (1,0,0), e2 = (1,1,0) → dot = 1, cross = (0,0,1)
    assert(d === 1.0 && cx === 0.0 && cy === 0.0 && cz === 1.0)
  }

  test("area_2d: tilted rectangle projects to its footprint area") {
    val a = df(tilt).select(area_2d(col("ext"))).head().getDouble(0)
    assert(math.abs(a - 2.0) < 1e-12) // 3D area is 2√2; projection drops z
    // x-constant ring: projection collapses to a line → area 0
    val wall = Seq(Pt(5, 0, 0), Pt(5, 2, 0), Pt(5, 2, 3), Pt(5, 0, 3), Pt(5, 0, 0))
    assert(df(wall).select(area_2d(col("ext"))).head().getDouble(0) === 0.0)
  }

  test("plane_probe: plane coefficients and height/y solving") {
    val r = df(tilt).select(plane_probe(col("ext"))).head().getStruct(0)
    val (pa, pb, pc, pd) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    // plane z = y → normal ∝ (0, -1, 1) scaled by cross magnitude
    assert(pa === 0.0 && pb === -2.0 && pc === 2.0 && pd === 0.0)
    // centroid of the closed ring (5 points incl. closure): ȳ = z̄ = 2/5
    assert(math.abs(r.getDouble(4) - 0.4) < 1e-12) // h_at_c = z on plane at ȳ
    assert(math.abs(r.getDouble(5) - 0.4) < 1e-12) // y_at_c = y on plane at z̄
    // ground plane (pc ≠ 0, pb = 0 → y_at_c null)
    val g = df(sq).select(plane_probe(col("ext"))).head().getStruct(0)
    assert(!g.isNullAt(4) && g.isNullAt(5))
  }

  test("pca_resid: ~0 for planar rings, null (ungated) for a bent ring") {
    val planar = df(sq, tilt).select(pca_resid(col("ext")))
      .collect().map(_.getDouble(0))
    assert(planar.forall(_ < 1e-9))
    // non-planar rings are EXCLUDED from the residual gate (null on both
    // engines) rather than compared against a 0.0 pin they can't meet —
    // see PcaResidExpr scaladoc
    val bent = Seq(Pt(0, 0, 0), Pt(2, 0, 0), Pt(2, 2, 1), Pt(0, 2, 0), Pt(0, 0, 0))
    assert(df(bent).select(pca_resid(col("ext"))).head().isNullAt(0))
    // ...but the underlying PCA kernel itself still reports the bend
    val (a, b, c, d) = Geom.planeFitPCA(bent.map(_.v).toIndexedSeq)
    val worst = bent.map(p => math.abs(a * p.x + b * p.y + c * p.z + d)).max
    assert(worst > 0.1)
  }

  test("weighted_centroid: center of a rectangle; matches Geom on a fan") {
    val Row(wx: Double, wy: Double, wz: Double) =
      df(tilt).select(weighted_centroid(col("ext"))).head().getStruct(0)
    assert(math.abs(wx - 1.0) < 1e-12 && math.abs(wy - 0.5) < 1e-12 &&
      math.abs(wz - 0.5) < 1e-12)
    val direct = Geom.weightedCentroid(tilt.map(_.v).toIndexedSeq)
    assert(wx === direct.x && wy === direct.y && wz === direct.z)
  }

  test("tri_align: every EarClip triangle agrees with the Newell normal") {
    val rows = df(sq, tilt).select(tri_align(col("ext"), col("holes")))
      .collect().map(_.getStruct(0))
    rows.foreach { r =>
      assert(r.getLong(0) === 2L)            // quad → 2 triangles
      assert(r.getLong(1) === r.getLong(0))  // orientation repair holds
    }
    // hand-flipped triangle: unitNormal vs reversed-ring Newell must DISAGREE
    // (the raw material of the repair the expression counts)
    val n = Geom.unitNormal(Vec3(0, 0, 0), Vec3(1, 0, 0), Vec3(1, 1, 0)).get
    val nnRev = Geom.newellNormal(
      IndexedSeq(Vec3(0, 1, 0), Vec3(1, 1, 0), Vec3(1, 0, 0), Vec3(0, 0, 0)))
    assert(!Geom.compareNormals(n, nnRev))
  }

  test("dead_kernels: point_inside = centroid; collinear bug-for-bug + fixed") {
    // sq (closed, CCW): centroid = (0.4, 0.4, 0); first corner turns LEFT
    // (cross = +1) → the reference's signed compare is false, abs false
    val r = df(sq).select(dead_kernels(col("ext"))).head().getStruct(0)
    assert(math.abs(r.getDouble(0) - 0.4) < 1e-12 &&
      math.abs(r.getDouble(1) - 0.4) < 1e-12 && r.getDouble(2) === 0.0)
    assert(!r.getBoolean(3) && !r.getBoolean(4))
    // clockwise first corner: cross = −1 → the REFERENCE bug calls it
    // "collinear" (signed < 1e-12); the fixed predicate does not
    val cw = Seq(Pt(0, 0, 0), Pt(0, 1, 0), Pt(1, 1, 0), Pt(1, 0, 0), Pt(0, 0, 0))
    val c = df(cw).select(dead_kernels(col("ext"))).head().getStruct(0)
    assert(c.getBoolean(3) && !c.getBoolean(4))
    // genuinely collinear first three points: both predicates agree (true)
    val lin = Seq(Pt(0, 0, 0), Pt(1, 0, 0), Pt(2, 0, 0), Pt(1, 1, 0), Pt(0, 0, 0))
    val l = df(lin).select(dead_kernels(col("ext"))).head().getStruct(0)
    assert(l.getBoolean(3) && l.getBoolean(4))
  }

  test("kernels are SQL-registered (GraftExtensions injection)") {
    df(sq).createOrReplaceTempView("kx")
    val out = spark.sql(
      """SELECT edge_kernel(ext).dot AS d, area_2d(ext) AS a,
                plane_probe(ext).pc AS pc, pca_resid(ext) AS r,
                weighted_centroid(ext).x AS wx,
                tri_align(ext, holes).n_tris AS t,
                dead_kernels(ext).pix AS px
         FROM kx""").head()
    assert(out.getDouble(0) === 1.0 && out.getDouble(1) === 1.0 &&
      out.getDouble(2) === 1.0 && out.getDouble(3) < 1e-9 &&
      out.getDouble(4) === 0.5 && out.getLong(5) === 2L &&
      out.getDouble(6) === 0.4)
  }
}
